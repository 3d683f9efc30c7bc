"""Calibrate the hard-regime synthetic corpus (VERDICT round-2 item 2).

The reference's canonical workloads (sift/gist at n_bkt 64-1024,
reference search.sh:17-22) need nprobe ~8-16 for recall 0.95 — the round-2
corpora were so separable the probing model saturated at nprobe 1.1.
This script scans `synthetic_dataset` settings (intrinsic_dim /
n_clusters / noise ratios) and measures, per setting, the IVF
(centroid-rank) nprobe needed for label recall 0.90/0.95/0.98 at
1M x 128, n_bkt=1024 — the quantity that defines the fan-out regime.

Usage: python scripts/hard_regime_calibrate.py [n] [n_bkt] [n_q]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import lira_tpu

lira_tpu.enable_compilation_cache()

import jax.numpy as jnp

from lira_tpu.io.datasets import HARD_REGIME, synthetic_dataset
from lira_tpu.ops.distance import pairwise_scores
from lira_tpu.ops.knn import exact_knn
from lira_tpu.partition.kmeans import kmeans_assign, kmeans_fit


def ivf_nprobe_curve(base, query, gt, n_bkt, targets=(0.90, 0.95, 0.98)):
    """nprobe (by centroid-distance rank) needed for each label-recall target."""
    km = kmeans_fit(base, n_bkt, niter=20, seed=43)
    d2b = kmeans_assign(base, km.centroids)
    gt_bkt = d2b[gt]  # (n_q, k) bucket of each true neighbor
    # rank of every bucket per query, by centroid distance
    sc = np.asarray(pairwise_scores(jnp.asarray(query), jnp.asarray(km.centroids)))
    rank = np.argsort(np.argsort(sc, axis=1), axis=1)  # (n_q, n_bkt) rank of bucket j
    nbr_rank = np.take_along_axis(rank, gt_bkt, axis=1)  # (n_q, k) rank of each nbr's bucket
    k = gt.shape[1]
    # label recall at nprobe M = mean fraction of neighbors whose bucket rank < M
    curve = {}
    recalls = [(m, float((nbr_rank < m).mean())) for m in range(1, n_bkt + 1)]
    for t in targets:
        curve[t] = next((m for m, r in recalls if r >= t), None)
    curve["r@1"] = recalls[0][1]
    curve["r@16"] = recalls[15][1]
    curve["mean_nprobe95_perq"] = float(
        np.mean(
            np.partition(nbr_rank, int(np.ceil(0.95 * k)) - 1, axis=1)[
                :, int(np.ceil(0.95 * k)) - 1
            ]
            + 1
        )
    )
    return curve


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_bkt = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    n_q = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    k, dim = 10, 128

    settings = {
        "easy-r2": dict(n_clusters=max(64, n_bkt), center_scale=30.0, noise_scale=14.0,
                        query_noise=10.0),
        # the SHIPPED regime — identical by construction to what every
        # measurement uses (io/datasets.HARD_REGIME)
        "hard-i16-c64": {k: v for k, v in HARD_REGIME.items() if k != "seed"},
        "hard-i16-c256": dict(intrinsic_dim=16, n_clusters=256, center_scale=1.5,
                              noise_scale=1.0, query_noise=0.35, ambient_noise=0.02),
        "hard-i24-c64": dict(intrinsic_dim=24, n_clusters=64, center_scale=1.0,
                             noise_scale=1.0, query_noise=0.3, ambient_noise=0.02),
        "hard-i12-c64": dict(intrinsic_dim=12, n_clusters=64, center_scale=1.0,
                             noise_scale=1.0, query_noise=0.4, ambient_noise=0.02),
    }
    for name, kw in settings.items():
        t0 = time.time()
        b = synthetic_dataset(n_base=n, n_query=n_q, dim=dim, k_gt=k, seed=43,
                              name=name, compute_gt=False, **kw)
        _, gt = exact_knn(b.base, b.query, k)
        curve = ivf_nprobe_curve(b.base, b.query, gt, n_bkt)
        print(
            f"[{name}] nprobe@0.90={curve[0.90]} @0.95={curve[0.95]} @0.98={curve[0.98]} "
            f"r@1={curve['r@1']:.3f} r@16={curve['r@16']:.3f} "
            f"perq95={curve['mean_nprobe95_perq']:.1f} ({time.time() - t0:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
