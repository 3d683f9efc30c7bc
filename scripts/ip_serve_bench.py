"""Measured inner-product serving sweep at 1M scale (VERDICT round-2 item 7).

The reference treats IP datasets as first-class configs (normalized
embedding sets openai1536/glove2m_normalized/word2vec_normalized,
reference run_smallscale_simple.sh:44-59).  The repo's IP path was tested
only at toy scale; this script runs the full small-scale pipeline
(metric=inner_product) on a 1M×128 normalized hard-regime corpus and
measures the blocked engine's recall/nprobe/ndis/QPS sweep on one chip.

Usage: python scripts/ip_serve_bench.py [n] [n_bkt] [n_q] [n_epoch]
Writes logs/ip_serve_sweep.csv.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import lira_tpu

lira_tpu.enable_compilation_cache()

from lira_tpu.config import Config
from lira_tpu.engine.serve import QueryEngine
from lira_tpu.io.datasets import synthetic_dataset
from lira_tpu.ops.knn import exact_knn
from lira_tpu.pipelines.smallscale import run_smallscale


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_bkt = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    n_q = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
    n_epoch = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    k, dim = 10, 128

    t0 = time.time()
    from lira_tpu.io.datasets import HARD_REGIME

    b = synthetic_dataset(
        n_base=n, n_query=n_q, dim=dim, k_gt=k, compute_gt=False,
        name="ipbench", **HARD_REGIME,
    )
    # normalized-embedding contract of the reference's IP datasets
    b.base /= np.linalg.norm(b.base, axis=1, keepdims=True) + 1e-12
    b.query /= np.linalg.norm(b.query, axis=1, keepdims=True) + 1e-12
    print(f"dataset generated ({time.time() - t0:.1f}s), computing IP gt...", flush=True)
    _, gt = exact_knn(b.base, b.query, k, metric="inner_product", verbose=True)
    b.groundtruth = gt
    print(f"dataset ready ({time.time() - t0:.1f}s)", flush=True)

    cfg = Config(dataset="ipbench", data_path="/tmp/ipbench", k=k, n_bkt=n_bkt,
                 n_epoch=n_epoch, dis_metric="inner_product", pth_log=None).update()
    cfg.pth_log = None
    res = run_smallscale(cfg, bundle=b, serve_sweep=False, use_cache=False)
    print(f"pipeline trained ({time.time() - t0:.1f}s)", flush=True)

    eng = QueryEngine(
        b.base, res["layout"], res["kmeans"].centroids, res["scaler"],
        res["state"].params, metric="inner_product", n_mul=cfg.n_mul,
        scan_impl="blocked",
    )
    rows = eng.sweep(b.query, gt, k, np.arange(0.05, 0.95, 0.05))
    os.makedirs("logs", exist_ok=True)
    with open("logs/ip_serve_sweep.csv", "w") as f:
        f.write("threshold,nprobe,Recall,Computations,QPS\n")
        for r in rows:
            print(
                f"[ip] thr={r['threshold']:.2f} recall={r['avg_recall']:.4f} "
                f"nprobe={r['avg_nprobe']:.1f} ndis={r['avg_cmp']:.0f} "
                f"QPS={r['qps']:.0f}", flush=True,
            )
            f.write(
                f"{r['threshold']},{r['avg_nprobe']},{r['avg_recall']},"
                f"{r['avg_cmp']},{r['qps']}\n"
            )
    print("wrote logs/ip_serve_sweep.csv", flush=True)


if __name__ == "__main__":
    main()
