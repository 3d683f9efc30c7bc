"""Fast probe of probing-MLP learning in the large-scale regime.

The 10M demo regime trains on a 1% subset (100k rows) over n_bkt=2048 —
positives are ~1.17/2048 = 0.06% of labels, half the density of the 1M
small-scale run that reached hit-rate 0.992.  This experiment reproduces
that regime cheaply (1M corpus, 100k subset, 2048 buckets) and sweeps
epochs x learning rate to find a configuration whose predictions clear
sigma, before committing to a 90-minute 10M end-to-end run.

Usage: python scripts/train_scale_probe.py [n] [nsub] [n_bkt] [max_epoch]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import lira_tpu

lira_tpu.enable_compilation_cache()

import jax
import jax.numpy as jnp

from lira_tpu.engine.sweep import gt_hit_tensor  # noqa: F401 (parity import)
from lira_tpu.labels.distr import gt_bucket_map, knn_bucket_labels
from lira_tpu.labels.scaler import scaled_centroid_distances
from lira_tpu.models.metrics import probing_metrics
from lira_tpu.models.train import evaluate, make_train_state, train_epoch
from lira_tpu.ops.knn import exact_knn, self_knn
from lira_tpu.partition.assign import build_bucket_layout
from lira_tpu.partition.kmeans import kmeans_assign, kmeans_fit


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    nsub = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    n_bkt = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    max_epoch = int(sys.argv[4]) if len(sys.argv) > 4 else 40
    d, k, n_q = 128, 10, 2048

    rng = np.random.default_rng(43)
    centers = rng.standard_normal((n_bkt, d), dtype=np.float32) * 30.0
    x_d = centers[rng.integers(0, n_bkt, size=n)] + rng.standard_normal(
        (n, d), dtype=np.float32) * 14.0
    x_q = x_d[rng.integers(0, n, size=n_q)] + rng.standard_normal(
        (n_q, d), dtype=np.float32) * 10.0
    sub_idx = rng.choice(n, size=nsub, replace=False)
    x_sub = np.ascontiguousarray(x_d[sub_idx])
    print("data ready", flush=True)

    t0 = time.time()
    knn_sub = self_knn(x_sub, k)
    _, knn_q = exact_knn(x_sub, x_q, k)
    print(f"labels ({time.time() - t0:.1f}s)", flush=True)

    km = kmeans_fit(x_sub, n_bkt, niter=10, seed=43)
    assign_sub = kmeans_assign(x_sub, km.centroids)
    d2b = np.full((nsub, 2), -1, np.int32)
    d2b[:, 0] = assign_sub
    layout = build_bucket_layout(d2b, n_bkt)
    labels_sub = knn_bucket_labels(knn_sub, d2b, n_bkt)
    labels_q = knn_bucket_labels(knn_q, d2b, n_bkt)
    gtb = gt_bucket_map(knn_q, d2b)
    dist_sub, dist_q, scaler = scaled_centroid_distances(x_sub, x_q, km.centroids)
    print(f"positives/row: {labels_sub.sum(1).mean():.2f}/{n_bkt}", flush=True)

    dist_dev = dist_sub if isinstance(dist_sub, jax.Array) else jnp.asarray(dist_sub)
    x_dev = jnp.asarray(x_sub, jnp.float32)
    lab_dev = jnp.asarray(labels_sub, jnp.float32)

    for lr, batch in ((1e-4, 512), (5e-4, 512), (1e-3, 512)):
        state = make_train_state(43, n_bkt, d, lr=lr)
        t0 = time.time()
        for epoch in range(max_epoch):
            state, loss_tr = train_epoch(state, dist_dev, x_dev, lab_dev, batch_size=batch)
            if (epoch + 1) % 5 == 0 or epoch == 0:
                _, predicts, loss_te, outputs = evaluate(
                    state, dist_q, x_q, labels_q, sigma=0.5, batch_size=batch)
                m = probing_metrics(predicts, labels_q, gtb, layout.sizes, k,
                                    epoch=epoch, loss=round(loss_te, 5))
                print(f"[lr={lr} b={batch}] ep{epoch + 1} loss_tr={loss_tr:.5f} "
                      f"hit={m['Hit Rate']:.4f} recall={m['KNN Recall']:.4f} "
                      f"nprobe={m['nprobe predict']:.2f}/{m['nprobe target']:.2f} "
                      f"max_out={np.asarray(outputs).max():.3f} "
                      f"({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
