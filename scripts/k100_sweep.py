"""Measured k=100 serving sweep at 1M (VERDICT round-2 item 3, measured half).

The reference's large-scale path defaults to k=100
(reference: LIRA_largescale.py:27-49).  Blocked-path exactness at k=100 is
covered by tests/test_block_scan.py (fetch_k 200, kg 208); this script
measures recall/ndis/QPS at 1M×128/1024 on one chip, reusing the trained
state cached by scripts/lira_vs_ivf.py (same corpus seed → same index).

Usage: python scripts/k100_sweep.py [n] [n_bkt] [n_q]
Writes logs/k100_sweep.csv.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import lira_tpu

lira_tpu.enable_compilation_cache()

import jax

from lira_tpu.engine.serve import QueryEngine
from lira_tpu.io.datasets import synthetic_dataset
from lira_tpu.labels.scaler import StandardScaler
from lira_tpu.models.train import make_train_state
from lira_tpu.ops.knn import exact_knn
from lira_tpu.partition.assign import build_bucket_layout
from lira_tpu.partition.kmeans import KMeans


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_bkt = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    n_q = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
    k, dim = 100, 128

    # pick up whatever epoch count lira_vs_ivf.py was run with (its default
    # is 8; the round-3 measured runs used 10)
    import glob

    candidates = sorted(glob.glob(f"/tmp/lvi_hard_{n}_{n_bkt}_*.npz"))
    if not candidates:
        raise SystemExit(
            f"/tmp/lvi_hard_{n}_{n_bkt}_*.npz missing — run "
            f"`python scripts/lira_vs_ivf.py {n} {n_bkt}` first"
        )
    cache = candidates[-1]
    print(f"pipeline state from {cache}", flush=True)
    f = np.load(cache)
    km = KMeans(centroids=f["centroids"], objective=f["objective"])
    scaler = StandardScaler()
    scaler.mean_, scaler.scale_ = f["scaler_mean"], f["scaler_scale"]
    state = make_train_state(43, n_bkt, dim)
    for layer in state.params:
        for name in state.params[layer]:
            state.params[layer][name] = f[f"p/{layer}/{name}"]
    layout = build_bucket_layout(f["d2b_re"], n_bkt)

    t0 = time.time()
    from lira_tpu.io.datasets import HARD_REGIME

    b = synthetic_dataset(
        n_base=n, n_query=n_q, dim=dim, k_gt=10, compute_gt=False,
        name="ivfcmp-hard", **HARD_REGIME,
    )
    print(f"corpus regenerated ({time.time() - t0:.0f}s); computing k=100 gt", flush=True)
    _, gt = exact_knn(b.base, b.query, k, verbose=True)
    print(f"gt ready ({time.time() - t0:.0f}s)", flush=True)

    eng = QueryEngine(
        b.base, layout, km.centroids, scaler, state.params, n_mul=2,
        scan_impl="blocked",
    )
    thresholds = np.array([0.01, 0.05, 0.15, 0.3, 0.5, 0.7])
    rows = eng.sweep(b.query, gt, k, thresholds)
    warm = eng.sweep(b.query, gt, k, thresholds, warmup=False)
    for r1, r2 in zip(rows, warm):
        r1["qps"] = max(r1["qps"], r2["qps"])
    os.makedirs("logs", exist_ok=True)
    with open("logs/k100_sweep.csv", "w") as fo:
        fo.write("threshold,nprobe,Recall,Computations,QPS\n")
        for r in rows:
            print(
                f"[k100] thr={r['threshold']:.2f} recall={r['avg_recall']:.4f} "
                f"nprobe={r['avg_nprobe']:.1f} ndis={r['avg_cmp']:.0f} "
                f"QPS={r['qps']:.0f}", flush=True,
            )
            fo.write(
                f"{r['threshold']},{r['avg_nprobe']},{r['avg_recall']},"
                f"{r['avg_cmp']},{r['qps']}\n"
            )
    print("wrote logs/k100_sweep.csv", flush=True)


if __name__ == "__main__":
    main()
