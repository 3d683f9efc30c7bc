"""Self-kNN build time at GIST dimensionality (1M x 960) on one chip.

The reference's self-kNN precompute tool (reference compute_knn.cpp) is
the index-build bottleneck it spent a SIMD campaign on; its published
anchors are ~8s for SIFT 1M (128d, AVX-512, 24 threads, IVF-approximate)
and ~6s for Deep1M (96d) (reference SIMD_OPTIMIZATION.md:169-184 — no
GIST row is published; at GIST's 7.5x the dimensions the same tool
scales to ~60s, and its IVF mode is approximate).  This measures our
fused two-round Pallas kNN (ops/knn_pallas.knn_fused) doing the SAME job
exactly (f32 re-rank, bf16 screen) at 1M x 960, warm-compile, on one
chip — the number VERDICT r3 item 1 asks to put next to the reference's.

Usage: python scripts/gist_selfknn_time.py [n] [d] [k]
Reads the corpus from the gist_dim_bench cache when present.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import lira_tpu

lira_tpu.enable_compilation_cache()

from lira_tpu.io.datasets import HARD_REGIME, synthetic_dataset  # noqa: E402
from lira_tpu.ops.knn_pallas import knn_fused  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 960
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 11  # ref: k=10 + self

    cache = f"/tmp/gist_corpus_{n}_{d}_8192.npz"
    t0 = time.time()
    if os.path.exists(cache):
        x_d = np.load(cache)["x_d"]
        print(f"corpus from cache ({time.time() - t0:.1f}s)", flush=True)
    else:
        b = synthetic_dataset(n_base=n, n_query=8, dim=d, k_gt=1,
                              compute_gt=False, name="gistknn", **HARD_REGIME)
        x_d = b.base
        print(f"corpus generated ({time.time() - t0:.1f}s)", flush=True)

    for run in ("first (incl. any compile)", "warm"):
        t0 = time.time()
        scores, ids = knn_fused(x_d, x_d, k)
        dt = time.time() - t0
        print(f"[selfknn {n}x{d} k={k}] {run}: {dt:.1f}s "
              f"({n / dt:.0f} rows/s)", flush=True)
    # self-exclusion sanity: row i's top-1 must be i itself at distance 0
    self_hit = float((ids[:, 0] == np.arange(len(ids))).mean())
    print(f"top-1 self-hit rate: {self_hit:.4f} (expect 1.0)", flush=True)


if __name__ == "__main__":
    main()
