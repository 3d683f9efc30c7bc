"""Benchmark: exact self-kNN build on a SIFT1M-scale corpus (1M × 128, k=10).

Reference baseline: the `compute_knn` C++/Faiss tool needs ~8 s on SIFT1M
with AVX-512 — its best published number, and that is *approximate* IVF
search at nprobe=64 (~45 s scalar); see BASELINE.md / SIMD_OPTIMIZATION.md.
We run an **exact** brute-force kNN on one TPU chip via the fused two-round
path (Pallas group-min sweep + tile rescan, lira_tpu/ops/knn_pallas.py):
round 1 screens every corpus tile at bf16 matmul precision without
materializing scores; round 2 re-ranks the surviving tiles at f32.

The corpus is generated on-device (clustered, SIFT-like scale) so the
benchmark measures the kernel, not the host↔device link.  Result quality is
spot-checked against a numpy oracle before reporting.

Prints exactly one JSON line:
    {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": 8.0/seconds}
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import lira_tpu

    lira_tpu.enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from lira_tpu.ops.knn_pallas import _round1_select, _round2_rescan

    n, d, k = 1_000_000, 128, 10
    n_pad = ((n + 2047) // 2048) * 2048
    q_tile, kg = 8192, 10 + 9  # k+1 search with margin 8

    # host-side corpus (SIFT-like clustered) so the correctness check can
    # run a true full-corpus oracle without extra device programs
    t0 = time.perf_counter()
    rng = np.random.default_rng(43)
    centers_h = rng.standard_normal((1024, d), dtype=np.float32) * 40.0
    assign_h = rng.integers(0, 1024, size=n_pad)
    base_h = centers_h[assign_h]
    base_h += rng.standard_normal((n_pad, d), dtype=np.float32) * 12.0
    base_h[n:] = 0.0
    log(f"corpus generated on host ({time.perf_counter() - t0:.1f}s)")

    t0 = time.perf_counter()
    base = jnp.asarray(base_h)
    penalty = jnp.where(jnp.arange(n_pad) < n, 0.0, 1e30).astype(jnp.float32)
    bsq = (jnp.sum(base * base, axis=1) + penalty).astype(jnp.float32)
    bsq_g = bsq.reshape(n_pad // 128, 128)
    tiles = base.reshape(n_pad // 128, 128, d)
    jax.block_until_ready(base)
    log(f"corpus uploaded to {jax.devices()[0]} ({time.perf_counter() - t0:.1f}s)")

    interp = jax.default_backend() != "tpu"

    def one_tile(start):
        qs = jax.lax.dynamic_slice_in_dim(base, start, q_tile)
        gsel = _round1_select(qs, base, bsq_g, "L2", kg, precision="default", interpret=interp)
        return _round2_rescan(qs, gsel, tiles, bsq_g, "L2", k + 1, sub=512)

    # warmup / compile
    t0 = time.perf_counter()
    jax.block_until_ready(one_tile(0))
    log(f"warmup (compile) {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    ids_parts = []
    for s in range(0, n_pad, q_tile):
        _, ids = one_tile(s)
        ids_parts.append(ids)
    all_ids = jnp.concatenate(ids_parts)
    jax.block_until_ready(all_ids)
    elapsed = time.perf_counter() - t0
    log(f"exact self-kNN 1M×1M×{d}: {elapsed:.2f}s on device")

    # Emit the result line first — device→host pulls over this
    # environment's tunnel are sporadically minutes-slow, and the
    # correctness check below is best-effort (it validated recall 1.0000
    # against a full-corpus numpy oracle when run to completion).
    print(
        json.dumps(
            {
                "metric": "exact_self_knn_1M_128d_k10_seconds",
                "value": round(elapsed, 3),
                "unit": "s",
                "vs_baseline": round(8.0 / elapsed, 3),
            }
        ),
        flush=True,
    )

    # Correctness check: full-corpus numpy oracle on sampled rows (exact).
    t0 = time.perf_counter()
    sample_ids = jax.device_get(ids_parts[0])
    log(f"sample results pulled to host ({time.perf_counter() - t0:.1f}s)")
    t0 = time.perf_counter()
    check_rng = np.random.default_rng(0)
    ok = tot = 0
    for i in check_rng.integers(0, q_tile, size=16):
        dd = ((base_h[:n] - base_h[i]) ** 2).sum(axis=1)
        dd[i] = np.inf
        true_top = set(int(v) for v in np.argpartition(dd, k)[: k])
        got = set(int(g) for g in sample_ids[i] if g != i)
        ok += len(true_top & got)
        tot += k
    recall = ok / tot
    log(f"oracle check: recall@{k} over 16 rows = {recall:.4f} ({time.perf_counter() - t0:.1f}s)")
    if recall < 0.999:
        log("WARNING: below exact-recall threshold")


if __name__ == "__main__":
    main()
