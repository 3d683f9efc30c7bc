"""Headline benchmark: end-to-end serving QPS at 1M-corpus scale, one chip.

Measures the blocked union-scan serving engine (probe → select → scan →
top-k, exact ndis accounting) on a 1M×128 clustered corpus with 1024
partitions at the ndis ≈ 0.8%-of-corpus operating point, batch 65536.

vs_baseline: ratio against the REFERENCE serving engine's measured CPU QPS
on this machine — search.cpp compiled from the reference sources against
pip LibTorch (scripts/reference_baseline/) and run on an identical
lira_tpu-built index (scripts/head_to_head.py); the recorded number lives
in logs/head_to_head.json.  Recall/ndis parity between the two engines was
verified on that shared index.

Correctness is asserted in-run: for sampled queries the engine's neighbors
must exactly match a numpy oracle restricted to the probed buckets.

Falls back to the round-1 exact-kNN benchmark if the serving path fails
(remote-compile flakes happen on this rig).

Prints exactly one JSON line:
    {"metric": ..., "value": QPS, "unit": "qps", "vs_baseline": ratio}
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# Measured on this machine by scripts/head_to_head.py (1M×128, n_bkt=1024,
# k=10, shared index, threshold with ndis closest to the 0.8% operating
# point).  Refreshed whenever head_to_head.py is re-run.
REF_CPU_QPS_FALLBACK = 780.0


def ref_cpu_qps() -> float:
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "logs", "head_to_head.json")) as f:
            rows = json.load(f)["reference_cpu"]
        return float(min(rows, key=lambda r: r["threshold"])["qps"])
    except Exception:
        return REF_CPU_QPS_FALLBACK


def serving_bench():
    import lira_tpu

    lira_tpu.enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from lira_tpu.engine.serve import QueryEngine
    from lira_tpu.labels.scaler import StandardScaler
    from lira_tpu.models.probing_mlp import init_params
    from lira_tpu.ops.distance import l2_to_centroids
    from lira_tpu.partition.assign import build_bucket_layout
    from lira_tpu.partition.kmeans import kmeans_assign

    if os.environ.get("LIRA_BENCH_SMALL") == "1":  # CPU smoke mode
        n, d, n_bkt, k, batch = 20_000, 16, 32, 10, 512
    else:
        n, d, n_bkt, k, batch = 1_000_000, 128, 1024, 10, 65536
    t0 = time.perf_counter()
    rng = np.random.default_rng(43)
    centers = rng.standard_normal((n_bkt, d), dtype=np.float32) * 30.0
    x_d = centers[rng.integers(0, n_bkt, size=n)]
    x_d += rng.standard_normal((n, d), dtype=np.float32) * 14.0
    x_q = x_d[rng.integers(0, n, size=batch)] + rng.standard_normal(
        (batch, d), dtype=np.float32) * 10.0
    log(f"corpus ready ({time.perf_counter() - t0:.1f}s)")

    # partition on the true generator centers (kmeans quality is benched by
    # the pipeline; here the scan is the subject and layout must be stable)
    t0 = time.perf_counter()
    assign = kmeans_assign(x_d, centers)
    layout = build_bucket_layout(assign, n_bkt)
    raw = np.empty((min(n, 65536), n_bkt), np.float32)
    cj = jnp.asarray(centers)
    for s in range(0, len(raw), 16384):
        raw[s : s + 16384] = np.asarray(
            l2_to_centroids(jnp.asarray(x_d[s : s + 16384]), cj)
        )
    scaler = StandardScaler().fit(raw)
    params = init_params(jax.random.PRNGKey(0), n_bkt, d)
    log(f"layout + scaler ready ({time.perf_counter() - t0:.1f}s)")

    def measure(scan_dtype):
        """Measured QPS for one engine mode, oracle-asserted in-run."""
        t0 = time.perf_counter()
        eng = QueryEngine(x_d, layout, centers, scaler, params, probe_cap=128,
                          scan_impl="blocked", block_q=1024,
                          scan_dtype=scan_dtype)
        outputs = eng.probe(x_q[:512])
        thr = float(np.quantile(outputs, 1.0 - 8 / n_bkt))  # ~8 probes/query
        eng.search(x_q, thr, k)  # warmup/compile at the measured shape
        log(f"engine[{scan_dtype}] + warmup ({time.perf_counter() - t0:.1f}s)")

        t0 = time.perf_counter()
        r = eng.search(x_q, thr, k)
        elapsed = time.perf_counter() - t0
        qps = batch / elapsed
        ndis_pct = 100 * r.ndis.mean() / n
        log(f"serve[{scan_dtype}]: nprobe≈{r.nprobe.mean():.1f} "
            f"ndis={r.ndis.mean():.0f} ({ndis_pct:.2f}% corpus): "
            f"{qps:.0f} QPS ({1e6 * elapsed / batch:.0f} us/q)")

        # correctness: sampled queries vs a numpy oracle over the probed
        # buckets — exact neighbor-set match required (the bf16 mode's
        # screen must not have missed a single tile)
        out_s = eng.probe(x_q[:32])
        probed = eng.select_buckets(out_s, thr)
        for i in np.random.default_rng(0).integers(0, 32, size=6):
            members = np.unique(np.concatenate(
                [layout.bucket_members(b) for b in np.nonzero(probed[i])[0]]
            ))
            dd = ((x_d[members] - x_q[i]) ** 2).sum(axis=1)
            expect = set(members[np.argsort(dd, kind="stable")][: min(k, len(members))])
            got = set(int(v) for v in r.ids[i] if v >= 0)
            assert got == expect, f"query {i}: engine != oracle"
        log(f"oracle check[{scan_dtype}]: neighbor sets exact on 6 sampled queries")
        return qps

    # headline: bf16 screen + exact f32 on-device re-rank (zero measured
    # misses at this margin, docs/bf16_screen.md), oracle-asserted above;
    # fall back to the all-f32 engine if the oracle ever trips
    try:
        qps = measure("bfloat16")
    except AssertionError as exc:
        log(f"bf16 oracle failed ({exc}); falling back to f32 engine")
        qps = measure("float32")

    baseline = ref_cpu_qps()
    print(json.dumps({
        "metric": "serve_1M_128d_k10_qps_at_0.8pct_ndis",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / baseline, 3),
    }), flush=True)


def knn_fallback():
    """Round-1 headline: exact 1M self-kNN vs the reference's ~8 s AVX-512."""
    import lira_tpu

    lira_tpu.enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from lira_tpu.ops.knn_pallas import _round1_select, _round2_rescan

    n, d, k = 1_000_000, 128, 10
    n_pad = ((n + 2047) // 2048) * 2048
    q_tile, kg = 8192, 19
    rng = np.random.default_rng(43)
    base_h = rng.standard_normal((n_pad, d), dtype=np.float32) * 20.0
    base_h[n:] = 0.0
    base = jnp.asarray(base_h)
    penalty = jnp.where(jnp.arange(n_pad) < n, 0.0, 1e30).astype(jnp.float32)
    bsq = (jnp.sum(base * base, axis=1) + penalty).astype(jnp.float32)
    bsq_g = bsq.reshape(n_pad // 128, 128)
    tiles = base.reshape(n_pad // 128, 128, d)
    interp = jax.default_backend() != "tpu"

    def one_tile(start):
        qs = jax.lax.dynamic_slice_in_dim(base, start, q_tile)
        gsel = _round1_select(qs, base, bsq_g, "L2", kg, precision="default", interpret=interp)
        return _round2_rescan(qs, gsel, tiles, bsq_g, "L2", k + 1, sub=512)

    jax.block_until_ready(one_tile(0))
    t0 = time.perf_counter()
    outs = [one_tile(s)[1] for s in range(0, n_pad, q_tile)]
    jax.block_until_ready(outs[-1])
    elapsed = time.perf_counter() - t0
    log(f"fallback exact self-kNN 1M: {elapsed:.2f}s")
    print(json.dumps({
        "metric": "exact_self_knn_1M_128d_k10_seconds",
        "value": round(elapsed, 3),
        "unit": "s",
        "vs_baseline": round(8.0 / elapsed, 3),
    }), flush=True)


if __name__ == "__main__":
    try:
        serving_bench()
    except Exception as exc:
        log(f"serving bench failed ({type(exc).__name__}: {exc}); falling back to kNN bench")
        knn_fallback()
