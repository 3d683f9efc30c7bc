"""Serving QPS at 1M-corpus scale on one TPU chip.

Builds a 1M×128 clustered corpus + kmeans layout on-device, and measures
batched end-to-end search QPS (probe → select → scan → top-k) at operating
points spanning realistic ndis budgets.  The probing model is untrained —
QPS depends only on the ndis/nprobe distribution, which we pin via
threshold choice on the model's output quantiles.

Usage: python scripts/tpu_serve_bench.py [n_base] [n_bkt] [batch] [impl_filter] [block_q]
"""
import sys
import time

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import lira_tpu

lira_tpu.enable_compilation_cache()

import jax

try:
    jax.devices()
except RuntimeError as exc:
    print(f"device not ready: {exc}", flush=True)
    raise SystemExit(42)

import jax.numpy as jnp

from lira_tpu.engine.serve import QueryEngine
from lira_tpu.labels.scaler import StandardScaler
from lira_tpu.models.probing_mlp import init_params
from lira_tpu.ops.distance import l2_to_centroids
from lira_tpu.partition.assign import build_bucket_layout
from lira_tpu.partition.kmeans import kmeans_assign, kmeans_fit


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_bkt = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
    impl_filter = sys.argv[4] if len(sys.argv) > 4 else None
    block_q = int(sys.argv[5]) if len(sys.argv) > 5 else 256
    d = 128

    rng = np.random.default_rng(43)
    centers = rng.standard_normal((n_bkt, d), dtype=np.float32) * 30.0
    assign_c = rng.integers(0, n_bkt, size=n)
    x_d = centers[assign_c] + rng.standard_normal((n, d), dtype=np.float32) * 14.0
    x_q = x_d[rng.integers(0, n, size=batch)] + rng.standard_normal(
        (batch, d), dtype=np.float32
    ) * 10.0
    print(f"corpus {x_d.shape} ready", flush=True)

    t0 = time.time()
    km = kmeans_fit(x_d, n_bkt, niter=10, seed=43)
    assign = kmeans_assign(x_d, km.centroids)
    layout = build_bucket_layout(assign, n_bkt)
    print(f"kmeans+layout {time.time() - t0:.1f}s", flush=True)

    raw = np.empty((min(n, 100_000), n_bkt), np.float32)
    cj = jnp.asarray(km.centroids)
    for s in range(0, len(raw), 16384):
        e = min(s + 16384, len(raw))
        raw[s:e] = np.asarray(l2_to_centroids(jnp.asarray(x_d[s:e]), cj))
    scaler = StandardScaler().fit(raw)
    params = init_params(jax.random.PRNGKey(0), n_bkt, d)

    impls = [
        ("blocked", dict(scan_impl="blocked")),
        ("blocked-bf16", dict(scan_impl="blocked", scan_dtype="bfloat16")),
        ("blocked-int8", dict(scan_impl="blocked", scan_dtype="int8")),
        # capacity mode: one bf16 table for both rounds (0.5× corpus HBM) —
        # the mode that serves 20M+ rows on one v5e chip
        ("blocked-bf16-cap", dict(scan_impl="blocked", scan_dtype="bfloat16",
                                  store_f32=False)),
        ("xla", dict(scan_impl="xla")),
    ]
    for name, kw in impls:
        if impl_filter and impl_filter not in name:
            continue
        try:
            eng = QueryEngine(x_d, layout, km.centroids, scaler, params, probe_cap=128, block_q=block_q, **kw)
            outputs = eng.probe(x_q[:512])
            for target_nprobe in (8, 32, 96):
                thr = float(np.quantile(outputs, 1.0 - target_nprobe / n_bkt))
                eng.search(x_q, thr, 10)  # warmup/compile at the measured shape
                t0 = time.time()
                r = eng.search(x_q, thr, 10)
                dt = time.time() - t0
                print(
                    f"serve[{name}] nprobe≈{r.nprobe.mean():.1f} ndis={r.ndis.mean():.0f} "
                    f"({100 * r.ndis.mean() / n:.2f}% corpus): {batch / dt:.0f} QPS "
                    f"({1e6 * dt / batch:.0f} us/q e2e)",
                    flush=True,
                )
                if "blocked" in name:
                    # pipelined sustained throughput: 4 batches streamed with
                    # probe/union of batch i+1 hidden behind batch i's scan
                    x_s = np.concatenate([x_q] * 4)
                    eng.search_stream(x_s, thr, 10, batch_size=batch)  # warmup
                    t0 = time.time()
                    rs = eng.search_stream(x_s, thr, 10, batch_size=batch)
                    dt = time.time() - t0
                    print(
                        f"serve[{name}/stream x4] nprobe≈{rs.nprobe.mean():.1f} "
                        f"ndis={rs.ndis.mean():.0f}: {len(x_s) / dt:.0f} QPS "
                        f"({1e6 * dt / len(x_s):.0f} us/q sustained)",
                        flush=True,
                    )
            del eng
        except Exception as exc:  # remote-compile flakes must not kill the sweep
            print(f"serve[{name}] FAILED: {type(exc).__name__}: {exc}", flush=True)


if __name__ == "__main__":
    main()
