"""Serving latency percentiles vs batch size on the trained 1M index.

The headline benchmarks quote saturated throughput (batch 65536); a
serving deployment also cares about the latency curve — what one probe→
scan round trip costs at small batch, and where throughput saturates.
This measures p50/p95/p99 wall-clock per `QueryEngine.search` call across
batch sizes on the same trained hard-regime index bench.py uses (cached
corpus, learned K-Means, trained probing MLP), bf16 screen, fixed
threshold at the ~8-probe operating point.

Usage: python scripts/latency_bench.py [reps]
Writes logs/latency_bench.csv (batch, p50_ms, p95_ms, p99_ms, qps).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import lira_tpu

lira_tpu.enable_compilation_cache()

import jax.numpy as jnp  # noqa: E402

from bench import build_trained_index  # noqa: E402
from lira_tpu.engine.serve import QueryEngine  # noqa: E402

BATCHES = (1, 16, 256, 1024, 4096, 16384, 65536)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    if os.environ.get("LIRA_BENCH_SMALL") == "1":  # CPU smoke mode
        import jax

        jax.config.update("jax_platforms", "cpu")
        n, d, n_bkt, k, batch, n_epoch = 20_000, 16, 32, 10, 512, 2
        global BATCHES
        BATCHES = (1, 16, 256)
    else:
        n, d, n_bkt, k, batch, n_epoch = 1_000_000, 128, 1024, 10, 65536, 6
    ix = build_trained_index(n, d, n_bkt, k, batch, n_epoch)
    x_q = ix["x_q"]

    eng = QueryEngine(
        ix["x_d"], ix["layout"], ix["km"].centroids, ix["scaler"], ix["params"],
        probe_cap=128, scan_impl="blocked", block_q=1024, scan_dtype="bfloat16",
    )
    outputs = eng.probe(x_q[:512])
    thr = float(np.quantile(outputs, 1.0 - 8 / n_bkt))  # ~8 probes/query

    os.makedirs("logs", exist_ok=True)
    rows = []
    rng = np.random.default_rng(7)
    for b in BATCHES:
        # rotate query slices so the engine's content-keyed upload cache
        # never serves a measurement (each rep is a fresh batch).  The scan
        # program's union width U is data-dependent (pow2-bucketed), so a
        # handful of distinct compiles exist per batch size — absorb them
        # with several warmup batches before timing.
        warm = 4
        starts = rng.integers(0, len(x_q) - b + 1, size=reps + warm)
        lat = []
        for i, s in enumerate(starts):
            t0 = time.perf_counter()
            eng.search(x_q[s : s + b], thr, k)
            dt = time.perf_counter() - t0
            if i >= warm:
                lat.append(dt)
        lat = np.asarray(lat)
        p50, p95, p99 = (1e3 * np.percentile(lat, q) for q in (50, 95, 99))
        qps = b / np.median(lat)
        rows.append((b, p50, p95, p99, qps))
        print(
            f"[latency] batch={b:<6d} p50={p50:8.2f}ms p95={p95:8.2f}ms "
            f"p99={p99:8.2f}ms  QPS={qps:9.0f}",
            flush=True,
        )
    with open("logs/latency_bench.csv", "w") as f:
        f.write("batch,p50_ms,p95_ms,p99_ms,qps\n")
        for r in rows:
            f.write(f"{r[0]},{r[1]:.3f},{r[2]:.3f},{r[3]:.3f},{r[4]:.1f}\n")
    print("wrote logs/latency_bench.csv", flush=True)


if __name__ == "__main__":
    main()
