"""Decompose the stream-vs-batch QPS gap (VERDICT r4 item 6 / weak 5).

BENCH_r04 measured `search_stream` at 45.5k QPS sustained vs 71.0k
batch-sync on the SAME engine and operating point, and the 50M demo
measured 889 stream vs 1,049 sync — an inversion of round 3's ~5% win.
Hypothesis: the batch-sync headline is timed on repeated identical
queries, so `_probe_batch`'s query cache skips the per-batch H2D
entirely, while `search_stream` re-uploads every batch; on this rig the
tunnel H2D is HOST-SYNCHRONOUS (jnp.asarray blocks ~0.5 s per 65k×128
batch at ~70 MB/s), so the old inline probe dispatch serialized the
upload with every other phase.  blocked_search_stream now dispatches the
next batch's probe from a worker thread to overlap that upload.

This script measures, in ONE session on one chip:
  (a) raw tunnel H2D: blocking upload time of one 65k×128 f32 batch;
  (b) batch-sync WARM (query cache hit — the headline convention);
  (c) batch-sync COLD (alternating two distinct batches => cache miss,
      i.e. what a production request stream would pay unpipelined);
  (d) search_stream over 4×65k fresh batches (threaded prefetch), with
      one phase-marked pass (LIRA_BLOCKED_TIMING=1) committed to the log.

Expected: (d) ≈ (b) when the threaded prefetch hides the upload, and the
(c)−(b) delta ≈ (a) pins the cache-vs-upload attribution.

Usage: python scripts/stream_profile.py [n] [n_bkt] [batch] [n_batches]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import lira_tpu

lira_tpu.enable_compilation_cache()

import jax
import jax.numpy as jnp

from bench import build_trained_index
from lira_tpu.engine.serve import QueryEngine


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_bkt = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 65536
    n_batches = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    d, k = 128, 10

    ix = build_trained_index(n, d, n_bkt, k, batch, n_epoch=6)
    x_d, x_q, layout, km, scaler, params = (
        ix["x_d"], ix["x_q"], ix["layout"], ix["km"], ix["scaler"],
        ix["params"],
    )

    eng = QueryEngine(x_d, layout, km.centroids, scaler, params,
                      probe_cap=128, scan_impl="blocked", block_q=1024,
                      scan_dtype="bfloat16")
    eng.block_margin = 2  # bench r5's calibrated zero-miss margin floor

    # headline operating point: nprobe≈8 => ~0.78% ndis
    out = np.asarray(eng.probe(x_q[:2048]))
    thr = float(np.quantile(out, 1.0 - 8 / n_bkt))

    # (a) raw tunnel H2D of one query batch, blocking, median of 5
    ups = []
    for rep in range(5):
        q_pad = np.ascontiguousarray(x_q + np.float32(1e-6 * (rep + 1)))
        t0 = time.perf_counter()
        dev = jnp.asarray(q_pad)
        dev.block_until_ready()
        ups.append(time.perf_counter() - t0)
        del dev
    h2d_s = float(np.median(ups))
    mbps = batch * d * 4 / h2d_s / 1e6
    print(f"[a] raw H2D {batch}x{d} f32: {h2d_s * 1e3:.0f} ms "
          f"({mbps:.0f} MB/s)", flush=True)

    # warmup: compile both programs at this shape/threshold
    r = eng.search(x_q, thr, k)
    print(f"[setup] nprobe={r.nprobe.mean():.1f} ndis={r.ndis.mean():.0f} "
          f"({100 * r.ndis.mean() / n:.2f}% corpus)", flush=True)

    # (b) batch-sync WARM: identical queries every call => cache hit
    eng.search(x_q, thr, k)
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        eng.search(x_q, thr, k)
        reps.append(time.perf_counter() - t0)
    warm_s = float(np.median(reps))
    print(f"[b] batch-sync warm: {batch / warm_s:.0f} QPS "
          f"({warm_s * 1e3:.0f} ms/batch, reps "
          f"{[f'{x:.3f}' for x in reps]})", flush=True)

    # (c) batch-sync COLD: alternate two distinct batches => cache miss,
    # every call pays its own query upload like a production stream would
    x_q2 = np.ascontiguousarray(x_q + np.float32(1e-6))
    eng.search(x_q2, thr, k)  # compile-free (same shapes), warm the pair
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        eng.search(x_q, thr, k)
        eng.search(x_q2, thr, k)
        reps.append((time.perf_counter() - t0) / 2)
    cold_s = float(np.median(reps))
    print(f"[c] batch-sync cold (fresh upload/call): {batch / cold_s:.0f} QPS "
          f"({cold_s * 1e3:.0f} ms/batch)", flush=True)

    # (d) stream over n_batches fresh batches (threaded probe prefetch)
    big = np.concatenate(
        [x_q + np.float32(1e-6 * i) for i in range(n_batches)]
    ).astype(np.float32)
    eng.search_stream(big, thr, k, batch_size=batch)  # warmup
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        eng.search_stream(big, thr, k, batch_size=batch)
        reps.append(time.perf_counter() - t0)
    stream_s = float(np.median(reps))
    print(f"[d] stream {n_batches}x{batch}: {len(big) / stream_s:.0f} QPS "
          f"sustained ({stream_s:.3f} s, reps "
          f"{[f'{x:.3f}' for x in reps]})", flush=True)

    # one phase-marked stream pass for the committed log
    os.environ["LIRA_BLOCKED_TIMING"] = "1"
    eng.search_stream(big, thr, k, batch_size=batch)
    os.environ.pop("LIRA_BLOCKED_TIMING")

    summary = {
        "h2d_ms_per_batch": round(h2d_s * 1e3, 1),
        "h2d_mbps": round(mbps, 1),
        "qps_batch_warm": round(batch / warm_s, 1),
        "qps_batch_cold": round(batch / cold_s, 1),
        "qps_stream": round(len(big) / stream_s, 1),
        "upload_share_of_cold": round(h2d_s / cold_s, 3),
        "n_batches": n_batches,
        "batch": batch,
        "ndis": float(r.ndis.mean()),
    }
    print("STREAM_PROFILE " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
