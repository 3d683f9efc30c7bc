"""Measured QPS for sub-tile round-2 selection (VERDICT round-2 item 6).

Round 2 of the blocked scan gathers (kg, sel_rows, d) f32 rows per query;
at small ndis this gather is the dominant serving cost (round-2 STATUS
known gap: ~kg·128 rows/query).  sel_rows ∈ {128, 64, 32} trades that
traffic against a 128/sel_rows× wider selection top-k.  This script
measures end-to-end QPS for each at the headline operating points on one
chip, with an in-run oracle assert.

Usage: python scripts/sel_rows_bench.py [n] [n_bkt] [n_q]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import lira_tpu

lira_tpu.enable_compilation_cache()

import jax.numpy as jnp

from lira_tpu.engine.serve import QueryEngine
from lira_tpu.io.datasets import synthetic_dataset
from lira_tpu.labels.scaler import StandardScaler
from lira_tpu.models.probing_mlp import init_params
from lira_tpu.ops.distance import l2_to_centroids
from lira_tpu.ops.knn import exact_knn
from lira_tpu.partition.assign import build_bucket_layout
from lira_tpu.partition.kmeans import kmeans_assign, kmeans_fit
import jax


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_bkt = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    n_q = int(sys.argv[3]) if len(sys.argv) > 3 else 65536
    k, dim = 10, 128

    t0 = time.time()
    from lira_tpu.io.datasets import HARD_REGIME

    b = synthetic_dataset(
        n_base=n, n_query=n_q, dim=dim, k_gt=k, compute_gt=False,
        name="selrows", **HARD_REGIME,
    )
    km = kmeans_fit(b.base, n_bkt, niter=20, seed=43)
    d2b = np.full((n, 1), -1, np.int32)
    d2b[:, 0] = kmeans_assign(b.base, km.centroids)
    layout = build_bucket_layout(d2b, n_bkt)
    raw = np.asarray(l2_to_centroids(jnp.asarray(b.base[:65536]), jnp.asarray(km.centroids)))
    scaler = StandardScaler().fit(raw)
    params = init_params(jax.random.PRNGKey(0), n_bkt, dim)
    # oracle on a small probe slice
    _, oracle = exact_knn(b.base, b.query[:128], k)
    print(f"index ready ({time.time() - t0:.0f}s)", flush=True)

    # (dtype, sel_rows, margin): margin None = the engine default (f32: 8
    # groups at any granularity; bf16: 4*128/sel_rows groups — constant row
    # coverage, docs/bf16_screen.md).  The explicit bf16 margins measure the
    # QPS cost of the scaled default vs the unscaled round-3 settings, so the
    # default can be lowered if bf16_margin_sweep's granularity section shows
    # a smaller zero-miss point.
    configs = [
        ("float32", 128, None), ("float32", 64, None), ("float32", 32, None),
        ("bfloat16", 128, None),
        ("bfloat16", 64, 8), ("bfloat16", 64, None),       # None = 16
        ("bfloat16", 32, 8), ("bfloat16", 32, 16), ("bfloat16", 32, None),  # None = 32
    ]
    for dtype, sel_rows, margin in configs:
            eng = QueryEngine(
                b.base, layout, km.centroids, scaler, params, probe_cap=128,
                scan_impl="blocked", block_q=1024, scan_dtype=dtype,
                block_sel_rows=sel_rows, block_margin=margin,
            )
            outputs = eng.probe(b.query[:512])
            for target_nprobe in (8, 32):
                thr = float(np.quantile(outputs, 1.0 - target_nprobe / n_bkt))
                eng.search(b.query, thr, k)  # warmup/compile at shape
                t1 = time.time()
                res = eng.search(b.query, thr, k)
                qps = n_q / (time.time() - t1)
                # exactness vs oracle on queries whose probed buckets hold
                # all true neighbors (screen must never lose a probed hit)
                r_small = eng.search(b.query[:128], thr, k)
                probed = eng.select_buckets(eng.probe(b.query[:128]), thr)
                gt_bkt = d2b[oracle, 0]
                covered = np.take_along_axis(probed, gt_bkt, axis=1).all(axis=1)
                sets_eq = [
                    set(r_small.ids[i][r_small.ids[i] >= 0]) >= set(oracle[i])
                    for i in np.nonzero(covered)[0]
                ]
                assert all(sets_eq), (
                    f"oracle miss at {dtype}/{sel_rows}/m{margin}/{target_nprobe}"
                )
                print(
                    f"[{dtype:8s} sel_rows={sel_rows:3d} margin={eng.block_margin or 'def'}]"
                    f" nprobe~{target_nprobe:3d} "
                    f"ndis={res.ndis.mean():.0f} QPS={qps:.0f}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
