"""Phase attribution for the blocked serving scan on one TPU chip.

Times, per batch at fixed operating points:
  probe   — `_probe_prepare` program (probe MLP + selection + unions)
  unions  — host supertile-list construction
  screen  — `_scan_all(screen_only=True)`: pallas group-min stream + probed
            masking + per-query tile top-k (round 1 of the scan program)
  full    — the complete scan program (round 1 + exact f32 rescore + dedup)

`full − screen` isolates the round-2 rescore cost, which STATUS.md flags as
the remaining HBM traffic at small ndis (kg·128 rows/query gathered in f32).
Numbers guide whether a bf16 round-2 + row-granular f32 round-3 is worth it.

Usage: python scripts/blocked_phase_profile.py [n] [n_bkt] [batch] [block_q]
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

from lira_tpu.engine.block_scan import (
    _probe_prepare,
    _scan_all,
    build_block_unions,
)
from lira_tpu.engine.serve import QueryEngine
from lira_tpu.labels.scaler import StandardScaler
from lira_tpu.models.probing_mlp import init_params
from lira_tpu.ops.distance import l2_to_centroids
from lira_tpu.partition.assign import build_bucket_layout
from lira_tpu.partition.kmeans import kmeans_assign, kmeans_fit


def timed(fn, *args, reps=3, **kw):
    out = fn(*args, **kw)  # compile
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_bkt = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 65536
    block_qs = [int(v) for v in sys.argv[4].split(",")] if len(sys.argv) > 4 else [1024]
    d, k = 128, 10

    rng = np.random.default_rng(43)
    centers = rng.standard_normal((n_bkt, d), dtype=np.float32) * 30.0
    x_d = centers[rng.integers(0, n_bkt, size=n)] + rng.standard_normal(
        (n, d), dtype=np.float32) * 14.0
    x_q = x_d[rng.integers(0, n, size=batch)] + rng.standard_normal(
        (batch, d), dtype=np.float32) * 10.0

    km = kmeans_fit(x_d, n_bkt, niter=10, seed=43)
    assign = kmeans_assign(x_d, km.centroids)
    layout = build_bucket_layout(assign, n_bkt)
    raw = np.empty((100_000, n_bkt), np.float32)
    cj = jnp.asarray(km.centroids)
    for s in range(0, len(raw), 16384):
        e = min(s + 16384, len(raw))
        raw[s:e] = np.asarray(l2_to_centroids(jnp.asarray(x_d[s:e]), cj))
    scaler = StandardScaler().fit(raw)
    params = init_params(jax.random.PRNGKey(0), n_bkt, d)
    print("index ready", flush=True)

    for dtype, block_q in [(dt, bq) for dt in ("float32", "bfloat16") for bq in block_qs]:
        eng = QueryEngine(
            x_d, layout, km.centroids, scaler, params, probe_cap=128,
            block_q=block_q, scan_impl="blocked", scan_dtype=dtype,
        )
        state = eng._block_state
        outputs = eng.probe(x_q[:512])
        qb = block_q
        B_pad = -(-batch // qb) * qb
        q_pad = np.zeros((B_pad, d), np.float32)
        q_pad[:batch] = x_q
        q_dev = jnp.asarray(q_pad)
        # profile the SHIPPED configuration: the engine's resolved selection
        # granularity and the measured margin default for that (dtype,
        # granularity) — not a hand-pinned operating point that drifts
        from lira_tpu.engine.block_scan import _resolve_margin

        sel_rows = eng.block_sel_rows
        margin = _resolve_margin(None, eng.scan_dtype, sel_rows)
        precision = "default" if dtype == "bfloat16" else "highest"
        fetch_k = k * eng.n_mul
        kg = fetch_k + margin

        for target_nprobe in (8, 32, 96):
            thr = float(np.quantile(outputs, 1.0 - target_nprobe / n_bkt))
            t_probe, (probed, perm, union, nprobe_d, ndis_d) = timed(
                _probe_prepare, eng.params, eng.centroids, eng.scaler_mean,
                eng.scaler_scale, q_dev, jnp.asarray(eng.sizes, jnp.int32),
                jnp.int32(batch), jnp.float32(thr), 128, qb,
            )
            union_h = np.asarray(union)
            t0 = time.perf_counter()
            supers, tb, ulen = build_block_unions(
                union_h, eng.tile_start, eng.tiles_per_bucket, state.tile_bucket
            )
            t_unions = time.perf_counter() - t0
            s_dev, tb_dev = jnp.asarray(supers), jnp.asarray(tb)
            ul_dev = jnp.asarray(ulen)
            common = dict(
                metric=eng.metric, kg=kg, fetch_k=fetch_k, k=k, qb=qb,
                precision=precision, interpret=False, sel_rows=sel_rows,
            )
            t_screen, _ = timed(
                _scan_all, q_dev, probed, perm, s_dev, tb_dev, ul_dev,
                state.corpus_flat, state.bsq, state.rescore_arg,
                state.tiles_ids, state.tile_pad_count, screen_only=True, **common,
            )
            t_full, _ = timed(
                _scan_all, q_dev, probed, perm, s_dev, tb_dev, ul_dev,
                state.corpus_flat, state.bsq, state.rescore_arg,
                state.tiles_ids, state.tile_pad_count, **common,
            )
            ndis = float(np.asarray(ndis_d[:batch]).mean())
            u_tiles = supers.shape[1]
            print(
                f"[{dtype} qb={qb} sel={sel_rows} m={margin} "
                f"nprobe≈{target_nprobe} ndis={ndis:.0f} U={u_tiles}] "
                f"probe {1e3 * t_probe:.0f}ms unions {1e3 * t_unions:.0f}ms "
                f"screen {1e3 * t_screen:.0f}ms rescore {1e3 * (t_full - t_screen):.0f}ms "
                f"full {1e3 * t_full:.0f}ms -> {batch / t_full:.0f} scan-QPS",
                flush=True,
            )
        del eng, state


if __name__ == "__main__":
    main()
