"""Probe-skew attribution for the blocked engine (VERDICT r4 item 2 / weak 3).

Round 4 measured 84.4k QPS at 0.83% ndis under near-uniform probing
(logs/sel_rows_bench.log) vs 71.0k on the trained index (BENCH_r04) and
attributed the 13-18% gap to "probe skew" without evidence.  This script
separates the candidate mechanisms IN ONE SESSION (r4's headline flipped
~10% between sessions, so cross-session comparisons cannot attribute a
15% effect):

  (a) pad-to-max: `build_block_unions` pads every block's supertile list
      to the pow2 ceiling of the LARGEST block union in the batch; the
      screen kernel runs (and the selection masks) the pad entries.
      Metric: per-block TRUE union supertiles vs padded width U.
  (b) bigger true unions under skewed probing at matched ndis.
      Metric: mean true supertiles per block, trained vs uniform.
  (c) phase shift: probe / host-unions / screen-only / rescore / e2e,
      timed per mode.
  (d) session variance: both modes interleaved, 3 reps, medians.

Both modes serve the SAME engine/corpus/layout; "uniform" replaces the
trained MLP params with untrained init (the r4 sel_rows bench's regime)
at a threshold matched to the TRAINED mode's measured ndis.

Usage: python scripts/skew_profile.py [n] [n_bkt] [batch]
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

from bench import build_trained_index
from lira_tpu.engine.block_scan import (
    S_TILES,
    _probe_prepare,
    _scan_all,
    build_block_unions,
)
from lira_tpu.engine.serve import QueryEngine
from lira_tpu.models.probing_mlp import init_params


def timed(fn, *args, reps=3, **kw):
    out = fn(*args, **kw)
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
    d, k, qb = 128, 10, 1024

    ix = build_trained_index(n, d, n_bkt, k, batch, n_epoch=6)
    x_d, x_q, layout, km, scaler = (
        ix["x_d"], ix["x_q"], ix["layout"], ix["km"], ix["scaler"]
    )
    params_tr = ix["params"]
    params_un = init_params(jax.random.PRNGKey(1), n_bkt, d)

    eng = QueryEngine(x_d, layout, km.centroids, scaler, params_tr,
                      probe_cap=128, scan_impl="blocked", block_q=qb,
                      scan_dtype="bfloat16")
    eng.block_margin = 2  # bench r4's calibrated zero-miss margin ×2
    state = eng._block_state
    sel_rows = eng.block_sel_rows
    margin = 2
    fetch_k = k * eng.n_mul
    kg = fetch_k + margin
    sizes_dev = jnp.asarray(eng.sizes, jnp.int32)
    super_per_bucket = -(-np.asarray(eng.tiles_per_bucket) // S_TILES)

    B_pad = -(-batch // qb) * qb
    q_pad = np.zeros((B_pad, d), np.float32)
    q_pad[:batch] = x_q
    q_dev = jnp.asarray(q_pad)

    # thresholds: trained at the headline nprobe≈8; uniform matched to the
    # trained mode's measured mean ndis by bisection on its own outputs
    out_tr = np.asarray(eng.probe(x_q[:2048]))
    thr_tr = float(np.quantile(out_tr, 1.0 - 8 / n_bkt))
    pro_un = QueryEngine(x_d, layout, km.centroids, scaler, params_un,
                         probe_cap=128, scan_impl="blocked", block_q=qb,
                         scan_dtype="bfloat16")
    pro_un.block_margin = 2
    out_un = np.asarray(pro_un.probe(x_q[:2048]))

    def mean_ndis(outputs, thr):
        keep = outputs >= thr
        keep[np.arange(len(outputs)), outputs.argmax(1)] = True
        return float((keep @ np.asarray(eng.sizes)).mean())

    target = mean_ndis(out_tr, thr_tr)
    lo, hi = float(out_un.min()), float(out_un.max())
    for _ in range(40):
        mid = 0.5 * (lo + hi)
        if mean_ndis(out_un, mid) > target:
            lo, hi = mid, hi
        else:
            lo, hi = lo, mid
        lo, hi = min(lo, hi), max(lo, hi)
    thr_un = 0.5 * (lo + hi)
    print(f"[setup] trained thr={thr_tr:.4f} target ndis={target:.0f}; "
          f"uniform thr={thr_un:.4f} ndis={mean_ndis(out_un, thr_un):.0f}",
          flush=True)

    # three modes: trained with raw-id grouping (round 4's engine), trained
    # with the centroid-tour locality grouping (partition/order.py), and the
    # uniform-probe regime matched to trained ndis.  tour vs id is the SAME
    # engine — only the grouping key changes (results are rank-invariant).
    from lira_tpu.partition.order import centroid_tour_rank

    rank_dev = jnp.asarray(centroid_tour_rank(np.asarray(km.centroids)), jnp.int32)
    modes = {
        "trained-id": (params_tr, thr_tr, eng, None),
        "trained-tour": (params_tr, thr_tr, eng, rank_dev),
        "uniform": (params_un, thr_un, pro_un, None),
    }
    handles = {}
    for name, (params, thr, e_m, rk) in modes.items():
        t_probe, (probed, perm, union, nprobe_d, ndis_d) = timed(
            _probe_prepare, params, eng.centroids, eng.scaler_mean,
            eng.scaler_scale, q_dev, sizes_dev, jnp.int32(batch),
            jnp.float32(thr), 128, qb, rk,
        )
        union_h = np.asarray(union)
        t0 = time.perf_counter()
        supers, tb, ulen = build_block_unions(
            union_h, eng.tile_start, eng.tiles_per_bucket, state.tile_bucket
        )
        t_unions = time.perf_counter() - t0
        true_sup = union_h @ super_per_bucket  # (n_blocks,) upper bound on
        # true per-block supertiles (bucket tile runs can share a supertile)
        U = supers.shape[1]
        ndis = float(np.asarray(ndis_d[:batch]).mean())
        nprobe = float(np.asarray(nprobe_d[:batch]).mean())
        pad_waste = 1.0 - true_sup.mean() / U
        print(f"[{name}] nprobe={nprobe:.1f} ndis={ndis:.0f} "
              f"({100 * ndis / n:.2f}%) | block unions: true mean="
              f"{true_sup.mean():.0f} p50={np.percentile(true_sup, 50):.0f} "
              f"max={true_sup.max()} padded U={U} -> pad waste "
              f"{100 * pad_waste:.0f}% | probe {1e3 * t_probe:.0f}ms "
              f"unions {1e3 * t_unions:.0f}ms", flush=True)
        handles[name] = dict(
            probed=probed, perm=perm, supers=jnp.asarray(supers),
            tb=jnp.asarray(tb), ulen=jnp.asarray(ulen), thr=thr, engine=e_m,
            rank=rk,
        )

    common = dict(metric=eng.metric, kg=kg, fetch_k=fetch_k, k=k, qb=qb,
                  precision="default", interpret=False, sel_rows=sel_rows)

    # phase split per mode (screen-only vs full scan program)
    for name, h in handles.items():
        t_screen, _ = timed(
            _scan_all, q_dev, h["probed"], h["perm"], h["supers"], h["tb"],
            h["ulen"], state.corpus_flat, state.bsq, state.rescore_arg,
            state.tiles_ids, state.tile_pad_count, screen_only=True, **common,
        )
        t_full, _ = timed(
            _scan_all, q_dev, h["probed"], h["perm"], h["supers"], h["tb"],
            h["ulen"], state.corpus_flat, state.bsq, state.rescore_arg,
            state.tiles_ids, state.tile_pad_count, **common,
        )
        print(f"[{name}] screen {1e3 * t_screen:.0f}ms "
              f"rescore {1e3 * (t_full - t_screen):.0f}ms "
              f"full-scan {1e3 * t_full:.0f}ms -> {batch / t_full:.0f} scan-QPS",
              flush=True)

    # interleaved e2e A/B: 3 reps each, alternating within one session.
    # the tour mode serves through the SAME engine object — _probe_batch
    # reads engine.bucket_rank per call, so toggling the attribute flips
    # only the grouping key (and the oracle-checked results are identical)
    def run(h):
        e = h["engine"]
        e.bucket_rank = None if h["rank"] is None else np.asarray(h["rank"])
        return e.search(x_q, h["thr"], k)

    for name, h in handles.items():  # compile/warm all modes first
        run(h)
    times = {m: [] for m in handles}
    for rep in range(3):
        for name, h in handles.items():
            t0 = time.perf_counter()
            run(h)
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        med = float(np.median(ts))
        print(f"[e2e {name}] median {batch / med:.0f} QPS over {len(ts)} reps "
              f"(all: {[f'{batch / t:.0f}' for t in ts]})", flush=True)


if __name__ == "__main__":
    main()
