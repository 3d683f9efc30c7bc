"""Phase attribution at the CURRENT headline operating points, on the
cached TRAINED index (scripts/blocked_phase_profile.py profiles an easy
synthetic corpus with an untrained prober — useful for kernel work, but
not an attribution of the shipped configuration).

Measures, per (dtype, operating point):
  probe      the probe program (MLP + select + sort + unions), device
  unions     host supertile-list construction
  scan       the full fused scan program (screen + gather + exact f32
             rescore + dedup), device
  device-limited QPS = batch / (probe + unions + scan) — what the chip
             sustains without the rig's tunnel I/O (result D2H runs at
             ~35 MB/s here; a production PCIe host pays ~none of it)
  margin slope — scan time at selection margins {2, 8, 16}: the
             per-group cost of round-2 widening, the measured
             sensitivity that decides whether a cheaper round 2 (bf16
             rescore + row-granular f32 round 3) could pay.

NOTE an earlier revision split screen vs round-2 via
`_scan_all(screen_only=True)`; at these shapes that variant materializes
the (n_blocks, U·SG, qb) minima tensor the fused program never writes
to HBM, inflating "screen" past the full program's cost — the split was
invalid and is replaced by the margin-slope sensitivity.

Usage: python scripts/phase_profile_trained.py
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
    _probe_batch,
    _round2_sub,
    _scan_all,
    build_block_unions,
)
from lira_tpu.engine.serve import QueryEngine


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
    n, d, n_bkt, k, batch = 1_000_000, 128, 1024, 10, 65536
    ix = build_trained_index(n, d, n_bkt, k, batch, n_epoch=6)
    x_d, x_q, layout, km, scaler, params = (
        ix["x_d"], ix["x_q"], ix["layout"], ix["km"], ix["scaler"],
        ix["params"],
    )

    # (operating point, target nprobe, measured-optimal qb:
    #  logs/qb_sweep_r5.log / the bench autotune)
    points = [("headline", 8, 1024), ("recall95", 20, 512)]

    for dtype in ("int8", "bfloat16"):
        for pname, target_nprobe, qb in points:
            eng = QueryEngine(
                x_d, layout, km.centroids, scaler, params, probe_cap=128,
                block_q=qb, scan_impl="blocked", scan_dtype=dtype,
            )
            state = eng._block_state
            outputs = np.asarray(eng.probe(x_q[:2048]))
            thr = float(np.quantile(outputs, 1.0 - target_nprobe / n_bkt))

            sel_rows = eng.block_sel_rows
            precision = "default" if dtype == "bfloat16" else "highest"
            fetch_k = k * eng.n_mul

            t_probe, h = timed(
                lambda: _probe_batch(state, eng, x_q, thr, qb,
                                     use_cache=True))
            union_h = np.asarray(h["union"])
            t0 = time.perf_counter()
            supers, tb, ulen = build_block_unions(
                union_h, eng.tile_start, eng.tiles_per_bucket,
                state.tile_bucket)
            t_unions = time.perf_counter() - t0
            s_dev, tb_dev, ul_dev = (jnp.asarray(supers), jnp.asarray(tb),
                                     jnp.asarray(ulen))
            args = (h["q"], h["probed"], h["perm"], s_dev, tb_dev, ul_dev,
                    state.corpus_flat, state.bsq, state.rescore_arg,
                    state.tiles_ids, state.tile_pad_count)

            t_scan = {}
            for margin in (2, 8, 16):
                kg = fetch_k + margin
                common = dict(
                    metric=eng.metric, kg=kg, fetch_k=fetch_k, k=k,
                    qb=h["qb"], precision=precision, interpret=False,
                    sub=_round2_sub(kg, sel_rows, d, h["qb"]),
                    sel_rows=sel_rows, dim_scale=state.dim_scale,
                )
                t_scan[margin], _ = timed(_scan_all, *args, **common)

            ndis = float(np.asarray(h["ndis"])[:batch].mean())
            dev = t_probe + t_unions + t_scan[2]
            slope = (t_scan[16] - t_scan[2]) / 14  # s per extra group
            print(
                f"[{dtype} {pname} qb={h['qb']} sel={sel_rows} "
                f"U={supers.shape[1]} ndis={100 * ndis / n:.2f}%] "
                f"probe {1e3 * t_probe:.0f}ms unions {1e3 * t_unions:.0f}ms "
                f"scan(m=2) {1e3 * t_scan[2]:.0f}ms "
                f"(m=8 {1e3 * t_scan[8]:.0f}, m=16 {1e3 * t_scan[16]:.0f}; "
                f"slope {1e3 * slope:.1f}ms/group) "
                f"device-limited {batch / dev:.0f} QPS",
                flush=True)


if __name__ == "__main__":
    main()
