"""Quantify the bf16 round-1 screen: missed-neighbor rate vs margin.

Two bf16 fast paths share the same structure (bf16 MXU pass selects
candidate tiles, exact f32 rescore ranks them); both can only err by
*selection misses* — a true top-k tile whose bf16 group-min rounds past the
margin.  This script measures that rate directly at 1M×128:

  1. ops/knn_pallas.knn_fused(precision='default'): margin ∈ {0,2,4,8,16,32}
     vs the f32-exact result → fraction of true neighbors missed;
  2. engine serving, scan_dtype='bfloat16' (blocked): block_margin sweep vs
     the f32 engine at a mid-selectivity threshold;
  3. the same sweep at sub-tile selection granularity (block_sel_rows 32/64):
     the margin is counted in selection groups, so finer groups put
     128/sel_rows x more group-mins inside the bf16 rounding band — this
     section measures where misses vanish at each granularity (the engine's
     scaled default is 4 * 128/sel_rows groups);
  4. the int8 quantized screen (scan_dtype='int8'): miss rate + QPS per
     (granularity, margin) — measured zero-miss at 4 tiles on the hard
     regime, which set the engine's 8 * 128/sel_rows default (2x safety).

Writes the measured table to docs/bf16_screen.md.

Usage: python scripts/bf16_margin_sweep.py [n] [n_q]
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

from lira_tpu.engine.serve import QueryEngine
from lira_tpu.labels.scaler import StandardScaler
from lira_tpu.models.probing_mlp import init_params
from lira_tpu.ops.distance import l2_to_centroids
from lira_tpu.ops.knn import exact_knn
from lira_tpu.ops.knn_pallas import knn_fused
from lira_tpu.partition.assign import build_bucket_layout
from lira_tpu.partition.kmeans import kmeans_assign, kmeans_fit


def miss_rate(ids_test: np.ndarray, ids_ref: np.ndarray) -> float:
    """Fraction of reference neighbors absent from the test result."""
    hit = (ids_ref[:, :, None] == ids_test[:, None, :]).any(axis=2)
    return float(1.0 - hit.mean())


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    d, k, n_bkt = 128, 10, 1024

    # hard-regime corpus (scripts/hard_regime_calibrate.py): the same
    # fan-out distribution every round-3 measurement uses — margin behavior
    # is data-dependent, so calibrate it where we serve
    from lira_tpu.io.datasets import HARD_REGIME, synthetic_dataset

    b = synthetic_dataset(
        n_base=n, n_query=n_q, dim=d, k_gt=k, compute_gt=False,
        name="margin", **HARD_REGIME,
    )
    x_d, x_q = b.base, b.query
    print(f"corpus {x_d.shape} ready (hard regime)", flush=True)

    _, ids_exact = exact_knn(x_d, x_q, k)
    print("f32 exact reference done", flush=True)

    lines = [
        "# bf16 round-1 screen: measured missed-neighbor rates",
        "",
        f"Setup: {n:,}×{d} clustered corpus, {n_q} queries, k={k}, one TPU chip.",
        "The bf16 fast paths select candidate 128-row tiles with a bf16 MXU",
        "pass and re-rank the selected tiles' rows exactly in f32; the only",
        "error mode is a true-neighbor tile rounding past the selection",
        "margin.  Rates below are `1 − recall` of the bf16 path against the",
        "f32-exact result (0 = bit-identical neighbor sets).",
        "",
        "## knn_fused (offline kNN, `precision='default'`)",
        "",
        "| margin (extra tiles) | missed-neighbor rate | wall s |",
        "|---|---|---|",
    ]
    for margin in (0, 2, 4, 8, 16, 32):
        t0 = time.time()
        _, ids_m = knn_fused(x_d, x_q, k, margin=margin, precision="default")
        dt = time.time() - t0
        r = miss_rate(ids_m, ids_exact)
        print(f"knn_fused margin={margin}: miss={r:.2e} ({dt:.2f}s)", flush=True)
        lines.append(f"| {margin} | {r:.2e} | {dt:.2f} |")

    lines += [
        "",
        "## knn_fused (`precision='int8'` quantized sweep)",
        "",
        "| margin (extra tiles) | missed-neighbor rate | wall s |",
        "|---|---|---|",
    ]
    for margin in (4, 8, 16, 32, 64):
        t0 = time.time()
        _, ids_m = knn_fused(x_d, x_q, k, margin=margin, precision="int8")
        dt = time.time() - t0
        r = miss_rate(ids_m, ids_exact)
        print(f"knn_fused int8 margin={margin}: miss={r:.2e} ({dt:.2f}s)", flush=True)
        lines.append(f"| {margin} | {r:.2e} | {dt:.2f} |")

    # serving engine: bf16 blocked vs f32 blocked at a mid threshold
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

    ref_eng = QueryEngine(x_d, layout, km.centroids, scaler, params,
                          scan_impl="blocked", probe_cap=128)
    outputs = ref_eng.probe(x_q[:512])
    thr = float(np.quantile(outputs, 1.0 - 32 / n_bkt))  # ~32 probes/query
    r_ref = ref_eng.search(x_q, thr, k)
    del ref_eng

    lines += [
        "",
        "## serving engine (blocked scan, `scan_dtype='bfloat16'`)",
        "",
        f"Operating point: threshold for ≈32 probed buckets (ndis ≈ "
        f"{r_ref.ndis.mean():.0f}/query).",
        "",
        "| block_margin (extra tiles) | neighbor-set miss rate |",
        "|---|---|",
    ]
    for margin in (0, 4, 8, 16, 32):
        eng = QueryEngine(x_d, layout, km.centroids, scaler, params,
                          scan_impl="blocked", scan_dtype="bfloat16",
                          probe_cap=128, block_margin=margin, block_sel_rows=128)
        r_b = eng.search(x_q, thr, k)
        r = miss_rate(r_b.ids, r_ref.ids)
        print(f"serve bf16 margin={margin}: miss={r:.2e}", flush=True)
        lines.append(f"| {margin} | {r:.2e} |")
        del eng

    lines += [
        "",
        "## sub-tile selection granularity (`block_sel_rows` < 128)",
        "",
        "The margin is counted in selection groups: at sel_rows=32 there are",
        "4x more group-mins competing inside the same bf16 rounding band, so",
        "the engine's default margin scales to 4 * 128/sel_rows groups",
        "(constant row coverage).  Measured miss rates per (granularity,",
        "margin):",
        "",
        "| block_sel_rows | block_margin (groups) | neighbor-set miss rate |",
        "|---|---|---|",
    ]
    for sel_rows in (64, 32):
        for margin in (8, 16, 32, 64):
            eng = QueryEngine(x_d, layout, km.centroids, scaler, params,
                              scan_impl="blocked", scan_dtype="bfloat16",
                              probe_cap=128, block_margin=margin,
                              block_sel_rows=sel_rows)
            r_b = eng.search(x_q, thr, k)
            r = miss_rate(r_b.ids, r_ref.ids)
            print(f"serve bf16 sel_rows={sel_rows} margin={margin}: "
                  f"miss={r:.2e}", flush=True)
            lines.append(f"| {sel_rows} | {margin} | {r:.2e} |")
            del eng

    lines += [
        "",
        "## int8 quantized screen (`scan_dtype='int8'`)",
        "",
        "Round 1 stores the corpus as symmetric per-dim int8 (¼ the f32 HBM",
        "bytes, int32 MXU accumulation); quantization error replaces bf16",
        "rounding as the selection-miss mode.  Measured miss rates per",
        "(granularity, margin) at the same operating point (engine default:",
        "8 · 128/sel_rows groups — 2× the measured 4-tile zero-miss point):",
        "",
        "| block_sel_rows | block_margin (groups) | neighbor-set miss rate | QPS |",
        "|---|---|---|---|",
    ]
    for sel_rows in (128, 32):
        for margin in (4, 8, 16, 32, 64):
            if sel_rows == 128 and margin > 32:
                continue
            eng = QueryEngine(x_d, layout, km.centroids, scaler, params,
                              scan_impl="blocked", scan_dtype="int8",
                              probe_cap=128, block_margin=margin,
                              block_sel_rows=sel_rows)
            eng.search(x_q, thr, k)  # warmup at the measured shape
            t0 = time.time()
            r_b = eng.search(x_q, thr, k)
            qps = n_q / (time.time() - t0)
            r = miss_rate(r_b.ids, r_ref.ids)
            print(f"serve int8 sel_rows={sel_rows} margin={margin}: "
                  f"miss={r:.2e} qps={qps:.0f}", flush=True)
            lines.append(f"| {sel_rows} | {margin} | {r:.2e} | {qps:.0f} |")
            del eng

    lines += [
        "",
        "Default margins: knn_fused uses 8 (bf16; 16 for int8).  The blocked",
        "engine's bf16 default is 4 * 128/sel_rows selection groups at every",
        "granularity (4 tiles of constant row coverage — the measured",
        "zero-miss point; int8 uses 8 * 128/sel_rows = 2x its measured",
        "zero-miss; engine/block_scan.py::_resolve_margin).  bf16 rounding",
        "of group-mins is data-dependent — re-validate on new distributions",
        "(re-run this script, or raise `block_margin`) before trusting the",
        "bf16 screen in production.  The exact f32 round-2 rescore limits but",
        "does not eliminate the risk: a true-neighbor group dropped by the",
        "screen is never rescored.",
        "Generated by scripts/bf16_margin_sweep.py.",
        "",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "docs", "bf16_screen.md")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
