"""QPS at recall@10 ≥ 0.95: redundancy × margin tuning AT that operating
point (VERDICT r4 item 9).

BENCH_r04 recorded 50.1k QPS at the ≥0.95 rung (1.93% ndis) on an index
with NO redundancy — redundancy was tuned only at the 0.78%-ndis headline.
The lira-vs-ivf study hit 0.95 recall at 1.7% ndis WITH redundancy, so the
frontier at 0.95 is plausibly cheaper.  This script measures the
trade-curve directly: for each duplication ratio it rebuilds the layout
(same trained model — redundancy only reassigns rows, reference
LIRA_smallscale.py:336-342), finds the CHEAPEST threshold whose sampled
recall ≥ 0.95, and measures warm QPS there with the in-run calibrated
margin.

Usage: python scripts/recall095_tune.py [ratios] [n] [n_bkt] [batch]
  ratios: comma list, default "0,0.03,0.06,0.12"
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import lira_tpu

lira_tpu.enable_compilation_cache()

import jax.numpy as jnp

from bench import build_trained_index
from lira_tpu.engine.calibrate import calibrate_block_margin
from lira_tpu.engine.serve import QueryEngine
from lira_tpu.labels.scaler import scaled_centroid_distances
from lira_tpu.models.train import infer, predict_counts
from lira_tpu.ops.knn import exact_knn
from lira_tpu.partition.assign import build_bucket_layout
from lira_tpu.redundancy.assign import apply_redundancy_subset, select_top_ratio


def main():
    ratios = [float(r) for r in
              (sys.argv[1] if len(sys.argv) > 1 else "0,0.03,0.06,0.12").split(",")]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    n_bkt = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    batch = int(sys.argv[4]) if len(sys.argv) > 4 else 65536
    d, k, n_gt, n_epoch = 128, 10, 4096, 6

    ix = build_trained_index(n, d, n_bkt, k, batch, n_epoch)
    x_d, x_q, km, scaler, params, assign = (
        ix["x_d"], ix["x_q"], ix["km"], ix["scaler"], ix["params"], ix["assign"]
    )
    t0 = time.perf_counter()
    _, gt = exact_knn(x_d, x_q[:n_gt], k)
    gt = np.asarray(gt)
    print(f"[setup] gt for {n_gt} queries ({time.perf_counter() - t0:.1f}s)",
          flush=True)

    # features for redundancy scoring (device-resident (n, n_bkt) in HBM)
    t0 = time.perf_counter()
    dist, _, _ = scaled_centroid_distances(x_d, None, km.centroids, scaler=scaler)
    counts = predict_counts(params, dist, jnp.asarray(x_d, jnp.float32))
    print(f"[setup] predicted-nprobe counts ({time.perf_counter() - t0:.1f}s)",
          flush=True)

    data_2_bkt = assign.reshape(-1, 1).astype(np.int32)
    n_mul_table = 2  # assignment slots per duplicated row (reference n_mul)
    d2b_wide = np.concatenate(
        [data_2_bkt, np.full((n, n_mul_table - 1), -1, np.int32)], axis=1
    )

    results = []
    for ratio in ratios:
        t0 = time.perf_counter()
        if ratio > 0:
            selected = select_top_ratio(np.asarray(counts), ratio)
            sel_idx = np.sort(selected)
            x_sel = jnp.asarray(x_d[sel_idx], jnp.float32)
            sel_predicts, sel_scores = infer(
                params, np.asarray(dist)[sel_idx] if isinstance(dist, np.ndarray)
                else dist[jnp.asarray(sel_idx)], x_sel
            )
            d2b = apply_redundancy_subset(d2b_wide, sel_scores, sel_predicts, sel_idx)
        else:
            d2b = d2b_wide
        layout = build_bucket_layout(d2b, n_bkt)
        eng = QueryEngine(x_d, layout, km.centroids, scaler, params,
                          probe_cap=128, scan_impl="blocked", block_q=1024,
                          scan_dtype="bfloat16", n_mul=n_mul_table)
        outputs = np.asarray(eng.probe(x_q[:2048]))
        print(f"[r={ratio}] engine built, table ×{layout.total / n:.3f} "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)

        # bisect the cheapest nprobe rung with recall >= 0.95, then measure
        best = None
        for target_nprobe in (10, 12, 14, 16, 20, 24, 32, 48):
            thr = float(np.quantile(outputs, 1.0 - target_nprobe / n_bkt))
            r = eng.search(x_q[:n_gt], thr, k)
            rec = float((r.ids[:, :, None] == gt[:, None, :]).any(axis=1).mean())
            print(f"[r={ratio}] nprobe~{target_nprobe}: recall={rec:.4f} "
                  f"ndis={100 * r.ndis.mean() / n:.2f}%", flush=True)
            if rec >= 0.95:
                best = (target_nprobe, thr, rec)
                break
        if best is None:
            print(f"[r={ratio}] no rung reached 0.95", flush=True)
            del eng
            continue
        target_nprobe, thr, rec = best

        cal = calibrate_block_margin(eng, x_q[:2048], thr, k,
                                     ladder=(0, 2, 4, 8), safety=2.0)
        qps_best = None
        for m in sorted({mm for mm in (cal.margin, 8, 16) if mm >= cal.margin}):
            eng.block_margin = int(m)
            eng.search(x_q, thr, k)  # warm this (margin, shape)
            t0 = time.perf_counter()
            r = eng.search(x_q, thr, k)
            el = time.perf_counter() - t0
            rec_m = float((r.ids[:n_gt, :, None] == gt[:, None, :]).any(axis=1).mean())
            q = batch / el
            print(f"[r={ratio}] margin={m}: {q:.0f} QPS recall={rec_m:.4f} "
                  f"ndis={100 * r.ndis.mean() / n:.2f}%", flush=True)
            if rec_m >= 0.95 and (qps_best is None or q > qps_best[0]):
                qps_best = (q, m, rec_m, float(100 * r.ndis.mean() / n))
        if qps_best:
            q, m, rec_m, ndis_pct = qps_best
            results.append(dict(ratio=ratio, qps=round(q, 1), margin=m,
                                recall=round(rec_m, 4), ndis_pct=round(ndis_pct, 3),
                                nprobe=target_nprobe,
                                table_x=round(layout.total / n, 3)))
            print(f"[r={ratio}] BEST {q:.0f} QPS @ recall {rec_m:.4f} "
                  f"(ndis {ndis_pct:.2f}%, margin {m})", flush=True)
        del eng

    print("\n=== recall>=0.95 trade curve ===", flush=True)
    for row in results:
        print(row, flush=True)
    if results:
        win = max(results, key=lambda r: r["qps"])
        print(f"WINNER: ratio={win['ratio']} -> {win['qps']} QPS "
              f"(vs BENCH_r04 50.1k)", flush=True)


if __name__ == "__main__":
    main()
