"""block_q autotune at the GIST-dimension recall≥0.95 operating point.

The published 960-d number (README, logs/gist_dim_sweep.csv) is 13.6k
QPS bf16 at thr=0.05 (recall 0.952, 1.68% ndis) with the default
block_q — at d=960 the bf16 VMEM cap (_screen_qb_cap) already limits
the screen block to 512.  The 128-d study showed the qb optimum moves
with probe fan-out (qb=512 was 25% faster at the ~20-probe point), so
this measures candidates below the cap at GIST's recall≥0.95 point on
the cached trained 960-d index, interleaved, identity-checked.

Usage: python scripts/gist_qb_tune.py   (needs the /tmp gist caches from
scripts/gist_dim_bench.py)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import lira_tpu

lira_tpu.enable_compilation_cache()

from lira_tpu.engine.calibrate import autotune_block_q
from lira_tpu.engine.serve import QueryEngine
from lira_tpu.io.artifacts import load_params
from lira_tpu.labels.scaler import StandardScaler
from lira_tpu.partition.assign import build_bucket_layout


def main():
    n, dim, n_bkt, n_q, n_epoch, k = 1_000_000, 960, 1024, 8192, 10, 10
    f = np.load(f"/tmp/gist_corpus_{n}_{dim}_{n_q}.npz")
    x_d, x_q, gt = f["x_d"], f["x_q"], f["gt"]
    art = f"/tmp/gist_artifacts_{n}_{dim}_{n_bkt}_{n_epoch}"
    fi = np.load(art + "_index.npz")
    centroids, d2b = fi["centroids"], fi["d2b"]
    scaler = StandardScaler()
    scaler.mean_, scaler.scale_ = fi["mean"], fi["scale"]
    params = load_params(art + "_model.npz")
    layout = build_bucket_layout(d2b, n_bkt)
    print("gist index from cache", flush=True)

    eng = QueryEngine(x_d, layout, centroids, scaler, params,
                      n_mul=d2b.shape[1], scan_impl="blocked",
                      scan_dtype="bfloat16")
    print(f"engine built; default block_q resolves under the d=960 bf16 "
          f"VMEM cap", flush=True)

    thr = 0.05  # recall 0.952 @ 1.68% ndis in logs/gist_dim_sweep.csv
    # baseline at the shipped default
    eng.search(x_q, thr, k)  # warm
    t0 = time.time()
    r0 = eng.search(x_q, thr, k)
    el0 = time.time() - t0
    hits = (r0.ids[:, :, None] == gt[:, None, :]).any(axis=1)
    print(f"[baseline] recall@{k}={hits.mean():.4f} "
          f"ndis={100 * r0.ndis.mean() / n:.2f}% "
          f"QPS={len(x_q) / el0:.0f}", flush=True)

    tune = autotune_block_q(eng, x_q, thr, k, candidates=(512, 256, 128),
                            reps=3)
    for qb, s in sorted(tune.medians.items(), reverse=True):
        print(f"  qb={qb}: {len(x_q) / s:.0f} QPS", flush=True)
    print(f"-> picked qb={tune.block_q}", flush=True)

    eng.block_q = tune.block_q
    r1 = eng.search(x_q, thr, k)
    assert np.array_equal(np.sort(r1.ids, 1), np.sort(r0.ids, 1)), (
        "qb changed the neighbor sets")
    t0 = time.time()
    r1 = eng.search(x_q, thr, k)
    el1 = time.time() - t0
    print(f"[tuned qb={tune.block_q}] QPS={len(x_q) / el1:.0f} "
          f"({100 * (el0 / el1 - 1):+.1f}% vs baseline; identity ok)",
          flush=True)


if __name__ == "__main__":
    main()
