"""Query-block-size sweep on the trained index (probe-skew attack, r5).

skew_profile_r5 measured the remaining trained-vs-correlated QPS gap to
be entirely block-union inflation: at matched ndis≈0.78% the trained
prober's per-block TRUE union is 693 supertiles (tour grouping, qb=1024)
vs 209 under the untrained prober's correlated probes — query-specific
probes just union to more buckets per 1024-query block.

Since the screen kernel now pays only TRUE union slots (pad slots skip
compute and elide their DMA), shrinking the block directly shrinks the
work: halving qb halves the queries whose probes union, and if the
per-block union drops to a fraction f > 0.5 of the parent's, total
screen FLOPs scale by 2f·(qb/2)/qb = f < 1.  The old measured optimum
qb=1024 predates the pad-skip kernel, so it re-measures here at
{1024, 512, 256} on the SAME engine state (block_q only changes program
shape), interleaved within one session, at the headline (~0.78% ndis)
and the recall>=0.95 (~1.9% ndis) operating points.

Usage: python scripts/qb_sweep.py [n] [n_bkt] [batch]
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
from lira_tpu.engine.block_scan import S_TILES, build_block_unions
from lira_tpu.engine.serve import QueryEngine


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_bkt = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 65536
    d, k = 128, 10

    ix = build_trained_index(n, d, n_bkt, k, batch, n_epoch=6)
    x_d, x_q, layout, km, scaler, params = (
        ix["x_d"], ix["x_q"], ix["layout"], ix["km"], ix["scaler"],
        ix["params"],
    )

    eng = QueryEngine(x_d, layout, km.centroids, scaler, params,
                      probe_cap=128, scan_impl="blocked", block_q=1024,
                      scan_dtype="bfloat16")
    eng.block_margin = 2
    super_per_bucket = -(-np.asarray(eng.tiles_per_bucket) // S_TILES)

    out = np.asarray(eng.probe(x_q[:2048]))
    thr_head = float(np.quantile(out, 1.0 - 8 / n_bkt))
    thr_r95 = float(np.quantile(out, 1.0 - 20 / n_bkt))

    # host cost model from the cached trained index (STATUS r5): screen
    # FLOPs ∝ Σ_blocks union·qb = 0.71x / 0.48x / 0.32x of qb=1024 at
    # qb=512/256/128, while HBM bytes (∝ Σ union) rise 1.4x/1.9x/2.6x —
    # the kernel's achieved 78-89 TFLOPS stays under the HBM-bound
    # ceiling even at qb=128 (intensity = qb MACs/byte), so smaller
    # blocks should win until per-block overheads bite
    qbs = [1024, 512, 256, 128]
    points = [("headline", thr_head), ("recall95", thr_r95)]

    # warm every (qb, thr) program first so the interleaved reps are
    # compile-free
    res0 = {}
    for qb in qbs:
        eng.block_q = qb
        for pname, thr in points:
            r = eng.search(x_q, thr, k)
            res0[(qb, pname)] = (
                float(r.ndis.mean()), float(r.nprobe.mean()),
                np.sort(r.ids, axis=1),
            )
            print(f"[warm qb={qb} {pname}] ndis={r.ndis.mean():.0f} "
                  f"({100 * r.ndis.mean() / n:.2f}%) nprobe="
                  f"{r.nprobe.mean():.1f}", flush=True)

    # union stats per qb at the headline threshold (host-side, from the
    # probe masks — cost model evidence next to the measured QPS)
    out_full = np.asarray(eng.probe(x_q))
    probed = out_full >= thr_head
    top1 = out_full.argmax(1)
    probed[np.arange(len(probed)), top1] = True
    order = np.argsort(eng.bucket_rank[top1], kind="stable")
    tot_base = None
    for qb in qbs:
        pb = probed[order]
        n_blocks = -(-len(pb) // qb)
        true_sup = np.array([
            pb[b * qb : (b + 1) * qb].any(0) @ super_per_bucket
            for b in range(n_blocks)
        ])
        tot = true_sup.sum() * qb  # ∝ screen FLOPs (qb rows per union slot)
        if tot_base is None:
            tot_base = tot
        print(f"[unions qb={qb}] true mean={true_sup.mean():.0f} "
              f"p50={np.percentile(true_sup, 50):.0f} max={true_sup.max()} "
              f"blocks={n_blocks} screen-flops vs qb=1024: "
              f"{tot / tot_base:.2f}x", flush=True)

    # interleaved timed reps: qb rotates inside each rep
    times = {(qb, p): [] for qb in qbs for p, _ in points}
    for rep in range(3):
        for qb in qbs:
            eng.block_q = qb
            for pname, thr in points:
                t0 = time.perf_counter()
                r = eng.search(x_q, thr, k)
                times[(qb, pname)].append(time.perf_counter() - t0)
                ids = np.sort(r.ids, axis=1)
                assert np.array_equal(ids, res0[(qb, pname)][2]), (
                    f"qb={qb} {pname}: results changed between reps"
                )
    # cross-qb identity: same threshold => same neighbor sets at every qb
    # (margin 2 is the calibrated zero-miss point at qb=1024; report any
    # drift at other qb instead of dying — the QPS data stays useful)
    for pname, _ in points:
        base = res0[(1024, pname)][2]
        for qb in qbs[1:]:
            same = np.array_equal(res0[(qb, pname)][2], base)
            if not same:
                diff = (res0[(qb, pname)][2] != base).any(1).mean()
                print(f"[identity WARNING] {pname} qb={qb}: "
                      f"{100 * diff:.3f}% of queries differ from qb=1024",
                      flush=True)
    print("[identity] cross-qb check done", flush=True)

    for pname, _ in points:
        for qb in qbs:
            ts = times[(qb, pname)]
            med = float(np.median(ts))
            ndis, nprobe, _ = res0[(qb, pname)]
            print(f"[e2e {pname} qb={qb}] median {batch / med:.0f} QPS "
                  f"(ndis {100 * ndis / n:.2f}%, all "
                  f"{[f'{batch / t:.0f}' for t in ts]})", flush=True)


if __name__ == "__main__":
    main()
