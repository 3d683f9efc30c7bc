"""Query-ordering study: which grouping key minimizes block-union cost?

skew_profile_r5 attributed the trained-vs-correlated QPS gap entirely to
block-union inflation; the production blocked scan groups queries by
`rank[top1]` (a centroid-locality tour of the top-probed bucket,
engine/block_scan.py:_probe_prepare).  This study asks whether a richer
key shrinks the union further — entirely host-side from the cached 1M
trained index (the screen cost model Σ_blocks true_union_supertiles·qb
matched the measured qb sweep: 0.71x/0.48x/0.32x predicted vs
qb=512/256/128 measured QPS ordering, logs/qb_sweep_r5*.log).

Candidate keys (all device-implementable inside _probe_prepare):
  id       raw top1 bucket id (pre-r5 behavior)
  tour     rank[top1]                       (current production)
  tour2    (rank[top1], rank[top2]) lexicographic
  setlex   first 4 probes sorted by rank, lexicographic — queries whose
           whole probe PREFIX matches sit adjacent
  rankmean mean tour rank over the full probe set (a 1-D embedding of
           the probe set's tour footprint)
  oracle   greedy seeded set-cover-ish packing on a 8192-query sample —
           an upper-bound estimate, NOT device-implementable

Run on CPU: JAX_PLATFORMS=cpu python scripts/order_study.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import lira_tpu

lira_tpu.enable_compilation_cache()

from bench import build_trained_index
from lira_tpu.engine.block_scan import S_TILES
from lira_tpu.engine.serve import QueryEngine


def block_cost(probed, order, qb, super_per_bucket):
    """(mean true union supertiles, Σ union·qb) under a query ordering."""
    pb = probed[order]
    n_blocks = -(-len(pb) // qb)
    true_sup = np.array([
        pb[b * qb : (b + 1) * qb].any(0) @ super_per_bucket
        for b in range(n_blocks)
    ])
    return float(true_sup.mean()), int(true_sup.sum()) * qb


def greedy_pack(probed_sup, qb, sample=8192, seed=0):
    """Greedy union-minimizing packing on a sample (upper-bound oracle).

    Repeatedly seed a block with the unassigned query having the FEWEST
    probes, then add the query whose probe set adds the fewest new
    supertiles (ties: most overlap).  O(blocks · qb · sample) with a
    vectorized inner step — fine at sample=8192.
    """
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(probed_sup), size=sample, replace=False)
    P = probed_sup[idx]  # (sample, n_sup) bool — probe sets in supertile space
    alive = np.ones(sample, bool)
    order = []
    counts = P.sum(1)
    while alive.any():
        seed_q = np.flatnonzero(alive)[counts[alive].argmin()]
        cur = P[seed_q].copy()
        alive[seed_q] = False
        order.append(seed_q)
        for _ in range(qb - 1):
            if not alive.any():
                break
            live_ids = np.flatnonzero(alive)
            # new supertiles each live query would add to the block union
            add = (P[live_ids] & ~cur).sum(1)
            pick = live_ids[add.argmin()]
            cur |= P[pick]
            alive[pick] = False
            order.append(pick)
    return idx[np.array(order)]


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
    super_per_bucket = -(-np.asarray(eng.tiles_per_bucket) // S_TILES)
    rank = np.asarray(eng.bucket_rank)

    out = np.asarray(eng.probe(x_q[:2048]))
    points = [
        ("headline", float(np.quantile(out, 1.0 - 8 / n_bkt))),
        ("recall95", float(np.quantile(out, 1.0 - 20 / n_bkt))),
    ]
    out_full = np.asarray(eng.probe(x_q))

    for pname, thr in points:
        probed = out_full >= thr
        top1 = out_full.argmax(1)
        probed[np.arange(len(probed)), top1] = True
        B = len(probed)
        r_of = np.where(probed, rank[None, :], n_bkt)  # probe ranks, pad=n_bkt
        r_sorted = np.sort(r_of, axis=1)[:, :4]  # 4 lowest-rank probes
        # second-highest probe score's bucket
        top2 = np.argpartition(-out_full, 1, axis=1)[:, :2]
        top2 = np.where(top2[:, 0] == top1, top2[:, 1], top2[:, 0])

        orders = {
            "id": np.argsort(top1, kind="stable"),
            "tour": np.argsort(rank[top1], kind="stable"),
            "tour2": np.lexsort((rank[top2], rank[top1])),
            "setlex": np.lexsort(tuple(r_sorted.T[::-1])),
            "rankmean": np.argsort(
                np.where(probed, rank[None, :], 0).sum(1) / probed.sum(1),
                kind="stable"),
        }
        print(f"=== {pname} thr={thr:.4f} mean nprobe="
              f"{probed.sum(1).mean():.1f} ===", flush=True)
        base = {}
        for qb in (1024, 512, 256, 128):
            for name, order in orders.items():
                mean_sup, cost = block_cost(probed, order, qb,
                                            super_per_bucket)
                if name == "tour":
                    base[qb] = cost
            for name, order in orders.items():
                mean_sup, cost = block_cost(probed, order, qb,
                                            super_per_bucket)
                print(f"[{pname} qb={qb:4d}] {name:9s} mean_union="
                      f"{mean_sup:7.1f} cost_vs_tour={cost / base[qb]:.3f}",
                      flush=True)

        # oracle on a sample, same sample re-costed under tour for a fair ratio
        sup_of_bucket = np.repeat(
            np.arange(n_bkt), super_per_bucket)  # bucket -> its supertiles
        # probe sets in supertile space for the sample packer
        # (weight each bucket by its supertile count via expansion)
        probed_sup = np.zeros((B, int(super_per_bucket.sum())), bool)
        col = 0
        cols = []
        for b in range(n_bkt):
            cols.append((col, col + int(super_per_bucket[b])))
            col += int(super_per_bucket[b])
        for b in range(n_bkt):
            lo, hi = cols[b]
            probed_sup[:, lo:hi] = probed[:, [b]]
        for qb in (512, 256):
            o = greedy_pack(probed_sup, qb, sample=8192, seed=0)
            sample_mask = np.zeros(B, bool)
            sample_mask[o] = True
            sample_ids = np.flatnonzero(sample_mask)
            tour_sample = sample_ids[
                np.argsort(rank[top1[sample_ids]], kind="stable")]
            m_o, c_o = block_cost(probed, o, qb, super_per_bucket)
            m_t, c_t = block_cost(probed, tour_sample, qb, super_per_bucket)
            print(f"[{pname} qb={qb:4d}] oracle    mean_union={m_o:7.1f} "
                  f"cost_vs_tour={c_o / c_t:.3f} (8192-query sample)",
                  flush=True)


if __name__ == "__main__":
    main()
