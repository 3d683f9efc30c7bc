"""Multi-chip query serving: corpus sharded over the mesh, top-k merged over ICI.

Placement is tile-granular: the global concatenated tile sequence is sliced
into n_dev near-equal contiguous segments, so a skewed bucket distribution
(one giant bucket) is spread across devices instead of pinning one device's
table shape and scan time to the skew.  Queries are replicated; each device
runs the *blocked union scan* over its local probed tiles (the same
group-min screen → masked select → exact f32 rescan as the single-chip
engine/block_scan.py, in XLA-gather form so it runs inside shard_map on any
backend); per-device top-fetch_k results are all_gather'ed over the mesh
axis and re-merged.  This is the scaling axis the reference lacks entirely
(SURVEY.md §2.4: OpenMP-only) and the BIGANN-100M configuration of
BASELINE.json.

At-scale construction: per-device tile tables are built and uploaded one
device at a time (jax.device_put per shard + make_array_from_single_device_
arrays) — peak host staging is x_d plus a single device's tables, never the
whole padded corpus (tested: tests/test_parallel.py skewed-memory test).
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..labels.scaler import StandardScaler
from ..engine.block_scan import _dedup_topk_dev, _probe_prepare
from ..engine.serve import SearchResult, _probe, _probe_topm
from ..ops.distance import row_sqnorms
from ..partition.assign import BucketLayout

_BIG = 3e38


def balanced_bucket_split(padded_sizes: np.ndarray, n_dev: int) -> list[np.ndarray]:
    """Greedy balanced assignment of buckets to devices by padded size."""
    order = np.argsort(-padded_sizes, kind="stable")
    loads = np.zeros(n_dev, dtype=np.int64)
    groups: list[list[int]] = [[] for _ in range(n_dev)]
    for b in order:
        d = int(np.argmin(loads))
        groups[d].append(int(b))
        loads[d] += int(padded_sizes[b])
    return [np.array(sorted(g), dtype=np.int64) for g in groups]


def _local_blocked_scan_all(
    q, probed, perm, sel, tb, corpus, bsq, ids,
    *, fetch_k: int, kg: int, k: int, metric: str, axis: str, tile: int,
    chunk: int, sub: int, qb: int,
):
    """Per-device blocked union scan over EVERY query block, one ICI merge,
    on-device dedup — runs inside shard_map as one program per batch.

    q/probed/perm: (B_pad, d) f32 / (B_pad, n_bkt) bool / (B_pad,) i32,
    replicated, caller order (perm sorts queries by top-1 bucket so blocks
    share probed tiles);
    sel: (1, n_blocks, U) local tile ids of this device's per-block
    probed-bucket unions (-1 pad);
    tb:  (1, n_blocks, U) bucket id per union tile (-1 pad);
    corpus/bsq/ids: (1, t_pad, tile, d) / (1, t_pad, tile) local tables.
    Returns (scores (B_pad, k), ids (B_pad, k)) in caller order.
    """
    sel, tb = sel[0], tb[0]
    corpus, bsq, ids = corpus[0], bsq[0], ids[0]
    B, d = q.shape
    n_blocks, U = sel.shape
    q_perm = q[perm].reshape(n_blocks, qb, d)
    probed_p = probed[perm].reshape(n_blocks, qb, -1)
    n_chunks = U // chunk
    kg_eff = min(kg, U)
    k_loc = min(fetch_k, kg_eff * tile)

    def per_block(args):
        qs, pb, sl, tbb = args  # (qb, d), (qb, n_bkt), (U,), (U,)

        # round 1: streamed group-min over the block's local union
        # (never materializes (qb, U·tile))
        def gbody(_, i):
            s = jax.lax.dynamic_slice_in_dim(sl, i * chunk, chunk)
            safe = jnp.maximum(s, 0)
            vec = corpus[safe].reshape(chunk * tile, d)
            sq = bsq[safe].reshape(1, chunk * tile)
            dot = jax.lax.dot_general(
                qs, vec, dimension_numbers=(((1,), (1,)), ((), ())),
                precision="highest", preferred_element_type=jnp.float32,
            )
            scores = sq - dot if metric == "inner_product" else sq - 2.0 * dot
            gmin = scores.reshape(qb, chunk, tile).min(axis=-1)
            return None, gmin + jnp.where(s < 0, _BIG, 0.0)[None, :]

        _, gmins = jax.lax.scan(gbody, None, jnp.arange(n_chunks))
        gmin = jnp.moveaxis(gmins, 0, 1).reshape(qb, U)

        # probed-penalty mask per (query, bucket), expanded to union tiles
        pen_b = jnp.where(pb.T, 0.0, _BIG).astype(jnp.float32)  # (n_bkt, qb)
        pen_b = jnp.concatenate([pen_b, jnp.full((1, qb), _BIG, jnp.float32)], axis=0)
        tbx = jnp.where(tbb >= 0, tbb, pen_b.shape[0] - 1)
        masked = gmin + pen_b[tbx].T

        vals, usel = jax.lax.top_k(-masked, kg_eff)
        gsel = jnp.maximum(sl[usel], 0)  # (qb, kg_eff)
        valid = vals > -(_BIG / 2)

        # round 2: exact rescan of the selected tiles, in query sub-batches
        def rbody(rargs):
            rqs, sg, val = rargs
            vec = corpus[sg]  # (sub, kg, tile, d) tile-granular gather
            dotr = jnp.einsum(
                "stgd,sd->stg", vec, rqs, precision="highest",
                preferred_element_type=jnp.float32,
            )
            sqr = bsq[sg]
            sc = sqr - dotr if metric == "inner_product" else sqr - 2.0 * dotr
            idg = ids[sg]
            sc = sc + jnp.where(val, 0.0, _BIG)[:, :, None]
            sc = jnp.where(idg >= 0, sc, _BIG)
            n = rqs.shape[0]
            neg, pos = jax.lax.top_k(-sc.reshape(n, kg_eff * tile), k_loc)
            oid = jnp.take_along_axis(idg.reshape(n, kg_eff * tile), pos, axis=1)
            return neg, jnp.where(neg > -(_BIG / 2), oid, -1)

        sub_eff = sub if qb % sub == 0 else qb
        n_sub = qb // sub_eff
        neg, oid = jax.lax.map(
            rbody,
            (
                qs.reshape(n_sub, sub_eff, d),
                gsel.reshape(n_sub, sub_eff, kg_eff),
                valid.reshape(n_sub, sub_eff, kg_eff),
            ),
        )
        return neg.reshape(qb, k_loc), oid.reshape(qb, k_loc)

    neg, out_ids = jax.lax.map(per_block, (q_perm, probed_p, sel, tb))
    neg = neg.reshape(B, k_loc)
    out_ids = out_ids.reshape(B, k_loc)
    if k_loc < fetch_k:  # tiny shard: pad so the cross-device merge is uniform
        pad = fetch_k - k_loc
        neg = jnp.concatenate([neg, jnp.full((B, pad), -jnp.inf, jnp.float32)], axis=1)
        out_ids = jnp.concatenate([out_ids, jnp.full((B, pad), -1, jnp.int32)], axis=1)

    # ICI merge: gather every shard's top-fetch_k and re-rank, once per batch
    all_neg = jax.lax.all_gather(neg, axis)  # (n_dev, B, fetch_k)
    all_ids = jax.lax.all_gather(out_ids, axis)
    n_dev = all_neg.shape[0]
    flat_neg = jnp.moveaxis(all_neg, 0, 1).reshape(B, n_dev * fetch_k)
    flat_ids = jnp.moveaxis(all_ids, 0, 1).reshape(B, n_dev * fetch_k)
    best_neg, msel = jax.lax.top_k(flat_neg, fetch_k)
    best_ids = jnp.take_along_axis(flat_ids, msel, axis=1)

    # dedup replicated points to k distinct neighbors, un-permute to caller order
    ded_ids, ded_neg = _dedup_topk_dev(best_ids, best_neg, k)
    out_scores = jnp.zeros_like(ded_neg).at[perm].set(-ded_neg)
    final_ids = jnp.full_like(ded_ids, -1).at[perm].set(ded_ids)
    return out_scores, final_ids


def _pow2ceil(x: int) -> int:
    return 1 << max(0, int(np.ceil(np.log2(max(x, 1)))))


class ShardedQueryEngine:
    """QueryEngine with the bucket corpus sharded across a device mesh."""

    def __init__(
        self,
        x_d: np.ndarray,
        layout: BucketLayout,
        centroids: np.ndarray,
        scaler: StandardScaler,
        params,
        mesh: Mesh,
        metric: str = "L2",
        axis: str = "data",
        n_mul: int = 2,
        probe_cap: int | None = None,
        block_q: int = 1024,
        margin: int = 8,
    ):
        self.mesh = mesh
        self.axis = axis
        self.metric = metric
        self.n_mul = max(1, n_mul)
        self.probe_cap = probe_cap
        self.block_q = block_q
        self.margin = margin
        self.layout = layout
        self.tile = layout.tile
        n_dev = mesh.devices.size
        x_d = np.asarray(x_d, dtype=np.float32)
        dim = x_d.shape[1]

        self.tiles_per_bucket = (layout.padded_sizes // self.tile).astype(np.int64)
        self.sizes = layout.sizes

        # Tile-granular placement: the global concatenated tile sequence
        # (buckets in id order) is sliced into n_dev near-equal contiguous
        # segments.  A giant bucket is spread across devices instead of
        # pinning one device's table shape (and its scan) to the skew —
        # per-device HBM and scan work are balanced to within one tile
        # regardless of the bucket size distribution.
        nt_all = self.tiles_per_bucket
        gstart = np.concatenate([[0], np.cumsum(nt_all)]).astype(np.int64)
        total_tiles = int(gstart[-1])
        bounds = np.round(np.linspace(0, total_tiles, n_dev + 1)).astype(np.int64)
        t_pad = max(int(np.diff(bounds).max()), 1)
        self.t_pad = t_pad

        # per (device, bucket): local start, within-bucket tile offset, count
        lo, hi = bounds[:-1, None], bounds[1:, None]
        ov_lo = np.maximum(lo, gstart[None, :-1])
        ov_hi = np.minimum(hi, gstart[None, 1:])
        cnt = np.maximum(ov_hi - ov_lo, 0)
        self.local_tile_count = cnt
        self.local_tile_start = np.where(cnt > 0, ov_lo - lo, -1)
        self.bucket_tile_off = np.where(cnt > 0, ov_lo - gstart[None, :-1], 0)
        self.tile_bucket = np.full((n_dev, t_pad), -1, np.int32)
        for d in range(n_dev):
            bs = np.nonzero(cnt[d] > 0)[0]
            pos = np.repeat(self.local_tile_start[d, bs], cnt[d, bs])
            within = np.arange(len(pos)) - np.repeat(
                np.cumsum(cnt[d, bs]) - cnt[d, bs], cnt[d, bs]
            )
            self.tile_bucket[d, pos + within] = np.repeat(bs, cnt[d, bs]).astype(np.int32)

        p_off = layout.padded_offsets

        def _device_tables(d: int):
            """One device's (vectors, ids) tile tables — staged host memory
            is a single shard, not the whole corpus."""
            vec = np.zeros((t_pad * self.tile, dim), np.float32)
            idt = np.full(t_pad * self.tile, -1, np.int32)
            for b in np.nonzero(cnt[d] > 0)[0]:
                nt = int(cnt[d, b])
                pos = int(self.local_tile_start[d, b]) * self.tile
                off = int(self.bucket_tile_off[d, b]) * self.tile
                pid = layout.padded_ids[p_off[b] + off : p_off[b] + off + nt * self.tile]
                ok = pid >= 0
                rows = vec[pos : pos + nt * self.tile]
                rows[ok] = x_d[pid[ok]]
                idt[pos : pos + nt * self.tile] = pid
            return vec.reshape(t_pad, self.tile, dim), idt.reshape(t_pad, self.tile)

        shard = NamedSharding(mesh, P(axis))
        devs = list(mesh.devices.flat)
        vec_shards, id_shards, sq_shards = [], [], []
        for d in range(n_dev):
            vec, idt = _device_tables(d)
            if metric == "inner_product":
                sq = np.where(idt >= 0, 0.0, _BIG).astype(np.float32)
            else:
                sq = row_sqnorms(vec.reshape(t_pad * self.tile, dim)).reshape(t_pad, self.tile)
                sq = np.where(idt >= 0, sq, _BIG).astype(np.float32)
            # upload shard-by-shard: host staging never exceeds one device's
            # tables (plus x_d), regardless of corpus size
            vec_shards.append(jax.device_put(vec[None], devs[d]))
            id_shards.append(jax.device_put(idt[None], devs[d]))
            sq_shards.append(jax.device_put(sq[None], devs[d]))
            del vec, idt, sq

        full = (n_dev, t_pad, self.tile, dim)
        self.corpus = jax.make_array_from_single_device_arrays(full, shard, vec_shards)
        self.corpus_ids = jax.make_array_from_single_device_arrays(full[:3], shard, id_shards)
        self.corpus_sq = jax.make_array_from_single_device_arrays(full[:3], shard, sq_shards)

        self.centroids = jnp.asarray(centroids, dtype=jnp.float32)
        self.scaler_mean = jnp.asarray(scaler.mean_)
        self.scaler_scale = jnp.asarray(scaler.scale_)
        self.params = params

        self._scan_cache: dict[tuple, object] = {}

    # ---------- probing ----------

    def probe(self, queries: np.ndarray) -> np.ndarray:
        return np.asarray(
            _probe(self.params, self.centroids, self.scaler_mean, self.scaler_scale,
                   jnp.asarray(queries, jnp.float32))
        )

    def select_buckets(self, outputs: np.ndarray, threshold: float) -> np.ndarray:
        probed = outputs >= threshold
        empty = ~probed.any(axis=1)
        if empty.any():
            probed[empty, outputs[empty].argmax(axis=1)] = True
        return probed

    def _select_probed(self, q, threshold: float):
        """((B, n_bkt) probed, (B,) top-1 bucket) — dense or probe_cap path
        (QueryEngine._select_probed semantics)."""
        if self.probe_cap is None:
            outputs = np.asarray(
                _probe(self.params, self.centroids, self.scaler_mean, self.scaler_scale, q)
            )
            return self.select_buckets(outputs, threshold), outputs.argmax(axis=1)
        m = min(self.probe_cap, self.layout.n_bkt)
        vals, idx = _probe_topm(
            self.params, self.centroids, self.scaler_mean, self.scaler_scale, q, m
        )
        vals, idx = np.asarray(vals), np.asarray(idx)
        valid = vals >= threshold
        valid[:, 0] = True
        B = len(vals)
        probed = np.zeros((B, self.layout.n_bkt), dtype=bool)
        rows = np.repeat(np.arange(B), valid.sum(axis=1))
        probed[rows, idx[valid]] = True
        return probed, idx[:, 0]

    # ---------- scan ----------

    def _scan_fn(self, fetch_k: int, kg: int, k: int, U: int, chunk: int, qb: int):
        key = (fetch_k, kg, k, U, chunk, qb)
        if key not in self._scan_cache:
            fn = jax.shard_map(
                partial(
                    _local_blocked_scan_all, fetch_k=fetch_k, kg=kg, k=k,
                    metric=self.metric, axis=self.axis, tile=self.tile,
                    chunk=chunk, sub=64, qb=qb,
                ),
                mesh=self.mesh,
                in_specs=(P(), P(), P(), P(self.axis), P(self.axis), P(self.axis),
                          P(self.axis), P(self.axis)),
                out_specs=(P(), P()),
                check_vma=False,
            )
            self._scan_cache[key] = jax.jit(fn)
        return self._scan_cache[key]

    def _block_unions(self, union_mask: np.ndarray):
        """Per-(device, block) local union tile lists + bucket maps.

        union_mask: (n_blocks, n_bkt) bool — per-block probed-bucket unions.
        Returns (sel (n_dev, n_blocks, U) i32, tb same, U, chunk); U is the
        pow2 ceiling of the largest (device, block) union so the compile
        count stays logarithmic in batch mix."""
        n_dev = self.mesh.devices.size
        n_blocks = union_mask.shape[0]
        per = {}
        u_max = 1
        for d in range(n_dev):
            owned = self.local_tile_count[d] > 0
            for i in range(n_blocks):
                bs = np.nonzero(union_mask[i] & owned)[0]
                reps = self.local_tile_count[d, bs]
                total = int(reps.sum())
                if total == 0:
                    per[d, i] = np.zeros(0, np.int32)
                    continue
                starts = np.repeat(self.local_tile_start[d, bs], reps)
                cum = np.cumsum(reps) - reps
                within = np.arange(total, dtype=np.int64) - np.repeat(cum, reps)
                per[d, i] = (starts + within).astype(np.int32)
                u_max = max(u_max, total)
        chunk = min(16, _pow2ceil(u_max))
        U = max(chunk, ((u_max + chunk - 1) // chunk) * chunk)
        U = _pow2ceil(U) if U > chunk else U
        sel = np.full((n_dev, n_blocks, U), -1, np.int32)
        tb = np.full((n_dev, n_blocks, U), -1, np.int32)
        for (d, i), t in per.items():
            sel[d, i, : len(t)] = t
            tb[d, i, : len(t)] = self.tile_bucket[d, t]
        return sel, tb, U, chunk

    def search(self, queries: np.ndarray, threshold: float, k: int) -> SearchResult:
        """One probe program → host unions → ONE scan program for the whole
        batch (single-chip block_scan architecture: 2 device round trips)."""
        t0 = time.perf_counter()
        queries = np.asarray(queries, np.float32)
        B, d = queries.shape
        n_bkt = self.layout.n_bkt
        qb = max(8, min(self.block_q, _pow2ceil(B)))
        B_pad = -(-B // qb) * qb
        q_pad = np.zeros((B_pad, d), np.float32)
        q_pad[:B] = queries
        q_dev = jnp.asarray(q_pad)

        m = min(self.probe_cap or n_bkt, n_bkt)
        probed, perm, union, nprobe_d, ndis_d = _probe_prepare(
            self.params, self.centroids, self.scaler_mean, self.scaler_scale,
            q_dev, jnp.asarray(self.sizes, jnp.int32), jnp.int32(B),
            jnp.float32(threshold), m, qb,
        )
        union = np.asarray(union)  # (n_blocks, n_bkt) — tens of KB
        nprobe = np.asarray(nprobe_d[:B])
        ndis = np.asarray(ndis_d[:B])

        sel, tb, U, chunk = self._block_unions(union)
        fetch_k = k * self.n_mul
        kg = fetch_k + self.margin
        shard = NamedSharding(self.mesh, P(self.axis))
        fn = self._scan_fn(fetch_k, kg, k, U, chunk, qb)
        sc, ids = fn(
            q_dev, probed, perm,
            jax.device_put(jnp.asarray(sel), shard),
            jax.device_put(jnp.asarray(tb), shard),
            self.corpus, self.corpus_sq, self.corpus_ids,
        )
        ids = np.asarray(ids[:B])
        scores = np.asarray(sc[:B])
        elapsed = time.perf_counter() - t0
        return SearchResult(
            ids=ids,
            scores=scores,
            nprobe=nprobe.astype(np.int64),
            ndis=ndis.astype(np.int64),
            elapsed=elapsed,
        )

    def recall_against(self, result_ids: np.ndarray, gt_ids: np.ndarray, k: int) -> np.ndarray:
        hits = (result_ids[:, :, None] == gt_ids[:, None, :k]).any(axis=1)
        return hits.sum(axis=1) / float(k)

    def sweep(self, queries, gt_ids, k, thresholds, warmup: bool = True) -> list[dict]:
        """Measured end-to-end threshold sweep (QueryEngine.sweep parity)."""
        n_q = len(queries)
        if warmup:
            self.search(queries[: min(64, n_q)], float(thresholds[0]), k)
        rows = []
        for thr in thresholds:
            res = self.search(queries, float(thr), k)
            recall = self.recall_against(res.ids, gt_ids, k)
            rows.append(
                {
                    "threshold": float(thr),
                    "avg_recall": float(recall.mean()),
                    "avg_nprobe": float(res.nprobe.mean()),
                    "avg_cmp": float(res.ndis.mean()),
                    "avg_time": res.elapsed / n_q,
                    "qps": n_q / res.elapsed,
                }
            )
        return rows
