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
from ..engine.block_scan import (
    S_TILES,
    _dedup_topk_dev,
    _prepare_from_mask,
    _probe_prepare,
    _screen_qb_cap,
    _screen_rescore,
)
from ..engine.serve import SearchResult, _probe
from ..ops.distance import row_sqnorms
from ..partition.assign import BucketLayout

_BIG = 3e38


def _ici_merge(neg, out_ids, k_loc, fetch_k, k, axis, perm):
    """Pad per-device candidates to fetch_k, all_gather every shard's top-k
    over the mesh axis, re-rank, dedup to k distinct neighbors, un-permute."""
    B = neg.shape[0]
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


def _local_blocked_scan_pallas(
    q, probed, perm, supers, tb, ulen, corpus, bsq, corpus_f32, ids, tpc,
    dim_scale,
    *, fetch_k: int, kg: int, k: int, metric: str, axis: str,
    qb: int, precision: str, interpret: bool, sub: int, sel_rows: int = 128,
):
    """Per-device blocked union scan using the single-chip Pallas group-min
    screen (block_scan._screen_rescore: scalar-prefetched supertile DMA +
    transposed MXU dot + exact f32 rescore), one ICI merge, on-device dedup.

    q/probed/perm: (B_pad, d) f32 / (B_pad, n_bkt) bool / (B_pad,) i32,
    replicated;
    supers: (1, n_blocks, U) LOCAL supertile ids of this device's per-block
    unions (pad slots repeat the last real supertile, masked via tb);
    tb: (1, n_blocks, U*S) bucket per local union tile (-1 pad);
    ulen: (1, n_blocks) i32 true union supertiles per (device, block) —
    the shared kernel skips pad slots (block_scan._union_groupmin_kernel);
    corpus/corpus_f32: (1, t_pad, 128, d) local tile tables (round-1 dtype /
    f32), t_pad a multiple of S; bsq/ids: (1, t_pad, 128);
    tpc: (1, t_pad) i32 per-tile pad-row counts (all-pad selection-group
    masking, see block_scan._screen_rescore);
    dim_scale: (d,) f32 replicated — per-dim int8 quantization scale of the
    round-1 corpus (all-ones and unused unless corpus is int8).
    Returns (scores (B_pad, k), ids (B_pad, k)) in caller order."""
    supers, tb, ulen = supers[0], tb[0], ulen[0]
    B, d = q.shape
    corpus = corpus[0].reshape(-1, d)  # (t_pad*128, d) flat, supertile-aligned
    # corpus_f32 None = same buffer as corpus (f32 / capacity modes): the
    # shared table must enter the shard_map program ONCE or the compile-time
    # HBM bound counts it twice per device (single-chip analog:
    # block_scan.BlockScanState.rescore_arg)
    corpus_f32 = None if corpus_f32 is None else corpus_f32[0].reshape(-1, d)
    bsq, ids = bsq[0], ids[0]  # (t_pad, 128) == (n_super*S, 128)
    n_blocks = supers.shape[0]
    q_perm = q[perm]
    probed_p = probed[perm].reshape(n_blocks, qb, -1)
    neg, oid, k_loc = _screen_rescore(
        q_perm, probed_p, supers, tb, ulen, corpus, bsq, corpus_f32, ids, tpc[0],
        metric=metric, kg=kg, fetch_k=fetch_k, qb=qb, precision=precision,
        interpret=interpret, sub=sub, sel_rows=sel_rows, dim_scale=dim_scale,
    )
    return _ici_merge(neg, oid, k_loc, fetch_k, k, axis, perm)


def _local_blocked_scan_all(
    q, probed, perm, sel, tb, corpus_r1, corpus, bsq, ids,
    *, fetch_k: int, kg: int, k: int, metric: str, axis: str, tile: int,
    chunk: int, sub: int, qb: int, precision: str,
):
    """Per-device blocked union scan over EVERY query block, one ICI merge,
    on-device dedup — runs inside shard_map as one program per batch.

    The XLA-gather fallback for layouts whose tile != 128 (the Pallas path
    above needs 128-lane tiles); same two-round structure: round-1 group-min
    screen on `corpus_r1` (f32 or bf16) + exact f32 rescore on `corpus`.

    q/probed/perm: (B_pad, d) f32 / (B_pad, n_bkt) bool / (B_pad,) i32,
    replicated, caller order (perm sorts queries by top-1 bucket so blocks
    share probed tiles);
    sel: (1, n_blocks, U) local tile ids of this device's per-block
    probed-bucket unions (-1 pad);
    tb:  (1, n_blocks, U) bucket id per union tile (-1 pad);
    corpus_r1/corpus/bsq/ids: (1, t_pad, tile, d) ×2 / (1, t_pad, tile).
    Returns (scores (B_pad, k), ids (B_pad, k)) in caller order.
    """
    sel, tb = sel[0], tb[0]
    corpus_r1, corpus, bsq, ids = corpus_r1[0], corpus[0], bsq[0], ids[0]
    B, d = q.shape
    n_blocks, U = sel.shape
    q_perm = q[perm].reshape(n_blocks, qb, d)
    q_r1 = q_perm.astype(corpus_r1.dtype)
    probed_p = probed[perm].reshape(n_blocks, qb, -1)
    n_chunks = U // chunk
    kg_eff = min(kg, U)
    k_loc = min(fetch_k, kg_eff * tile)

    def per_block(args):
        qs, qs1, pb, sl, tbb = args  # (qb, d), (qb, d), (qb, n_bkt), (U,), (U,)

        # round 1: streamed group-min over the block's local union
        # (never materializes (qb, U·tile))
        def gbody(_, i):
            s = jax.lax.dynamic_slice_in_dim(sl, i * chunk, chunk)
            safe = jnp.maximum(s, 0)
            vec = corpus_r1[safe].reshape(chunk * tile, d)
            sq = bsq[safe].reshape(1, chunk * tile)
            dot = jax.lax.dot_general(
                qs1, vec, dimension_numbers=(((1,), (1,)), ((), ())),
                precision=precision, preferred_element_type=jnp.float32,
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

        # largest divisor of qb within the gather budget (falling back to
        # the whole block would defeat the 256 MB bound, block_scan.py)
        sub_eff = next(s for s in range(min(sub, qb), 0, -1) if qb % s == 0)
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

    neg, out_ids = jax.lax.map(per_block, (q_perm, q_r1, probed_p, sel, tb))
    neg = neg.reshape(B, k_loc)
    out_ids = out_ids.reshape(B, k_loc)
    return _ici_merge(neg, out_ids, k_loc, fetch_k, k, axis, perm)


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
        margin: int | None = None,
        scan_dtype: str = "float32",
        prober=None,
        local_impl: str = "auto",
        interpret: bool | None = None,
        sel_rows: int | None = None,  # round-2 selection granularity (Pallas
        # path; None → single-chip measured optimum: 32 bf16 / 64 f32)
        store_f32: bool = True,  # False (bf16 or int8) = CAPACITY mode:
        # one approximate table per shard serves both rounds (bf16 0.5× /
        # int8 0.25× the corpus across the mesh); exact order restored by a
        # host f32 re-rank after the ICI merge (QueryEngine's store_f32
        # contract; int8 dequantizes round 2 via the global per-dim scale
        # folded into the query)
    ):
        """`scan_dtype='bfloat16'` screens round 1 in bf16 (margin absorbs the
        rounding, round 2 rescans in exact f32 — single-chip block_scan
        semantics); `prober(q)->(B, n_bkt)` replaces the probing MLP (e.g. the
        IVF centroid-rank baseline); `local_impl` picks the per-device scan:
        'pallas' (the single-chip scalar-prefetch supertile kernel, requires
        tile=128), 'gather' (XLA dynamic-slice form, any tile), or 'auto'."""
        self.mesh = mesh
        self.axis = axis
        self.metric = metric
        self.n_mul = max(1, n_mul)
        self.probe_cap = probe_cap
        self.block_q = block_q
        self.layout = layout
        self.tile = layout.tile
        self.scan_dtype = {
            "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16, "int8": jnp.int8,
        }.get(str(scan_dtype), jnp.float32)
        if sel_rows is None:
            sel_rows = 64 if self.scan_dtype == jnp.float32 else 32
        if not (0 < sel_rows <= 128 and 128 % sel_rows == 0):
            raise ValueError(f"sel_rows={sel_rows}: must be a divisor of 128")
        self.sel_rows = sel_rows
        if not store_f32 and self.scan_dtype not in (jnp.bfloat16, jnp.int8):
            raise ValueError(
                "store_f32=False (capacity mode) requires scan_dtype="
                "'bfloat16' or 'int8' — the approximate table is the only "
                "corpus copy"
            )
        self.store_f32 = store_f32
        # capacity over-fetch slack for the post-merge host re-rank: 16
        # absorbs bf16 rank jitter; int8 quantization error is coarser
        self.capacity_slack = 32 if self.scan_dtype == jnp.int8 else 16
        self.prober = prober
        if local_impl == "auto":
            # pallas only where it runs compiled: off-TPU the interpreter is
            # orders of magnitude slower than the XLA gather form (same rule
            # as QueryEngine's scan_impl='auto')
            on_tpu = jax.default_backend() == "tpu" if interpret is None else not interpret
            local_impl = "pallas" if (layout.tile == 128 and on_tpu) else "gather"
        if local_impl == "pallas" and layout.tile != 128:
            raise ValueError("local_impl='pallas' needs a 128-row tile layout")
        if self.scan_dtype == jnp.int8 and local_impl != "pallas":
            raise ValueError(
                "scan_dtype='int8' needs local_impl='pallas' (the gather "
                "fallback casts queries to the round-1 dtype, which is "
                "meaningless for a quantized corpus)"
            )
        self.local_impl = local_impl
        if margin is None:
            # blocked_search margin semantics: counted in selection groups, so
            # the bf16/int8 defaults scale with granularity to keep row
            # coverage constant (the gather path selects whole tiles —
            # sel_rows only shrinks groups on the Pallas path)
            # measured defaults (block_scan._resolve_margin's rationale):
            # bf16 = 4 tiles of coverage (worst measured zero-miss point of
            # either path), int8 = 8 tiles (2x its 4-tile zero-miss)
            if self.scan_dtype == jnp.bfloat16 and local_impl == "pallas":
                margin = 4 * (128 // sel_rows)
            elif self.scan_dtype == jnp.int8:
                margin = 8 * (128 // sel_rows)
            else:
                margin = 8
        self.margin = margin
        self.interpret = (jax.default_backend() != "tpu") if interpret is None else interpret
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
        # supertile-align the per-device table so the Pallas path can stream
        # S_TILES-tile supertiles exactly like the single-chip engine
        t_pad = -(-t_pad // S_TILES) * S_TILES
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
            # pad rows copy the bucket's last real row (a tile is never
            # split across devices, so the source is always in this shard) —
            # the Pallas screen computes row norms in-kernel and has no
            # per-row penalty operand (block_scan._union_groupmin_kernel)
            real = idt >= 0
            last_real = np.maximum.accumulate(
                np.where(real, np.arange(len(idt), dtype=np.int64), -1)
            )
            pad = ~real & (last_real >= 0)
            vec[pad] = vec[last_real[pad]]
            return vec.reshape(t_pad, self.tile, dim), idt.reshape(t_pad, self.tile)

        shard = NamedSharding(mesh, P(axis))
        devs = list(mesh.devices.flat)
        cap_int8 = not store_f32 and self.scan_dtype == jnp.int8
        if cap_int8:
            # int8 capacity: ONE GLOBAL per-dim scale (host O(n·d) pass) so
            # every shard's dequantized round-2 scores are commensurable at
            # the ICI merge; shards are quantized on HOST and uploaded as
            # int8 (¼ the upload bytes, 0.25× per-shard HBM throughout)
            cap_scale = (
                np.maximum(np.abs(x_d).max(axis=0), 1e-30) / 127.0
            ).astype(np.float32)
        vec_shards, id_shards, sq_shards, tpc_shards = [], [], [], []
        for d in range(n_dev):
            vec, idt = _device_tables(d)
            tpc_shards.append(
                jax.device_put(
                    (idt < 0).sum(axis=1).astype(np.int32)[None], devs[d]
                )
            )
            if metric == "inner_product":
                sq = np.where(idt >= 0, 0.0, _BIG).astype(np.float32)
            else:
                sq = row_sqnorms(vec.reshape(t_pad * self.tile, dim)).reshape(t_pad, self.tile)
                sq = np.where(idt >= 0, sq, _BIG).astype(np.float32)
            # upload shard-by-shard: host staging never exceeds one device's
            # tables (plus x_d), regardless of corpus size.  Capacity mode
            # uploads bf16 directly: per-shard device HBM never exceeds 0.5×
            # the shard's f32 bytes — and the norms above are already exact
            # (computed from the f32 host table before the cast)
            if cap_int8:
                vec = np.clip(np.round(vec / cap_scale), -127, 127).astype(np.int8)
            elif not store_f32:
                vec = vec.astype(jnp.bfloat16)
            vec_shards.append(jax.device_put(vec[None], devs[d]))
            id_shards.append(jax.device_put(idt[None], devs[d]))
            sq_shards.append(jax.device_put(sq[None], devs[d]))
            del vec, idt, sq

        full = (n_dev, t_pad, self.tile, dim)
        self.corpus = jax.make_array_from_single_device_arrays(full, shard, vec_shards)
        self.corpus_ids = jax.make_array_from_single_device_arrays(full[:3], shard, id_shards)
        self.corpus_sq = jax.make_array_from_single_device_arrays(full[:3], shard, sq_shards)
        self.tile_pads = jax.make_array_from_single_device_arrays(
            full[:2], shard, tpc_shards
        )
        if not store_f32:
            self.corpus_r1 = self.corpus  # one bf16/int8 table for both rounds
            self.dim_scale = (
                jnp.asarray(cap_scale) if cap_int8 else jnp.ones((dim,), jnp.float32)
            )
            self._x_d = x_d  # host reference for the exact final re-rank
        elif self.scan_dtype == jnp.bfloat16:
            # round-1 bf16 view cast on device (no second corpus upload);
            # HBM cost 1.5× the corpus per shard, as in the single-chip engine
            self.corpus_r1 = jax.jit(
                lambda x: x.astype(jnp.bfloat16), out_shardings=shard
            )(self.corpus)
            self.dim_scale = jnp.ones((dim,), jnp.float32)
        elif self.scan_dtype == jnp.int8:
            # symmetric per-dim int8 quantization with ONE GLOBAL scale
            # (computed from the raw corpus on host, O(n·d) pass) so every
            # shard's integer scores are commensurable before the ICI merge;
            # round-1 HBM cost 0.25× the corpus per shard, round 2 f32-exact
            # zero-corpus dims get a TINY scale (not 1.0): q'_d = q_d·s_d then
            # collapses to ~0, so a dim the corpus never uses cannot inflate
            # the query's batch quantization scale t (single-chip formulation,
            # block_scan.BlockScanState._finish)
            amax = np.abs(x_d).max(axis=0)
            self.dim_scale = jnp.asarray(
                (np.maximum(amax, 1e-30) / 127.0).astype(np.float32)
            )
            s = self.dim_scale
            self.corpus_r1 = jax.jit(
                lambda x: jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8),
                out_shardings=shard,
            )(self.corpus)
        else:
            self.corpus_r1 = self.corpus
            self.dim_scale = jnp.ones((dim,), jnp.float32)

        self.centroids = jnp.asarray(centroids, dtype=jnp.float32)
        self.scaler_mean = jnp.asarray(scaler.mean_)
        self.scaler_scale = jnp.asarray(scaler.scale_)
        self.params = params
        # locality relabeling for the query-grouping sort (partition/order.py):
        # same contract as the single-chip engine — grouping strategy only,
        # per-query results/ndis are rank-invariant
        from ..partition.order import centroid_tour_rank

        self.bucket_rank = centroid_tour_rank(np.asarray(centroids, np.float32))
        self._rank_dev = jnp.asarray(self.bucket_rank, jnp.int32)

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

    # ---------- scan ----------

    def _scan_fn(self, fetch_k: int, kg: int, k: int, U: int, chunk: int, qb: int):
        key = (self.local_impl, fetch_k, kg, k, U, chunk, qb, self.sel_rows)
        if key not in self._scan_cache:
            precision = "default" if self.scan_dtype == jnp.bfloat16 else "highest"
            # bound the round-2 gather staging (sub, kg, tile, d) to ~256 MB
            # per device — at the reference's k=100 default kg is 208 tiles
            dim = self.corpus.shape[-1]
            budget = (256 << 20) // max(kg * self.tile * dim * 4, 1)
            sub = 64
            while sub > 8 and sub > budget:
                sub //= 2
            sub = min(sub, qb)
            if self.local_impl == "pallas":
                body = partial(
                    _local_blocked_scan_pallas, fetch_k=fetch_k, kg=kg, k=k,
                    metric=self.metric, axis=self.axis, qb=qb,
                    precision=precision, interpret=self.interpret, sub=sub,
                    sel_rows=self.sel_rows,
                )
                if self.corpus_r1 is self.corpus:
                    # shared screen/rescore table (f32 / capacity): ONE
                    # program parameter — see _local_blocked_scan_pallas
                    inner = body
                    body = (lambda q, p, pm, su, tb, ul, c, sq, ids, tpc, ds,
                            _inner=inner:
                            _inner(q, p, pm, su, tb, ul, c, sq, None, ids, tpc,
                                   ds))
                    in_specs = (P(), P(), P(), P(self.axis), P(self.axis),
                                P(self.axis),  # ulen
                                P(self.axis), P(self.axis), P(self.axis),
                                P(self.axis),  # tile_pads
                                P())  # dim_scale
                else:
                    in_specs = (P(), P(), P(), P(self.axis), P(self.axis),
                                P(self.axis),  # ulen
                                P(self.axis), P(self.axis), P(self.axis),
                                P(self.axis), P(self.axis),  # tile_pads
                                P())  # trailing P(): dim_scale
            else:
                body = partial(
                    _local_blocked_scan_all, fetch_k=fetch_k, kg=kg, k=k,
                    metric=self.metric, axis=self.axis, tile=self.tile,
                    chunk=chunk, sub=sub, qb=qb, precision=precision,
                )
                in_specs = (P(), P(), P(), P(self.axis), P(self.axis),
                            P(self.axis), P(self.axis), P(self.axis),
                            P(self.axis))
            fn = jax.shard_map(
                body,
                mesh=self.mesh,
                in_specs=in_specs,
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
        count stays logarithmic in batch mix.

        Fully vectorized per device (repeat/cumsum — the formulation of
        engine/block_scan.build_block_unions): host work is O(total union
        tiles), not O(n_dev·n_blocks) Python iterations."""
        n_dev = self.mesh.devices.size
        n_blocks = union_mask.shape[0]
        # per-(block, device) union tile totals in one matmul
        counts = union_mask.astype(np.int64) @ self.local_tile_count.T
        u_max = max(1, int(counts.max()))
        chunk = min(16, _pow2ceil(u_max))
        U = max(chunk, ((u_max + chunk - 1) // chunk) * chunk)
        U = _pow2ceil(U) if U > chunk else U
        sel = np.full((n_dev, n_blocks, U), -1, np.int32)
        tb = np.full((n_dev, n_blocks, U), -1, np.int32)
        for d in range(n_dev):
            owned = self.local_tile_count[d] > 0
            rows, bs = np.nonzero(union_mask & owned[None, :])
            reps = self.local_tile_count[d, bs]
            total = int(reps.sum())
            if total == 0:
                continue
            starts = np.repeat(self.local_tile_start[d, bs], reps)
            cum = np.cumsum(reps) - reps
            within = np.arange(total, dtype=np.int64) - np.repeat(cum, reps)
            tiles = (starts + within).astype(np.int32)
            tile_rows = np.repeat(rows, reps)
            row_counts = np.bincount(tile_rows, minlength=n_blocks)
            row_start = np.cumsum(row_counts) - row_counts
            col = np.arange(total, dtype=np.int64) - row_start[tile_rows]
            sel[d, tile_rows, col] = tiles
            tb[d, tile_rows, col] = self.tile_bucket[d, tiles]
        return sel, tb, U, chunk

    def _super_unions(self, sel: np.ndarray):
        """Tile-granular union lists → per-(device, block) LOCAL supertile
        lists + per-tile bucket maps for the Pallas path (single-chip
        build_block_unions contract, per device).

        Returns (supers (n_dev, n_blocks, U_s) i32 — pad slots repeat the
        row's last real supertile (input-DMA elision in the shared kernel),
        tb (n_dev, n_blocks, U_s*S) i32 −1-padded,
        ulen (n_dev, n_blocks) i32 true union lengths — the kernel skips
        slots past them).  Vectorized via a composite-key unique over all
        (device, block, supertile) triples."""
        n_dev, n_blocks, _ = sel.shape
        n_sup = self.t_pad // S_TILES
        dmask = sel >= 0
        d_idx, r_idx, _ = np.nonzero(dmask)
        comp = (d_idx.astype(np.int64) * n_blocks + r_idx) * n_sup + sel[dmask] // S_TILES
        ucomp = np.unique(comp)
        urow = ucomp // n_sup  # d * n_blocks + block
        usup = (ucomp % n_sup).astype(np.int32)
        row_counts = np.bincount(urow, minlength=n_dev * n_blocks)
        U_s = max(1, _pow2ceil(int(row_counts.max()) if len(ucomp) else 1))
        row_start = np.cumsum(row_counts) - row_counts
        col = np.arange(len(ucomp), dtype=np.int64) - row_start[urow]
        supers = np.zeros((n_dev * n_blocks, U_s), np.int32)
        supers[urow, col] = usup
        # pad slots repeat the row's last real supertile (rows with an empty
        # union keep 0 — their ulen of 0 skips every slot anyway)
        nz = row_counts > 0
        last = np.zeros(n_dev * n_blocks, np.int32)
        last[nz] = supers[nz, row_counts[nz] - 1]
        pad_mask = np.arange(U_s)[None, :] >= row_counts[:, None]
        supers = np.where(pad_mask & nz[:, None], last[:, None], supers)
        tb = np.full((n_dev * n_blocks, U_s * S_TILES), -1, np.int32)
        ud = (urow // n_blocks).astype(np.int64)
        for j in range(S_TILES):
            tb[urow, col * S_TILES + j] = self.tile_bucket[ud, usup * S_TILES + j]
        return (supers.reshape(n_dev, n_blocks, U_s),
                tb.reshape(n_dev, n_blocks, U_s * S_TILES),
                row_counts.astype(np.int32).reshape(n_dev, n_blocks))

    def _dispatch_probe(self, queries: np.ndarray, threshold: float) -> dict:
        """Upload one batch + launch its probe program (async where the MLP
        probes; the pluggable prober computes on host)."""
        B, d = queries.shape
        n_bkt = self.layout.n_bkt
        qb = max(8, min(self.block_q, _pow2ceil(B)))
        if self.local_impl == "pallas":
            # same scoped-VMEM guard as the single-chip _probe_batch: at wide
            # dims (e.g. d=960 bf16) qb=1024 overflows the screen kernel's
            # VMEM budget; cap the union block so the sharded screen compiles
            qb = min(qb, _screen_qb_cap(d, self.scan_dtype))
        B_pad = -(-B // qb) * qb
        q_pad = np.zeros((B_pad, d), np.float32)
        q_pad[:B] = queries
        q_dev = jnp.asarray(q_pad)

        if self.prober is not None:
            # pluggable prober (e.g. IVF centroid rank): host outputs →
            # select with the engine's threshold + argmax-fallback semantics
            outputs = np.asarray(self.prober(queries))
            probed_h = self.select_buckets(outputs, threshold)
            if B_pad > B:
                probed_h = np.concatenate(
                    [probed_h, np.zeros((B_pad - B, n_bkt), bool)], axis=0
                )
            top1 = np.concatenate(
                [outputs.argmax(axis=1), np.full(B_pad - B, n_bkt)]
            )
            probed = jnp.asarray(probed_h)
            perm, union = _prepare_from_mask(probed, jnp.asarray(top1, jnp.int32), qb,
                                             self._rank_dev)
            nprobe = probed_h[:B].sum(axis=1)
            ndis = probed_h[:B] @ self.sizes.astype(np.int64)
        else:
            m = min(self.probe_cap or n_bkt, n_bkt)
            probed, perm, union, nprobe, ndis = _probe_prepare(
                self.params, self.centroids, self.scaler_mean, self.scaler_scale,
                q_dev, jnp.asarray(self.sizes, jnp.int32), jnp.int32(B),
                jnp.float32(threshold), m, qb, self._rank_dev,
            )
        return dict(q=q_dev, probed=probed, perm=perm, union=union,
                    nprobe=nprobe, ndis=ndis, B=B, qb=qb)

    def _dispatch_scan(self, h: dict, k: int):
        """Host union build + launch the sharded scan program (async).
        Blocks only on the (tiny) union mask transfer."""
        union = np.asarray(h["union"])  # (n_blocks, n_bkt) — tens of KB
        sel, tb, U, chunk = self._block_unions(union)
        fetch_k = k * self.n_mul
        # capacity mode keeps extra distinct candidates through the ICI
        # merge; exact order is restored on host (QueryEngine's +16 rule)
        k_out = k if self.store_f32 else fetch_k + self.capacity_slack
        fetch_k = max(fetch_k, k_out)
        kg = fetch_k + self.margin
        shard = NamedSharding(self.mesh, P(self.axis))
        if self.local_impl == "pallas":
            supers, tb_s, ulen = self._super_unions(sel)
            fn = self._scan_fn(fetch_k, kg, k_out, supers.shape[2], chunk, h["qb"])
            tables = (
                (self.corpus_r1, self.corpus_sq)  # shared screen/rescore table
                if self.corpus_r1 is self.corpus
                else (self.corpus_r1, self.corpus_sq, self.corpus)
            )
            return fn(
                h["q"], h["probed"], h["perm"],
                jax.device_put(jnp.asarray(supers), shard),
                jax.device_put(jnp.asarray(tb_s), shard),
                jax.device_put(jnp.asarray(ulen), shard),
                *tables, self.corpus_ids, self.tile_pads, self.dim_scale,
            )
        fn = self._scan_fn(fetch_k, kg, k_out, U, chunk, h["qb"])
        return fn(
            h["q"], h["probed"], h["perm"],
            jax.device_put(jnp.asarray(sel), shard),
            jax.device_put(jnp.asarray(tb), shard),
            self.corpus_r1, self.corpus, self.corpus_sq, self.corpus_ids,
        )

    @staticmethod
    def _collect(h: dict, scan_out) -> tuple:
        sc, ids = scan_out
        B = h["B"]
        # full-array fetch + host slice: the async D2H started at dispatch
        # covers these buffers; a device-side [:B] slice would be a fresh
        # buffer whose transfer couldn't start until here
        return (
            np.asarray(sc)[:B],
            np.asarray(ids)[:B],
            np.asarray(h["nprobe"])[:B].astype(np.int64),
            np.asarray(h["ndis"])[:B].astype(np.int64),
        )

    def search(self, queries: np.ndarray, threshold: float, k: int) -> SearchResult:
        """One probe program → host unions → ONE scan program for the whole
        batch (single-chip block_scan architecture: 2 device round trips)."""
        t0 = time.perf_counter()
        queries = np.asarray(queries, np.float32)
        if len(queries) == 0:
            return self._empty_result(k, t0)
        h = self._dispatch_probe(queries, threshold)
        scores, ids, nprobe, ndis = self._collect(h, self._dispatch_scan(h, k))
        if not self.store_f32:
            ids, scores = self._rerank_capacity(queries, ids, k)
        return SearchResult(
            ids=ids, scores=scores, nprobe=nprobe, ndis=ndis,
            elapsed=time.perf_counter() - t0,
        )

    def _rerank_capacity(self, queries: np.ndarray, ids: np.ndarray, k: int):
        """Capacity mode: exact f32 host re-rank of the over-fetched distinct
        candidates, truncated to k (QueryEngine's store_f32=False contract)."""
        from ..engine.serve import rerank_exact_host

        ids, scores = rerank_exact_host(self._x_d, self.metric, queries, ids)
        return ids[:, :k], scores[:, :k]

    def search_stream(
        self, queries: np.ndarray, threshold: float, k: int,
        batch_size: int = 65536,
    ) -> SearchResult:
        """Pipelined multi-batch search (QueryEngine.search_stream parity):
        batch i+1's probe program is dispatched before batch i's unions are
        fetched, hiding the per-batch host round trips + union build behind
        device work.  Results are bit-identical to per-batch `search`.

        As in block_scan.blocked_search_stream, the next batch's probe
        (including its host-blocking query H2D on a tunneled rig) runs on a
        single worker thread so the upload overlaps the current batch's
        union wait + scan instead of serializing with them."""
        from concurrent.futures import ThreadPoolExecutor

        t0 = time.perf_counter()
        queries = np.asarray(queries, np.float32)
        if len(queries) == 0:
            return self._empty_result(k, t0)
        starts = list(range(0, len(queries), batch_size))
        outs = []
        prev = None
        pool = ThreadPoolExecutor(max_workers=1)
        try:
            fut_cur = pool.submit(
                self._dispatch_probe,
                queries[starts[0] : starts[0] + batch_size], threshold,
            )
            for i in range(len(starts)):
                fut_next = (
                    pool.submit(
                        self._dispatch_probe,
                        queries[starts[i + 1] : starts[i + 1] + batch_size],
                        threshold,
                    )
                    if i + 1 < len(starts) else None
                )
                h_cur = fut_cur.result()
                scan_out = self._dispatch_scan(h_cur, k)
                for a in scan_out:  # start the result D2H under the next
                    a.copy_to_host_async()  # batch's device work
                if prev is not None:
                    outs.append(self._collect(*prev))
                prev = (h_cur, scan_out)
                fut_cur = fut_next
            outs.append(self._collect(*prev))
        finally:
            pool.shutdown(wait=True)
        ids = np.concatenate([o[1] for o in outs])
        scores = np.concatenate([o[0] for o in outs])
        if not self.store_f32:
            ids, scores = self._rerank_capacity(queries, ids, k)
        return SearchResult(
            ids=ids,
            scores=scores,
            nprobe=np.concatenate([o[2] for o in outs]),
            ndis=np.concatenate([o[3] for o in outs]),
            elapsed=time.perf_counter() - t0,
        )

    def _empty_result(self, k: int, t0: float) -> SearchResult:
        return SearchResult(
            ids=np.empty((0, k), np.int32), scores=np.empty((0, k), np.float32),
            nprobe=np.empty(0, np.int64), ndis=np.empty(0, np.int64),
            elapsed=time.perf_counter() - t0,
        )

    def recall_against(self, result_ids: np.ndarray, gt_ids: np.ndarray, k: int) -> np.ndarray:
        """-1 padding in gt never matches -1 result padding (QueryEngine
        semantics)."""
        gt = gt_ids[:, :k]
        hits = ((result_ids[:, :, None] == gt[:, None, :]) & (gt[:, None, :] >= 0)).any(axis=1)
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
