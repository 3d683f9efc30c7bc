"""Query-blocked serving scan: one DMA of each probed tile serves a whole
query block, and one device program serves the whole batch.

The per-query kernel (engine/pallas_scan.py) re-fetches every 128-row tile
once per query, capping serving at gather bandwidth; a per-block host loop
would pay a host↔device round trip per block (30 ms over this rig's
tunneled TPU).  This module is the throughput path (reference hot loop:
search.cpp:472-514, which scans per-query serially on CPU), structured as
exactly two device calls per (batch, threshold):

  1. `_probe_prepare` — probing MLP, top-m bucket selection with the
     engine's `score ≥ threshold` + argmax-fallback semantics, a stable
     sort of queries by top bucket (similar queries → overlapping probed
     tiles), per-block bucket-union masks, and exact nprobe/ndis counters.
     Only the (n_blocks, n_bkt) union masks and the counters leave the
     device (~tens of KB).
  2. host: union masks → per-block supertile lists (S=8 consecutive
     128-row tiles) + tile→bucket maps.  Pure numpy, microseconds.
  3. `_scan_all` — one Pallas kernel over grid (n_blocks, U): supertiles
     stream from the flat bucket-contiguous corpus via scalar-prefetched
     indices, each (block_q, S·128) score block runs on the MXU, and only
     per-tile minima are emitted (the group-min screen of ops/knn_pallas.py
     which runs at ~2/3 of MXU peak).  A lax.map over blocks then masks by
     the per-(query, bucket) probed penalty — a query only "sees" tiles of
     buckets it probed, so results match the per-query engines exactly —
     selects the top-(fetch_k+margin) tiles per query, rescores them
     exactly in f32 (tile-granular gathers), and un-permutes.

bf16 fast mode stores the round-1 corpus in bfloat16 (half the HBM bytes);
the selection margin absorbs bf16 rounding of the group mins and round 2
re-ranks at f32 — see docs/bf16_screen.md for the measured miss rates.

ndis accounting is untouched: it counts each query's own probed buckets'
true sizes, not the union actually streamed (the union is an execution
strategy, not a different search).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.probing_mlp import forward as mlp_forward
from ..ops.distance import l2_to_centroids

S_TILES = 8  # tiles per supertile: out block (8, block_q) meets f32 (8, 128) alignment

_BIG = 3e38

# HBM cap on the screen output held live at once: (blocks, U·SG, qb) f32 is
# ~1 GB PER BLOCK at 20M-row unions, and 68 GB if all blocks materialize
# together (logs/capacity_20m.log).  _screen_rescore chunks block rows to
# this budget and consumes each chunk before screening the next.
_GMIN_BUDGET = 2 << 30
# set by _screen_rescore at trace time: the chunking plan it chose
# ({rows_per_call, u_chunk, U, n_blocks}) — tests assert the intended path
_LAST_CHUNK_PLAN: dict | None = None

# exact f32 row squared-norms of a device-resident table, one program
# parameter (the square fuses into the reduce; no (rows, d) intermediate)
_row_sqnorms_dev = jax.jit(
    lambda t: jnp.sum(jnp.square(t.astype(jnp.float32)), axis=1)
)


def _pow2ceil(x: int) -> int:
    return 1 << max(0, int(np.ceil(np.log2(max(x, 1)))))


# ---------------------------------------------------------------------------
# phase 1: on-device probe + block grouping + union masks
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("m", "qb"))
def _probe_prepare(
    params, centroids, scaler_mean, scaler_scale,
    q_pad: jax.Array,  # (B_pad, d) f32, zero rows beyond b_real
    sizes: jax.Array,  # (n_bkt,) int32 true bucket sizes
    b_real: jax.Array,  # () int32 — live query count
    threshold: jax.Array,  # () f32
    m: int,  # probe cap (n_bkt for dense semantics)
    qb: int,  # block size; B_pad % qb == 0
    rank: jax.Array | None = None,  # (n_bkt,) i32 locality rank (partition/order.py)
):
    """One device program: probe → select → sort-by-top-bucket → unions.

    `rank` remaps the grouping key: queries are sorted by their top
    bucket's position in a centroid-locality tour instead of its raw ID,
    so blocks share probe sets and the per-block union shrinks (the sort
    only changes which queries share a block — per-query results and ndis
    are identical for any rank).

    Returns (device: probed (B_pad, n_bkt) bool, perm (B_pad,) i32;
    host-bound: union (n_blocks, n_bkt) bool, nprobe (B_pad,), ndis (B_pad,)).
    """
    d = l2_to_centroids(q_pad, centroids)
    out = mlp_forward(params, (d - scaler_mean) / scaler_scale, q_pad)
    B, n_bkt = out.shape
    vals, idx = jax.lax.top_k(out, m)
    rows = jnp.arange(B)
    live = rows < b_real
    keep = vals >= threshold
    keep = keep.at[:, 0].set(True)  # argmax fallback (search.cpp:447-466)
    keep = keep & live[:, None]
    probed = jnp.zeros((B, n_bkt), bool).at[rows[:, None], idx].set(keep)
    key = idx[:, 0] if rank is None else rank[idx[:, 0]]
    key = jnp.where(live, key, n_bkt)  # dead rows sort last
    perm = jnp.argsort(key, stable=True).astype(jnp.int32)
    union = probed[perm].reshape(B // qb, qb, n_bkt).any(axis=1)
    nprobe = probed.sum(axis=1).astype(jnp.int32)
    # int32 is exact here: per-query ndis ≤ corpus rows + redundancy < 2^31
    ndis = probed.astype(jnp.int32) @ sizes
    return probed, perm, union, nprobe, ndis


@partial(jax.jit, static_argnames=("qb",))
def _prepare_from_mask(probed: jax.Array, top1: jax.Array, qb: int,
                       rank: jax.Array | None = None):
    """Grouping + unions for an externally-supplied probed mask (custom
    prober, e.g. the IVF baseline)."""
    if rank is None:
        key = top1
    else:
        # top1 == n_bkt marks pad rows; extend the rank table so they
        # keep sorting last
        ext = jnp.append(rank, jnp.asarray(rank.shape[0], rank.dtype))
        key = ext[top1]
    perm = jnp.argsort(key, stable=True).astype(jnp.int32)
    B, n_bkt = probed.shape
    union = probed[perm].reshape(B // qb, qb, n_bkt).any(axis=1)
    return perm, union


# ---------------------------------------------------------------------------
# phase 3: one stacked device program for every block
# ---------------------------------------------------------------------------


def _union_groupmin_kernel(
    sref, ulref, q_ref, chunk_ref, *rest, metric, precision, sel_rows=128,
    quantized=False,
):
    """One (block, union-supertile) step: (S·128, d) × (qb, d)ᵀ on the MXU →
    per-group min over SUBLANES, emitted (1, S·128/sel_rows, qb).

    Union slots past a block's TRUE union length (`ulref`, scalar-prefetched
    per block) are pad-to-pow2 entries: the kernel SKIPS their dot entirely
    (pl.when) and emits _BIG minima — the selection phase already masks pad
    tiles via the bucket map, so this changes no result, only the cost.
    Under trained (skewed) probing the pad share is the whole story of the
    round-4 "probe skew" QPS gap: locality grouping shrank the MEAN true
    union 36% but the padded width U is set by the WORST block, so every
    block still paid U supertiles of MXU work (logs/skew_profile_r5.log:
    trained-tour true mean 693 vs padded U 1024 at 1M×128).  Pad slots also
    repeat the block's LAST REAL supertile index (build_block_unions), so
    the pipelined input DMA for consecutive pad steps is elided (same block
    index → Pallas skips the copy).

    The dot is computed transposed on purpose: with a (qb, S·128) score
    block the per-tile min reduces over the LANE dimension and the result
    must be relayouted (qb, S) → (S, qb) — measured at ~2× the whole
    kernel's cost (scripts/kernel_micro.py: bf16 56→89 TFLOPS, f32 22→27
    by switching).  Transposed, the min is a cheap vertical reduce and the
    output orientation falls out for free.

    Row norms (the L2 ‖x‖² term) are computed IN-KERNEL from the chunk
    already in VMEM — a lane reduction over d, whose (S·128, 1) result is
    sublane-oriented by construction.  A precomputed norms operand cannot
    be: its dense HBM form is lane-oriented (the (S, 128) → (S·128, 1)
    in-kernel reshape is a lane→sublane relayout Mosaic rejects), and a
    flat (N, 1) HBM column gets the (8, 128) tiled layout — a 128× padding
    blowup that compile-OOMed every ≥10M-row corpus (9.2 GB of padding at
    19.3M rows, logs/tpu_10m_hard_run4.log).  The VPU cost is S·128·d
    mul-adds per step — ~0.1% of the step's MXU work at qb=1024.
    Padding-row correctness without a per-row penalty operand: the
    builders store each pad row as a COPY of its bucket's last real row
    (same tile, same selection group), so mixed groups' minima are exact
    for every metric and dtype; selection groups consisting purely of
    padding are masked outside the kernel via the per-group bucket map
    (_screen_rescore derives it from per-tile pad counts).

    sel_rows < 128 emits finer-grained minima (e.g. 32-row groups): round 2
    then gathers sel_rows-row groups instead of whole 128-row tiles,
    cutting its HBM traffic 128/sel_rows× at the cost of a wider top-k in
    the selection phase.  Exactness is preserved for any group size: the
    true top-fetch_k rows lie in ≤ fetch_k distinct groups, and a group
    holding one has group-min ≤ that row's score, so selecting the
    kg ≥ fetch_k best group-mins always covers them.

    quantized=True is the int8 screen: chunk/q arrive as symmetric int8
    (corpus per-dim scale folded into the query before quantization, see
    _screen_rescore), the dot accumulates in int32 on the MXU at 2× the
    bf16 rate and ¼ the f32 HBM bytes, and `rest` carries two extra
    operands — the SMEM dequantization scalar t (×2 for L2) applied to the
    int32 dot, and the (d, 1) per-dim squared scale s² for the in-kernel
    norms ‖x̂‖² = Σ_d s_d²·x8_d² (norms of the quantized points — fully
    consistent with the quantized dot; the margin absorbs the quantization
    error exactly as before)."""
    if quantized:
        t_ref, s2_ref, out_ref = rest
    else:
        (out_ref,) = rest
    live = pl.program_id(1) < ulref[pl.program_id(0)]

    @pl.when(live)
    def _screen():
        if quantized:
            doti = jax.lax.dot_general(
                chunk_ref[...], q_ref[...],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (S*128, qb) exact: |dot| ≤ 127²·d < 2^24 at d ≤ 1024
            scores = -t_ref[0, 0] * doti.astype(jnp.float32)
            if metric != "inner_product":
                xf = chunk_ref[...].astype(jnp.float32)
                norms = jax.lax.dot_general(
                    xf * xf, s2_ref[...],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (S*128, 1) = Σ_d s_d²·x8² on the MXU
                scores = norms + scores
        else:
            dot = jax.lax.dot_general(
                chunk_ref[...], q_ref[...],
                dimension_numbers=(((1,), (1,)), ((), ())),
                precision=precision,
                preferred_element_type=jnp.float32,
            )  # (S*128, qb)
            if metric == "inner_product":
                scores = -dot
            else:
                xf = chunk_ref[...].astype(jnp.float32)
                norms = jnp.sum(xf * xf, axis=1, keepdims=True)  # (S·128, 1) f32
                scores = norms - 2.0 * dot
        n_groups = S_TILES * 128 // sel_rows
        mins = [
            scores[g * sel_rows : (g + 1) * sel_rows, :].min(axis=0, keepdims=True)
            for g in range(n_groups)
        ]
        out_ref[...] = jnp.concatenate(mins, axis=0)[None]

    @pl.when(jnp.logical_not(live))
    def _pad():
        out_ref[...] = jnp.full(out_ref.shape, _BIG, jnp.float32)


def _dedup_topk_dev(ids: jax.Array, neg: jax.Array, k: int):
    """Per-row: drop duplicate ids (keep best-scored first occurrence),
    compress survivors to the front, truncate to k.  Rows arrive sorted by
    score ascending (top_k output), so first occurrence = best.  Device twin
    of engine/serve._dedup_topk."""
    B, m = ids.shape
    order = jnp.argsort(ids, axis=1, stable=True)
    sorted_ids = jnp.take_along_axis(ids, order, axis=1)
    dup_sorted = jnp.concatenate(
        [
            jnp.zeros((B, 1), bool),
            (sorted_ids[:, 1:] == sorted_ids[:, :-1]) & (sorted_ids[:, 1:] >= 0),
        ],
        axis=1,
    )
    dup = jnp.zeros_like(dup_sorted).at[jnp.arange(B)[:, None], order].set(dup_sorted)
    keep = ~dup & (ids >= 0)
    comp = jnp.argsort(~keep, axis=1, stable=True)  # kept entries first, score order
    out_ids = jnp.take_along_axis(ids, comp, axis=1)[:, :k]
    out_neg = jnp.take_along_axis(neg, comp, axis=1)[:, :k]
    n_keep = keep.sum(axis=1, keepdims=True)
    slot = jnp.arange(k)[None, :]
    out_ids = jnp.where(slot < n_keep, out_ids, -1)
    out_neg = jnp.where(slot < n_keep, out_neg, -jnp.inf)
    return out_ids, out_neg


def _screen_rescore(
    q_perm: jax.Array,  # (B_pad, d) f32, already permuted to block order
    probed_p: jax.Array,  # (n_blocks, qb, n_bkt) bool, permuted
    supers: jax.Array,  # (n_blocks, U) i32 supertile indices (pad slots
    # repeat the block's last real supertile so their input DMA is elided)
    tb: jax.Array,  # (n_blocks, U*S) i32 bucket per union tile (-1 pad)
    ulen: jax.Array,  # (n_blocks,) i32 TRUE union supertiles per block —
    # the kernel skips the dot for slots >= ulen (see _union_groupmin_kernel)
    corpus_flat: jax.Array,  # (n_super*S*128, d) round-1 dtype
    bsq: jax.Array,  # (n_super*S, 128) f32 norms/penalties
    corpus_flat_f32: jax.Array | None,  # rescore corpus; None = same buffer
    # as corpus_flat (f32 and capacity modes) — passing the identical array
    # as a SECOND program parameter makes XLA's compile-time HBM bound count
    # the table twice (18.6 GB "arguments" at the 10M demo's 19.2M-row
    # table, a compile OOM: logs/tpu_10m_hard_run4.log) — None aliases it
    tiles_ids: jax.Array,  # (n_super*S, 128) i32 global ids
    tile_pad_count: jax.Array,  # (n_super*S,) i32 pad rows per tile — pads
    # are a per-bucket (hence per-tile) suffix; used to mask all-pad
    # selection groups in the bucket map (the kernel has no per-row penalty
    # operand — see _union_groupmin_kernel)
    *,
    metric: str,
    kg: int,
    fetch_k: int,
    qb: int,
    precision: str,
    interpret: bool,
    sub: int = 64,
    screen_only: bool = False,  # phase profiling: stop after tile selection
    sel_rows: int = 128,  # selection granularity in rows (128 = whole tiles)
    dim_scale: jax.Array | None = None,  # (d,) f32 per-dim int8 corpus scale
):
    """Pallas group-min screen + masked group selection + exact f32 rescore
    over every query block.  Returns (neg (B_pad, k_loc), ids (B_pad, k_loc),
    k_loc) in block (permuted) order — shared by the single-chip `_scan_all`
    and the per-device body of the sharded engine (which merges shards over
    ICI before dedup).

    int8 mode (corpus_flat int8, dim_scale set): the corpus is stored as
    x ≈ s_d · x8 (per-dim symmetric scale).  Folding s into the query —
    q'_d = q_d·s_d, quantized with ONE batch scalar t so q_d ≈ t·q8_d/s_d —
    makes the true dot x·q ≈ t·(x8·q8): a pure int8 MXU matmul plus one
    scalar dequantization inside the kernel.  The selection margin absorbs
    the quantization error exactly as it absorbs bf16 rounding; round 2
    stays f32-exact."""
    B, d = q_perm.shape
    n_blocks, U = supers.shape
    if corpus_flat_f32 is None:
        corpus_flat_f32 = corpus_flat
    quantized = corpus_flat.dtype == jnp.int8
    if quantized:
        qp = q_perm * dim_scale[None, :]
        t = jnp.maximum(jnp.max(jnp.abs(qp)) / 127.0, 1e-30)
        q_r1 = jnp.clip(jnp.round(qp / t), -127, 127).astype(jnp.int8)
        t_eff = jnp.reshape(
            t if metric == "inner_product" else 2.0 * t, (1, 1)
        ).astype(jnp.float32)
        # (d, 1) per-dim squared scale — the kernel's in-kernel quantized
        # norms ‖x̂‖² = Σ_d s_d²·x8² (see _union_groupmin_kernel)
        s2_col = (dim_scale * dim_scale).reshape(d, 1).astype(jnp.float32)
    else:
        q_r1 = q_perm.astype(corpus_flat.dtype)
    G = 128 // sel_rows  # selection groups per 128-row tile
    SG = S_TILES * G  # groups per supertile

    # chunk the screen over block rows, bounded by BOTH budgets:
    #  - SMEM: the scalar-prefetch supers slice must fit 1 MiB with headroom;
    #  - HBM: the screen output is (rows, U·SG, qb) f32 — at a 20M-row corpus
    #    with near-full unions that is ~1 GB PER BLOCK, and materializing all
    #    n_blocks at once was measured to demand 68 GB at batch 65536
    #    (logs/capacity_20m.log, XLA compile-time OOM).  Each chunk's screen
    #    output is consumed by its own selection/rescore map below and dies
    #    before the next chunk screens, so peak HBM stays one chunk.
    smem_budget = 1 << 18
    rows_per_call = max(
        1,
        min(
            n_blocks,
            smem_budget // max(U * 4, 1),
            _GMIN_BUDGET // max(U * SG * qb * 4, 1),
        ),
    )
    q_rows = q_r1.reshape(n_blocks * qb, d)

    def screen_chunk(sup_c, ulen_c, s: int, e: int):
        u_w = sup_c.shape[1]  # supertiles in this call (≤ U when U-chunked)
        in_specs = [
            pl.BlockSpec(
                (qb, d), lambda i, u, sref, ulref, s=s: (s + i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (S_TILES * 128, d), lambda i, u, sref, ulref: (sref[i, u], 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        operands = [sup_c, ulen_c, q_rows, corpus_flat]
        if quantized:
            in_specs.append(
                pl.BlockSpec((1, 1), lambda i, u, sref, ulref: (0, 0),
                             memory_space=pltpu.SMEM)
            )
            operands.append(t_eff)
            in_specs.append(
                pl.BlockSpec((d, 1), lambda i, u, sref, ulref: (0, 0),
                             memory_space=pltpu.VMEM)
            )
            operands.append(s2_col)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(e - s, u_w),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, SG, qb), lambda i, u, sref, ulref: (i, u, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        return pl.pallas_call(
            partial(_union_groupmin_kernel, metric=metric, precision=precision,
                    sel_rows=sel_rows, quantized=quantized),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(((e - s), u_w * SG, qb), jnp.float32),
            interpret=interpret,
        )(*operands)

    groups_f32 = corpus_flat_f32.reshape(-1, sel_rows, d)
    # int8 CAPACITY: the rescore table itself is the int8 screen table.
    # x·q = Σ s_d·x8_d·q_d = x8·(q·s): fold the per-dim scale into the
    # round-2 query once, cast the gathered int8 groups in-register, and
    # accumulate f32 — same gather bytes as the screen (¼ of f32)
    dequant_r2 = corpus_flat_f32.dtype == jnp.int8
    q_r2 = q_perm * dim_scale[None, :] if dequant_r2 else q_perm
    bsq_g = bsq.reshape(-1, sel_rows)
    ids_g = tiles_ids.reshape(-1, sel_rows)
    # per-tile bucket map → per-group, with ALL-PAD groups masked to -1:
    # pad rows are a per-bucket suffix (hence a suffix of their tile), so
    # group j of G within a tile is pure padding iff the tile's pad count
    # covers it.  Mixed groups stay exact in the kernel (pads duplicate a
    # real in-group row); all-pad groups' minima are a real row's score
    # (the copy) and MUST be masked here or they could displace true groups
    # in the top-kg selection.
    tpc = tile_pad_count[
        (supers[:, :, None] * S_TILES
         + jnp.arange(S_TILES, dtype=jnp.int32)[None, None, :]
         ).reshape(n_blocks, U * S_TILES)
    ]  # (n_blocks, U*S) — supers pad slots (0) gather tile 0-7: tb -1 wins
    if G > 1:
        tb = jnp.repeat(tb, G, axis=1)
        tpc = jnp.repeat(tpc, G, axis=1)
    gpos = jnp.tile(jnp.arange(G, dtype=jnp.int32), U * S_TILES)[None, :]
    tb = jnp.where(tpc >= (G - gpos) * sel_rows, -1, tb)
    kg_eff = min(kg, U * SG)
    k_loc = min(fetch_k, kg_eff * sel_rows)

    def block_penalty(probed_b):
        # mask: a query sees only groups of buckets it probed (row n_bkt =
        # the catch-all penalty for padding tiles, tb == -1)
        qb_ = probed_b.shape[0]
        pen_b = jnp.where(probed_b.T, 0.0, _BIG).astype(jnp.float32)  # (n_bkt, qb)
        return jnp.concatenate(
            [pen_b, jnp.full((1, qb_), _BIG, jnp.float32)], axis=0
        )

    def select_slice(gmin_b, pen_b, tb_b, supers_b, u0: int):
        """Masked group selection over one U-slice of one block.

        gmin_b: (Uc·SG, qb) screen minima for supertiles [u0, u0+Uc) of the
        block's union; returns (vals (qb, min(kg_eff, Uc·SG)) negated masked
        minima, ggrp global sel_rows-group ids).  The global top-kg over the
        full union equals the top-kg of the per-slice top-kgs merged (every
        global winner wins its own slice), so U-chunked selection is exact."""
        tbx = jnp.where(tb_b >= 0, tb_b, pen_b.shape[0] - 1)
        masked = gmin_b + pen_b[tbx]  # (Uc*SG, qb)
        vals, sel = jax.lax.top_k(-masked.T, min(kg_eff, masked.shape[0]))
        ggrp = supers_b[u0 + sel // SG] * SG + sel % SG  # global group index
        return vals, ggrp

    def rescore_block(q_b, vals, ggrp):
        qb_ = q_b.shape[0]
        valid = vals > -(_BIG / 2)
        if screen_only:
            v, g = vals[:, :k_loc], ggrp[:, :k_loc].astype(jnp.int32)
            if k_loc > kg_eff:
                pad = k_loc - kg_eff
                v = jnp.concatenate([v, jnp.full((qb_, pad), -jnp.inf, jnp.float32)], 1)
                g = jnp.concatenate([g, jnp.full((qb_, pad), -1, jnp.int32)], 1)
            return v, g

        def rbody(rargs):
            qs, sg, val = rargs
            vec = groups_f32[sg]  # (sub, kg, sel_rows, d) group-granular gather
            if dequant_r2:
                vec = vec.astype(jnp.float32)  # in-register; qs carries q·s
            dot = jnp.einsum(
                "stgd,sd->stg", vec, qs,
                precision="highest", preferred_element_type=jnp.float32,
            )
            sq = bsq_g[sg]
            score = sq - dot if metric == "inner_product" else sq - 2.0 * dot
            ids = ids_g[sg]
            score = score + jnp.where(val, 0.0, _BIG)[:, :, None]
            score = jnp.where(ids >= 0, score, _BIG)
            n = qs.shape[0]
            neg, pos = jax.lax.top_k(-score.reshape(n, kg_eff * sel_rows), k_loc)
            oid = jnp.take_along_axis(ids.reshape(n, kg_eff * sel_rows), pos, axis=1)
            return neg, jnp.where(neg > -(_BIG / 2), oid, -1)

        # largest divisor of qb_ that fits the gather budget — falling back
        # to sub_eff = qb_ would stage the whole block and defeat the 256 MB
        # bound at non-pow2 block sizes
        sub_eff = next(s for s in range(min(sub, qb_), 0, -1) if qb_ % s == 0)
        n_sub = qb_ // sub_eff
        neg, oid = jax.lax.map(
            rbody,
            (
                q_b.reshape(n_sub, sub_eff, d),
                ggrp.reshape(n_sub, sub_eff, kg_eff),
                valid.reshape(n_sub, sub_eff, kg_eff),
            ),
        )
        return neg.reshape(qb_, k_loc), oid.reshape(qb_, k_loc)

    def per_block(args):
        gmin_b, probed_b, tb_b, supers_b, q_b = args
        vals, ggrp = select_slice(gmin_b, block_penalty(probed_b), tb_b,
                                  supers_b, 0)
        return rescore_block(q_b, vals, ggrp)

    # screen-then-consume per chunk: chunk i+1's screen input is tied to
    # chunk i's selection output with an optimization_barrier, so XLA's
    # scheduler cannot hoist every screen ahead of the consumers and
    # re-create the all-blocks gmin allocation the chunking exists to avoid.
    # A near-full union at ≥50M rows makes EVEN ONE block's screen output
    # (U·SG, qb) f32 ~8 GB — the 50M demo's compile OOM
    # (logs/tpu_50m_demo5.log: two 8 GB buffers, 16.4 GB demanded of 15.75)
    # — and block-row chunking bottoms out at one block.  When one block's
    # output exceeds half the budget, the screen is additionally chunked
    # ALONG THE UNION with a running top-kg merge per block (exact — see
    # select_slice), so peak HBM is one U-slice's output + its penalty
    # gather + transpose, independent of corpus size.
    u_chunk = max(1, (_GMIN_BUDGET // 2) // max(SG * qb * 4, 1))
    global _LAST_CHUNK_PLAN  # debug/test introspection of the chosen plan
    _LAST_CHUNK_PLAN = {
        "rows_per_call": rows_per_call, "u_chunk": u_chunk,
        "U": U, "n_blocks": n_blocks, "sg": SG, "qb": qb,
    }

    q_blocks = q_r2.reshape(n_blocks, qb, d)  # round-2 query (q·s for int8 capacity)
    neg_parts, ids_parts = [], []
    prev = None
    ulen = ulen.astype(jnp.int32)
    if u_chunk >= U:
        for s in range(0, n_blocks, rows_per_call):
            e = min(s + rows_per_call, n_blocks)
            sup_c = supers[s:e]
            if prev is not None:
                sup_c, prev = jax.lax.optimization_barrier((sup_c, prev))
            gmin_c = screen_chunk(sup_c, ulen[s:e], s, e)
            neg_c, ids_c = jax.lax.map(
                per_block, (gmin_c, probed_p[s:e], tb[s:e], sup_c, q_blocks[s:e])
            )
            prev = neg_c
            neg_parts.append(neg_c)
            ids_parts.append(ids_c)
    else:
        for b in range(n_blocks):
            pen_b = block_penalty(probed_p[b])
            carry_v = jnp.full((qb, kg_eff), -jnp.inf, jnp.float32)
            carry_g = jnp.zeros((qb, kg_eff), jnp.int32)
            for u0 in range(0, U, u_chunk):
                u1 = min(u0 + u_chunk, U)
                sup_c = supers[b : b + 1, u0:u1]
                # live slots of this U-slice: clip the block's true length
                # into [u0, u1) so the kernel's skip stays per-slice exact
                ulen_c = jnp.clip(ulen[b : b + 1] - u0, 0, u1 - u0)
                if prev is not None:
                    sup_c, prev = jax.lax.optimization_barrier((sup_c, prev))
                gmin_c = screen_chunk(sup_c, ulen_c, b, b + 1)[0]  # (Uc·SG, qb)
                vals_c, ggrp_c = select_slice(
                    gmin_c, pen_b, tb[b, u0 * SG : u1 * SG], supers[b], u0
                )
                mv = jnp.concatenate([carry_v, vals_c], axis=1)
                mg = jnp.concatenate([carry_g, ggrp_c], axis=1)
                carry_v, isel = jax.lax.top_k(mv, kg_eff)
                carry_g = jnp.take_along_axis(mg, isel, axis=1)
                prev = carry_v
            neg_b, ids_b = rescore_block(q_blocks[b], carry_v, carry_g)
            neg_parts.append(neg_b[None])
            ids_parts.append(ids_b[None])
    neg = neg_parts[0] if len(neg_parts) == 1 else jnp.concatenate(neg_parts, axis=0)
    ids = ids_parts[0] if len(ids_parts) == 1 else jnp.concatenate(ids_parts, axis=0)
    return neg.reshape(B, k_loc), ids.reshape(B, k_loc), k_loc


@partial(
    jax.jit,
    static_argnames=(
        "metric", "kg", "fetch_k", "k", "qb", "precision", "interpret", "sub",
        "screen_only", "sel_rows",
    ),
)
def _scan_all(
    q_pad: jax.Array,  # (B_pad, d) f32
    probed: jax.Array,  # (B_pad, n_bkt) bool (un-permuted)
    perm: jax.Array,  # (B_pad,) i32
    supers: jax.Array,  # (n_blocks, U) i32 supertile indices (pad slots
    # repeat the block's last real supertile — see build_block_unions)
    tb: jax.Array,  # (n_blocks, U*S) i32 bucket per union tile (-1 pad)
    ulen: jax.Array,  # (n_blocks,) i32 true union supertiles per block
    corpus_flat: jax.Array,  # (n_super*S*128, d) round-1 dtype
    bsq: jax.Array,  # (n_super*S, 128) f32 norms/penalties
    corpus_flat_f32: jax.Array | None,  # rescore corpus (None = corpus_flat;
    # see _screen_rescore — avoids double-counting the table as two params)
    tiles_ids: jax.Array,  # (n_super*S, 128) i32 global ids
    tile_pad_count: jax.Array,  # (n_super*S,) i32 — see _screen_rescore
    metric: str,
    kg: int,
    fetch_k: int,
    k: int,
    qb: int,
    precision: str,
    interpret: bool,
    sub: int = 64,
    screen_only: bool = False,  # phase profiling: stop after tile selection
    sel_rows: int = 128,
    dim_scale: jax.Array | None = None,  # int8 mode: per-dim corpus scale
):
    """(scores (B_pad, k), ids (B_pad, k)) — one device program, including
    the dedup of replicated points to k distinct neighbors."""
    B, d = q_pad.shape
    n_blocks, U = supers.shape
    q_perm = q_pad[perm]
    probed_p = probed[perm].reshape(n_blocks, qb, -1)
    neg, ids, k_loc = _screen_rescore(
        q_perm, probed_p, supers, tb, ulen, corpus_flat, bsq, corpus_flat_f32,
        tiles_ids, tile_pad_count,
        metric=metric, kg=kg, fetch_k=fetch_k, qb=qb, precision=precision,
        interpret=interpret, sub=sub, screen_only=screen_only, sel_rows=sel_rows,
        dim_scale=dim_scale,
    )
    if k_loc < k:  # tiny layouts: fewer candidates than k
        pad = k - k_loc
        neg = jnp.concatenate([neg, jnp.full((B, pad), -jnp.inf, jnp.float32)], axis=1)
        ids = jnp.concatenate([ids, jnp.full((B, pad), -1, jnp.int32)], axis=1)
    ids, neg = _dedup_topk_dev(ids, neg, k)

    # un-permute back to caller order
    out_scores = jnp.zeros_like(neg).at[perm].set(-neg)
    out_ids = jnp.full_like(ids, -1).at[perm].set(ids)
    return out_scores, out_ids


# ---------------------------------------------------------------------------
# state + orchestration
# ---------------------------------------------------------------------------


def _align_ids(padded_ids, n_rows: int, tile: int):
    """Supertile-align the id vector: returns (ids (rows_total,), n_super,
    pad_rows added)."""
    n_tiles = n_rows // tile
    n_super = max(1, -(-n_tiles // S_TILES))
    pad_rows = n_super * S_TILES * tile - n_rows
    ids = np.asarray(padded_ids, np.int32)
    if pad_rows:
        ids = np.concatenate([ids, np.full(pad_rows, -1, np.int32)])
    return ids, n_super, pad_rows


class BlockScanState:
    """Device-resident round-1/round-2 corpus views for the blocked scan.

    HBM cost: one f32 corpus copy (round 2), plus a bf16 (int8) copy when
    scan_dtype is bfloat16 (int8) — 1.0× / 1.5× / 1.25× the corpus.  All
    other state (norms, ids, bucket map) is O(n/128 · 128 · 8 B).

    `store_f32=False` (bf16 or int8) is the CAPACITY mode: ONE approximate
    table is shared by both rounds — bf16: 0.5× the corpus in HBM (2×
    rows-per-chip vs all-f32); int8: 0.25× (4× rows-per-chip) — and the
    round-2 rescore accumulates in f32 from the approximate inputs (int8
    dequantizes by folding the per-dim scale into the query; row norms
    stay EXACT f32, computed from the raw corpus before quantization).
    The final exact ordering comes from the caller's host-side f32 re-rank
    over the fetched candidates (QueryEngine._rerank_f32, the same contract
    as the per-query xla bf16 mode): the candidate SET can in principle
    lose a true neighbor to rounding/quantization past the over-fetch
    slack, which the dedicated slack absorbs in practice (the xla-path
    +16-slot rule, doubled for int8; measured zero misses at bf16,
    docs/bf16_screen.md).
    """

    def __init__(self, padded_host, padded_ids, tile_bucket, metric, scan_dtype,
                 tile=128, store_f32=True):
        """padded_host: (padded_total, d) f32 host array (layout.gather_vectors);
        padded_ids: (padded_total,) int32 global ids, -1 = padding."""
        n_rows, d = padded_host.shape
        ids, n_super, pad_rows = _align_ids(padded_ids, n_rows, tile)
        if pad_rows:
            padded_host = np.concatenate(
                [padded_host, np.zeros((pad_rows, d), np.float32)]
            )
        capacity = not store_f32 and scan_dtype in (jnp.bfloat16, jnp.int8)
        dim_scale = None
        if capacity:
            # upload the table in its approximate dtype directly: device HBM
            # peak is 0.5× (bf16) / 0.25× (int8) the corpus end to end; exact
            # row norms come from the f32 host array (no f32 device copy
            # exists to reduce)
            from ..ops.distance import row_sqnorms

            norms_rows = row_sqnorms(padded_host)
            if scan_dtype == jnp.int8:
                dim_scale = (
                    np.maximum(np.abs(padded_host).max(axis=0), 1e-30) / 127.0
                ).astype(np.float32)
                corpus_dev = jnp.asarray(np.clip(
                    np.round(padded_host / dim_scale), -127, 127
                ).astype(np.int8))
            else:
                corpus_dev = jnp.asarray(padded_host.astype(jnp.bfloat16))
        else:
            corpus_dev = jnp.asarray(padded_host, jnp.float32)
            norms_rows = None
        self._finish(
            corpus_dev, ids, tile_bucket, metric, scan_dtype, tile, n_super,
            store_f32=store_f32, norms_rows=norms_rows, dim_scale=dim_scale,
        )

    @classmethod
    def from_corpus(
        cls,
        x_d: np.ndarray,  # (n, d) raw corpus, host
        padded_ids: np.ndarray,  # (padded_total,) i32 global ids, -1 = pad
        tile_bucket,
        metric: str,
        scan_dtype,
        tile: int = 128,
        chunk_rows: int = 1 << 21,
        store_f32: bool = True,
    ) -> "BlockScanState":
        """Build the padded table ON DEVICE from the raw corpus.

        `layout.gather_vectors` + upload moves padded_total·d·4 bytes host→
        device — with learning-based redundancy that is up to n_mul× the
        corpus (×1.95 measured at 10M on the hard regime) plus a full-size
        host temporary.  This constructor uploads the raw corpus once in
        dense chunks and scatters each chunk's rows to their (possibly
        multiple) padded positions on device: bytes = n·d·4 + O(padded)
        index ints, host staging = one chunk, device peak = padded table +
        one gathered chunk."""
        self = cls.__new__(cls)
        x_d = np.asarray(x_d)
        n, d = x_d.shape
        ids, n_super, _ = _align_ids(padded_ids, len(padded_ids), tile)
        rows_total = n_super * S_TILES * tile
        capacity = not store_f32 and scan_dtype in (jnp.bfloat16, jnp.int8)
        cap_int8 = capacity and scan_dtype == jnp.int8
        dim_scale = None
        if cap_int8:
            # int8 capacity: per-dim scale from one streamed host max-abs
            # pass; chunks are quantized on HOST and uploaded as int8 — ¼
            # the upload bytes, and device HBM peak stays 0.25× the corpus
            # through the whole build
            amax = np.zeros(d, np.float32)
            for s in range(0, n, chunk_rows):
                np.maximum(amax, np.abs(x_d[s : s + chunk_rows]).max(axis=0),
                           out=amax)
            dim_scale = (np.maximum(amax, 1e-30) / 127.0).astype(np.float32)

        order = np.argsort(ids, kind="stable")
        first = np.searchsorted(ids[order], 0, side="left")
        sorted_pos = order[first:].astype(np.int32)  # padded positions by source id
        sorted_src = ids[order][first:]

        # pad the index vectors to pow2 lengths (extra entries scatter to an
        # out-of-bounds row and are dropped): the jitted scatter compiles
        # O(log) times across chunks instead of once per distinct (hi-lo)
        scatter = jax.jit(
            lambda o, pos, vals, src: o.at[pos].set(vals[src].astype(o.dtype), mode="drop"),
            donate_argnums=(0,),
        )
        # capacity mode scatters straight into a bf16/int8 table: device HBM
        # peak stays 0.5×/0.25× the corpus through the whole build
        out_dtype = (
            jnp.int8 if cap_int8 else jnp.bfloat16 if capacity else jnp.float32
        )
        out = jnp.zeros((rows_total, d), out_dtype)
        for s in range(0, n, chunk_rows):
            e = min(s + chunk_rows, n)
            lo = int(np.searchsorted(sorted_src, s, side="left"))
            hi = int(np.searchsorted(sorted_src, e, side="left"))
            if lo == hi:
                continue
            cap = _pow2ceil(hi - lo)
            pos_p = np.full(cap, rows_total, np.int32)  # OOB → dropped
            pos_p[: hi - lo] = sorted_pos[lo:hi]
            src_p = np.zeros(cap, np.int32)
            src_p[: hi - lo] = sorted_src[lo:hi] - s
            if cap_int8:
                vals = np.clip(
                    np.round(x_d[s:e].astype(np.float32) / dim_scale),
                    -127, 127,
                ).astype(np.int8)
            else:
                vals = np.ascontiguousarray(x_d[s:e], np.float32)
            out = scatter(
                out,
                jnp.asarray(pos_p),
                jnp.asarray(vals),
                jnp.asarray(src_p),
            )
        norms_rows = None
        if capacity and metric != "inner_product":
            # exact f32 norms host-side (no f32 device copy exists): one
            # O(n·d) pass over the raw corpus + a scatter by padded position
            from ..ops.distance import row_sqnorms

            nv = row_sqnorms(x_d)  # (n,)
            norms_rows = np.zeros(rows_total, np.float32)
            norms_rows[sorted_pos] = nv[sorted_src]
        self._finish(out, ids, tile_bucket, metric, scan_dtype, tile, n_super,
                     store_f32=store_f32, norms_rows=norms_rows,
                     dim_scale=dim_scale)
        return self

    def _finish(self, corpus_dev, ids, tile_bucket, metric, scan_dtype,
                tile, n_super, store_f32=True, norms_rows=None,
                dim_scale=None):
        """corpus_dev: the padded table on device — f32 normally, or already
        bf16/int8 from a capacity-mode builder (store_f32=False, so no f32
        copy ever exists on device; int8 builders also pass their per-dim
        `dim_scale`).  norms_rows: optional (rows_total,) f32 host exact row
        norms (capacity builders compute them host-side since no f32 device
        copy is available to reduce)."""
        self.store_f32 = store_f32 or scan_dtype not in (jnp.bfloat16, jnp.int8)
        self.dim_scale = None
        # Pad rows become COPIES of their bucket's last real row: the screen
        # kernel computes row norms in-kernel (no per-row penalty operand —
        # the flat (N, 1) norms column's tiled HBM layout was a 128× padding
        # blowup, see _union_groupmin_kernel), so a pad row must score
        # exactly like a real row of its own selection group.  Pads are a
        # per-bucket suffix, so the last real row at-or-before each position
        # is in the same tile AND the same (32/64/128-row) group whenever
        # the group holds any real row; all-pad groups are masked by the
        # per-group bucket map instead (_screen_rescore).  Round 2 still
        # masks pads exactly by id, and the int8 per-dim scale is unchanged
        # (copies introduce no new values).
        idsf = np.asarray(ids)
        real = idsf >= 0
        last_real = np.maximum.accumulate(
            np.where(real, np.arange(len(idsf), dtype=np.int64), -1)
        )
        pad_pos = np.nonzero(~real & (last_real >= 0))[0]
        if len(pad_pos):
            fill = jax.jit(
                lambda c, p, s: c.at[p].set(c[s]), donate_argnums=(0,)
            )
            corpus_dev = fill(
                corpus_dev,
                jnp.asarray(pad_pos, jnp.int32),
                jnp.asarray(last_real[pad_pos], jnp.int32),
            )
        if scan_dtype == jnp.bfloat16:
            if not self.store_f32:
                # capacity mode: ONE bf16 table serves both rounds — 0.5×
                # the corpus in HBM; round 2 accumulates f32 from bf16
                self.corpus_flat = corpus_dev.astype(jnp.bfloat16)
                self.corpus_flat_f32 = self.corpus_flat
            else:
                self.corpus_flat_f32 = corpus_dev
                self.corpus_flat = corpus_dev.astype(jnp.bfloat16)
        elif scan_dtype == jnp.int8:
            if not self.store_f32:
                # int8 CAPACITY: one int8 table serves both rounds — 0.25×
                # the corpus in HBM.  Round 2 dequantizes by folding the
                # per-dim scale into the query (x·q = Σ s_d·x8_d·q_d =
                # x8·(q·s)); row norms stay exact f32 via norms_rows.  Final
                # ordering is the engine's host f32 re-rank.
                if corpus_dev.dtype == jnp.int8:
                    if dim_scale is None:
                        raise ValueError(
                            "a pre-quantized int8 capacity table needs its "
                            "per-dim dim_scale"
                        )
                    self.corpus_flat = corpus_dev
                    self.dim_scale = jnp.asarray(dim_scale, jnp.float32)
                else:  # f32 table handed in: norms first, then quantize
                    if norms_rows is None and metric != "inner_product":
                        norms_rows = _row_sqnorms_dev(corpus_dev)
                    quantize = jax.jit(
                        lambda x: (
                            lambda s: (
                                s,
                                jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8),
                            )
                        )(jnp.maximum(jnp.max(jnp.abs(x), axis=0), 1e-30) / 127.0)
                    )
                    self.dim_scale, self.corpus_flat = quantize(corpus_dev)
                    del corpus_dev  # release the f32 table (0.25× from here)
                self.corpus_flat_f32 = self.corpus_flat
            else:
                # symmetric per-dim quantization x ≈ s_d·x8, computed on
                # device from the f32 copy already in HBM (¼ the f32
                # round-1 bytes, 2× the bf16 MXU rate; round 2 stays
                # f32-exact)
                self.corpus_flat_f32 = corpus_dev
                quantize = jax.jit(
                    lambda x: (
                        lambda s: (s, jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8))
                    )(jnp.maximum(jnp.max(jnp.abs(x), axis=0), 1e-30) / 127.0)
                )
                self.dim_scale, self.corpus_flat = quantize(self.corpus_flat_f32)
        else:
            self.corpus_flat_f32 = corpus_dev
            self.corpus_flat = corpus_dev

        self.tiles_ids = jnp.asarray(ids.reshape(n_super * S_TILES, tile))
        if metric == "inner_product":
            sq = jnp.where(self.tiles_ids >= 0, 0.0, _BIG).astype(jnp.float32)
        else:
            if norms_rows is not None:
                norms = jnp.asarray(norms_rows, jnp.float32).reshape(
                    n_super * S_TILES, tile
                )
            elif self.corpus_flat_f32.dtype == jnp.int8:
                # int8 capacity without host norms: ‖x̂‖² = Σ (s_d·x8_d)² —
                # the dequantized points' own norms (consistent with the
                # dequantized round-2 dot; the host re-rank restores exact
                # order either way)
                ds = self.dim_scale
                norms = jax.jit(
                    lambda t, s: jnp.sum(
                        jnp.square(t.astype(jnp.float32) * s[None, :]), axis=1
                    )
                )(self.corpus_flat_f32, ds).reshape(n_super * S_TILES, tile)
            else:
                # norms from the corpus copy already in HBM — feeding the
                # host array through a device op would upload the corpus a
                # second time (~30 min at 10M rows on a tunneled rig).
                # Square-sum, NOT einsum(x, x): einsum stages the table as
                # TWO program parameters and XLA's compile-time HBM bound
                # counts both — 18.4 GB at the 10M demo's 19.2M-row
                # redundant table, a compile OOM (logs/tpu_10m_hard_run3.log)
                norms = _row_sqnorms_dev(self.corpus_flat_f32).reshape(
                    n_super * S_TILES, tile
                )
            sq = jnp.where(self.tiles_ids >= 0, norms, _BIG)
        self.bsq = sq

        tb = np.asarray(tile_bucket, np.int32)
        pad_tiles = n_super * S_TILES - len(tb)
        # set AFTER corpus_flat/corpus_flat_f32 above
        self.rescore_arg = (
            None if self.corpus_flat_f32 is self.corpus_flat else self.corpus_flat_f32
        )
        self.tile_bucket = (
            np.concatenate([tb, np.full(pad_tiles, -1, np.int32)]) if pad_tiles else tb
        )
        # per-tile pad-row counts (pads are a per-tile suffix) — drives the
        # all-pad selection-group masking in _screen_rescore
        self.tile_pad_count = jnp.asarray(
            (~real).reshape(n_super * S_TILES, tile).sum(axis=1).astype(np.int32)
        )
        self.n_super = n_super
        self.scan_dtype = scan_dtype


def build_block_unions(
    union_mask: np.ndarray,  # (n_blocks, n_bkt) bool
    tile_start: np.ndarray,
    tiles_per_bucket: np.ndarray,
    tile_bucket: np.ndarray,  # (n_super*S,) bucket per global tile
):
    """Union masks → per-block supertile lists + per-tile bucket maps.

    Returns (supers (n_blocks, U) i32, tb (n_blocks, U*S) i32,
    ulen (n_blocks,) i32) with U the pow2 ceiling of the largest block
    union (compile-count stays log) and ulen each block's TRUE union
    length — the screen kernel skips slots past it, so the padded width
    costs (almost) nothing (see _union_groupmin_kernel).  Pad slots
    repeat the block's LAST real supertile: identical consecutive block
    indices let the Pallas pipeline elide their input DMA."""
    n_blocks = union_mask.shape[0]
    per_block = []
    for i in range(n_blocks):
        bs = np.nonzero(union_mask[i])[0]
        reps = tiles_per_bucket[bs]
        total = int(reps.sum())
        if total == 0:
            per_block.append(np.zeros(0, np.int64))
            continue
        starts_rep = np.repeat(tile_start[bs], reps)
        cum = np.cumsum(reps) - reps
        within = np.arange(total, dtype=np.int64) - np.repeat(cum, reps)
        per_block.append(np.unique((starts_rep + within) // S_TILES))
    U = max(1, _pow2ceil(max(len(s) for s in per_block)))
    supers = np.zeros((n_blocks, U), np.int32)
    tb = np.full((n_blocks, U * S_TILES), -1, np.int32)
    ulen = np.zeros(n_blocks, np.int32)
    for i, s in enumerate(per_block):
        if not len(s):
            continue
        supers[i, : len(s)] = s
        supers[i, len(s):] = s[-1]  # pad = last real supertile (DMA elision)
        ulen[i] = len(s)
        real = (s[:, None] * S_TILES + np.arange(S_TILES)[None, :]).reshape(-1)
        tb[i, : len(real)] = tile_bucket[real]
    return supers, tb, ulen


def _resolve_margin(margin, scan_dtype, sel_rows: int) -> int:
    """Default selection margin, validated against the kernel's tile shape.

    The margin is counted in SELECTION GROUPS: at sel_rows < 128 there are
    128/sel_rows x more group-mins competing inside the same rounding band,
    so the approximate-screen defaults scale to keep the margin's ROW
    coverage constant.  f32 group mins are exact — the margin only absorbs
    score ties there, which is granularity-independent (flat 8).

    bf16 default = 4 tiles of coverage: the measured serving zero-miss
    margin is 0 on both measured corpora and the offline sweep's
    (knn_fused's) is 4 tiles (docs/bf16_screen.md), so 4 tiles covers the
    worst measured zero-miss point of either path; the QPS grid
    (scripts/sel_rows_bench.py, logs/sel_rows_bench_r3.log) measures it
    14-17% faster than the previous 8-tile default at the sel_rows=32
    production granularity.  int8 default = 8 tiles: its serving zero-miss
    is 4 tiles (zero miss at EVERY rung >= 4), kept at the same 2x safety
    factor.  Rounding/quantization is data-dependent: re-validate on new
    distributions (engine/calibrate.py makes that one call, or re-run
    scripts/bf16_margin_sweep.py) or raise `margin`."""
    if not (0 < sel_rows <= 128 and 128 % sel_rows == 0):
        raise ValueError(
            f"sel_rows={sel_rows}: must be a divisor of the 128-row tile "
            "(the round-1 kernel emits per-group minima over sublane slices)"
        )
    if margin is None:
        if scan_dtype == jnp.bfloat16:
            margin = 4 * (128 // sel_rows)
        elif scan_dtype == jnp.int8:
            margin = 8 * (128 // sel_rows)
        else:
            margin = 8
    return margin


def _round2_sub(kg: int, sel_rows: int, d: int, qb: int) -> int:
    """Query sub-batch for the round-2 rescore: the gather stages
    (sub, kg, sel_rows, d) f32 — bound it to ~256 MB (at the reference's
    large-scale default k=100, kg is 208+ groups and sub=64 would stage
    ~870 MB at d=128 alongside the corpus)."""
    budget = (256 << 20) // max(kg * sel_rows * d * 4, 1)
    sub = 64
    while sub > 8 and sub > budget:
        sub //= 2
    return min(sub, qb)


def _screen_qb_cap(d: int, scan_dtype) -> int:
    """Largest union-block qb whose screen step fits scoped VMEM at dim d.

    Same empirical budget family as ops.knn_pallas._r1_blocks (fit to
    compile-probes of the group-min kernels against the v5e Mosaic
    compiler at d=960/128), restated for _union_groupmin_kernel's shapes:
    double-buffered operands 2·b·d·(qb + S·128), ~12·qb·S·128 bytes of
    f32 dot/score temporaries, plus the in-kernel f32 chunk cast for the
    norms reduce (4·S·128·d).  Budget 15.0 MiB — half a MiB under the
    knn kernel's measured 15.5 ceiling, since this kernel also builds the
    per-group min list.  At the production d=128 geometry every scan
    dtype still resolves to the measured-optimal qb=1024; at d=960 bf16
    resolves to 256 (512 sits within 1% of the raw ceiling — too close)."""
    budget = int(15.0 * 1024 * 1024)
    s128 = S_TILES * 128
    b = jnp.dtype(scan_dtype).itemsize
    avail = budget - 2 * b * d * s128 - 4 * s128 * d
    # avail can go negative at very wide dims (f32 d>1280, bf16 d>1920,
    # int8 d>2560); Python's bit_length() on a negative int is the
    # magnitude's, which would return a spuriously LARGE cap exactly where
    # the guard matters — clamp to the minimum before the pow2 floor.
    cap = max(int(avail // (2 * b * d + 12 * s128)), 8)
    cap = 1 << max(cap.bit_length() - 1, 3)  # pow2 floor, ≥ 8
    return cap


def _probe_batch(
    state: BlockScanState,
    engine,
    queries: np.ndarray,  # (B, d) f32, one batch
    threshold: float,
    block_q: int,
    use_cache: bool = False,
):
    """Upload one batch + launch its probe program (async); the single
    probe-dispatch used by blocked_search, blocked_search_stream, and
    mirrored by the sharded engine — the prober fallback / padding / perm
    semantics live HERE only.

    Returns a handle dict: q/probed/perm device arrays, union the
    (n_blocks, n_bkt) mask (device for the MLP path), nprobe/ndis (device
    full-length for the MLP path, host length-B for the prober path).

    `use_cache` reuses the previous upload when the same query CONTENT at
    the same shape is searched again (threshold sweeps re-search one batch;
    33 MB re-uploads dominate on tunneled rigs).  The hit is verified by
    np.array_equal against a kept host copy — identity alone would silently
    serve stale vectors if a caller mutates a reused query buffer in place."""
    queries = np.asarray(queries, np.float32)
    B, d = queries.shape
    qb = max(8, min(block_q, _pow2ceil(B), _screen_qb_cap(d, state.scan_dtype)))
    B_pad = -(-B // qb) * qb
    cache = getattr(state, "_q_cache", None)
    if (
        use_cache and cache is not None and cache[0].shape == (B_pad, d)
        and np.array_equal(cache[0][:B], queries)
    ):
        q_dev = cache[1]
    else:
        q_pad = np.zeros((B_pad, d), np.float32)
        q_pad[:B] = queries
        q_dev = jnp.asarray(q_pad)
        if use_cache:
            state._q_cache = (q_pad, q_dev)

    n_bkt = engine.layout.n_bkt
    rank = getattr(engine, "bucket_rank", None)
    rank_dev = None if rank is None else jnp.asarray(rank, jnp.int32)
    if engine.prober is not None:
        # pluggable prober (e.g. the IVF centroid-rank baseline): host
        # outputs → engine threshold + argmax-fallback selection semantics
        outputs = np.asarray(engine.prober(queries))
        probed_h = engine.select_buckets(outputs, threshold)
        if B_pad > B:
            probed_h = np.concatenate(
                [probed_h, np.zeros((B_pad - B, n_bkt), bool)], axis=0
            )
        top1 = np.concatenate([outputs.argmax(axis=1), np.full(B_pad - B, n_bkt)])
        probed = jnp.asarray(probed_h)
        perm, union = _prepare_from_mask(probed, jnp.asarray(top1, jnp.int32), qb,
                                         rank_dev)
        nprobe = probed_h[:B].sum(axis=1)
        ndis = probed_h[:B] @ engine.sizes.astype(np.int64)
    else:
        m = min(engine.probe_cap or n_bkt, n_bkt)
        probed, perm, union, nprobe, ndis = _probe_prepare(
            engine.params, engine.centroids, engine.scaler_mean,
            engine.scaler_scale, q_dev, jnp.asarray(engine.sizes, jnp.int32),
            jnp.int32(B), jnp.float32(threshold), m, qb, rank_dev,
        )
    return dict(q=q_dev, probed=probed, perm=perm, union=union,
                nprobe=nprobe, ndis=ndis, B=B, qb=qb)


@partial(jax.jit, static_argnames=("wire",))
def _wire_pack(scores, ids, wire: str):
    """Fuse the (B, k) f32 scores + (B, k) i32 ids into ONE device array so
    the result leaves the device in a single D2H transfer.

    The sync path otherwise pays two serialized fetches (each with its own
    host↔device round trip — ~30 ms on a tunneled rig, docs/serving_design.md
    phase breakdown), and the measured result-fetch share of a warm 65k batch
    is ~25% of e2e wall (logs/phase_trained_r5b.log).

      'pack32' — bitcast f32 scores to i32 and concat with ids: (B, 2k) i32.
        Bit-exact round trip; same bytes, one transfer instead of two.
      'bf16'   — scores are rounded to bfloat16 on device and shipped as
        u16 beside the ids' two u16 halves: (B, 3k) u16 — 25% fewer wire
        bytes.  ids stay EXACT (recall is unaffected); only the reported
        score loses f32→bf16 precision (~3 significant digits), after the
        full-precision on-device ranking has already fixed the order.
    """
    if wire == "pack32":
        return jnp.concatenate(
            [ids, jax.lax.bitcast_convert_type(scores, jnp.int32)], axis=1
        )
    if wire != "bf16":
        raise ValueError(f"unknown wire format {wire!r}")
    s16 = jax.lax.bitcast_convert_type(scores.astype(jnp.bfloat16), jnp.uint16)
    lo = (ids & 0xFFFF).astype(jnp.uint16)
    hi = ((ids >> 16) & 0xFFFF).astype(jnp.uint16)
    return jnp.concatenate([lo, hi, s16], axis=1)


def _wire_unpack(w: np.ndarray, wire: str):
    """Host inverse of `_wire_pack` → (scores f32, ids i32), both (B, k)."""
    if wire == "pack32":
        k = w.shape[1] // 2
        ids = np.ascontiguousarray(w[:, :k])
        scores = np.ascontiguousarray(w[:, k:]).view(np.float32)
        return scores, ids
    import ml_dtypes

    k = w.shape[1] // 3
    lo = w[:, :k].astype(np.uint32)
    hi = w[:, k : 2 * k].astype(np.uint32)
    ids = (lo | (hi << np.uint32(16))).view(np.int32)
    scores = (
        np.ascontiguousarray(w[:, 2 * k :])
        .view(ml_dtypes.bfloat16)
        .astype(np.float32)
    )
    return scores, ids


def blocked_search(
    state: BlockScanState,
    engine,  # QueryEngine — probing params + tile geometry
    queries: np.ndarray,  # (B, d) f32
    threshold: float,
    fetch_k: int,
    k: int,
    block_q: int = 256,
    margin: int | None = None,
    interpret: bool | None = None,
    sel_rows: int = 128,
    wire: str = "pack32",  # result D2H format: 'pack32' | 'f32' | 'bf16'
):
    """(scores (B,k), ids (B,k), nprobe, ndis) — two device round trips,
    deduplicated to k distinct neighbors on device.

    `sel_rows` < 128 selects round-2 candidates at sub-tile granularity
    (32/64-row groups): the exact rescore then gathers 128/sel_rows× fewer
    HBM bytes per query at the cost of a wider selection top-k — the
    measured trade is workload-dependent (see scripts/sel_rows_bench.py)."""
    import os
    import time as _time

    timing = os.environ.get("LIRA_BLOCKED_TIMING") == "1"
    marks = [("start", _time.perf_counter())]

    def mark(name):
        if timing:
            marks.append((name, _time.perf_counter()))

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    margin = _resolve_margin(margin, state.scan_dtype, sel_rows)
    precision = "default" if state.scan_dtype == jnp.bfloat16 else "highest"
    B, d = np.asarray(queries).shape
    h = _probe_batch(state, engine, queries, threshold, block_q, use_cache=True)
    qb = h["qb"]
    mark("q_upload")
    union = np.asarray(h["union"])  # (n_blocks, n_bkt) — tens of KB
    nprobe = np.asarray(h["nprobe"])[:B]
    ndis = np.asarray(h["ndis"])[:B]
    mark("probe+union_sync")

    supers, tb, ulen = build_block_unions(
        union, engine.tile_start, engine.tiles_per_bucket, state.tile_bucket
    )
    mark("host_unions")
    kg = fetch_k + margin
    sub = _round2_sub(kg, sel_rows, d, qb)
    scores, ids = _scan_all(
        h["q"], h["probed"], h["perm"], jnp.asarray(supers), jnp.asarray(tb),
        jnp.asarray(ulen),
        state.corpus_flat, state.bsq, state.rescore_arg, state.tiles_ids,
        state.tile_pad_count,
        metric=engine.metric, kg=kg, fetch_k=fetch_k, k=k, qb=qb,
        precision=precision, interpret=interpret, sub=sub, sel_rows=sel_rows,
        dim_scale=state.dim_scale,
    )
    if wire == "f32":
        s_np, i_np = np.asarray(scores[:B]), np.asarray(ids[:B])
    else:
        # one packed transfer of the full padded batch (slicing on device
        # would allocate a fresh buffer; the ≤qb pad rows are cheaper)
        s_np, i_np = _wire_unpack(
            np.asarray(_wire_pack(scores, ids, wire=wire))[:B], wire
        )
    out = (s_np, i_np, nprobe.astype(np.int64), ndis.astype(np.int64))
    mark("scan+result_sync")
    if timing:
        parts = ", ".join(
            f"{name} {1e3 * (t - marks[i][1]):.0f}ms"
            for i, (name, t) in enumerate(marks[1:])
        )
        print(f"[blocked_search B={B} U={supers.shape}] {parts}", flush=True)
    return out


def blocked_search_stream(
    state: BlockScanState,
    engine,
    queries: np.ndarray,  # (B_total, d) f32 — split into batches internally
    threshold: float,
    fetch_k: int,
    k: int,
    batch_size: int = 65536,
    block_q: int = 256,
    margin: int | None = None,
    interpret: bool | None = None,
    sel_rows: int = 128,
    wire: str = "pack32",  # result D2H format: 'pack32' | 'f32' | 'bf16'
):
    """Pipelined multi-batch blocked search (same results as per-batch
    `blocked_search`, concatenated).

    `blocked_search` alternates host and device work: fetch the probe's
    union masks, build supertile unions on the host, dispatch the scan,
    fetch results — the device idles through every host round trip
    (measured ~0.2 s/batch of probe+union sync on a tunneled host,
    docs/serving_design.md phase breakdown).  This driver keeps TWO batches
    in flight: batch i+1's probe program is dispatched right after batch
    i's scan, so it runs on device while the host is still waiting on /
    processing batch i — by the time the host needs batch i+1's unions they
    are already computed, and batch i's results are fetched last, after
    both of batch i+1's programs are queued.  Device programs stay
    identical to the sequential path; only the dispatch order changes, so
    exactness is preserved batch by batch.

    The next batch's probe is dispatched from a single worker thread: on a
    tunneled host the query H2D inside `jnp.asarray` blocks the CALLING
    thread for the whole transfer (measured ~0.5 s per 65k×128 batch at
    ~70 MB/s), so dispatching it inline would serialize the upload with
    every other phase — threading it overlaps batch i+1's upload with
    batch i's union wait + scan.  JAX dispatch is thread-safe; probe and
    scan programs are independent across batches, so device-order
    nondeterminism between probe_{i+1} and scan_i cannot change results.
    """
    from concurrent.futures import ThreadPoolExecutor
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    margin = _resolve_margin(margin, state.scan_dtype, sel_rows)
    precision = "default" if state.scan_dtype == jnp.bfloat16 else "highest"
    queries = np.asarray(queries, np.float32)
    B_total, d = queries.shape
    n_bkt = engine.layout.n_bkt
    kg = fetch_k + margin
    starts = list(range(0, B_total, batch_size))

    def dispatch_probe(qs: np.ndarray) -> dict:
        # fresh upload per batch (no cross-call cache: every batch differs)
        return _probe_batch(state, engine, qs, threshold, block_q)

    def dispatch_scan(h: dict):
        """Host union build + launch the batch's scan program (async).
        Blocks only on the (tiny) union mask transfer."""
        union = np.asarray(h["union"])
        # probe is done by here — start the nprobe/ndis D2H now so collect()
        # never blocks on them (numpy already under a pluggable prober)
        for key in ("nprobe", "ndis"):
            if hasattr(h[key], "copy_to_host_async"):
                h[key].copy_to_host_async()
        supers, tb, ulen = build_block_unions(
            union, engine.tile_start, engine.tiles_per_bucket, state.tile_bucket
        )
        sub = _round2_sub(kg, sel_rows, d, h["qb"])
        scores, ids = _scan_all(
            h["q"], h["probed"], h["perm"], jnp.asarray(supers), jnp.asarray(tb),
            jnp.asarray(ulen),
            state.corpus_flat, state.bsq, state.rescore_arg, state.tiles_ids,
            state.tile_pad_count,
            metric=engine.metric, kg=kg, fetch_k=fetch_k, k=k, qb=h["qb"],
            precision=precision, interpret=interpret, sub=sub, sel_rows=sel_rows,
            dim_scale=state.dim_scale,
        )
        if wire != "f32":
            return (_wire_pack(scores, ids, wire=wire),)
        return scores, ids

    out_scores, out_ids, out_np, out_nd = [], [], [], []

    def start_fetch(scan_out):
        """Kick off the result D2H as soon as the scan is dispatched, so the
        transfer overlaps the NEXT batch's device work instead of starting
        only when collect() blocks on it.  Fetch the FULL padded arrays —
        slicing [:B] on device would allocate a fresh buffer whose transfer
        cannot start until collect; the ≤qb pad rows cost less than the
        serialization (this rig's d2h measures ~35 MB/s)."""
        for a in scan_out:
            a.copy_to_host_async()

    def collect(h, scan_out):
        B = h["B"]
        if wire != "f32":
            s_np, i_np = _wire_unpack(np.asarray(scan_out[0])[:B], wire)
        else:
            scores, ids = scan_out
            s_np, i_np = np.asarray(scores)[:B], np.asarray(ids)[:B]
        out_scores.append(s_np)
        out_ids.append(i_np)
        out_np.append(np.asarray(h["nprobe"])[:B].astype(np.int64))
        out_nd.append(np.asarray(h["ndis"])[:B].astype(np.int64))

    # steady state: probe_{i+1} (upload + program) runs on the worker thread
    # while the main thread waits on batch i's union masks, dispatches its
    # scan, and drains batch i-1's result transfer
    import os as _os
    import time as _time

    timing = _os.environ.get("LIRA_BLOCKED_TIMING") == "1"

    def _mark(label, t0):
        if timing:
            print(f"[stream {label}] {1e3 * (_time.perf_counter() - t0):.0f}ms",
                  flush=True)

    prev = None  # (handle, scan_out) of the batch whose results are unfetched
    pool = ThreadPoolExecutor(max_workers=1)
    try:
        t0 = _time.perf_counter()
        fut_cur = pool.submit(
            dispatch_probe, queries[starts[0] : starts[0] + batch_size]
        )
        for i, s in enumerate(starts):
            fut_next = (
                pool.submit(
                    dispatch_probe,
                    queries[starts[i + 1] : starts[i + 1] + batch_size],
                )
                if i + 1 < len(starts) else None
            )
            h_cur = fut_cur.result()
            _mark(f"probe_ready b{i}", t0)
            t0 = _time.perf_counter()
            scan_out = dispatch_scan(h_cur)
            start_fetch(scan_out)
            _mark(f"union_sync+scan_dispatch b{i}", t0)
            if prev is not None:
                t0 = _time.perf_counter()
                collect(*prev)  # device is already past it — pure D2H
                _mark(f"collect b{i - 1}", t0)
            prev = (h_cur, scan_out)
            fut_cur = fut_next
            t0 = _time.perf_counter()
        t0 = _time.perf_counter()
        collect(*prev)
        _mark(f"collect b{len(starts) - 1}", t0)
    finally:
        pool.shutdown(wait=True)
    return (
        np.concatenate(out_scores),
        np.concatenate(out_ids),
        np.concatenate(out_np),
        np.concatenate(out_nd),
    )
