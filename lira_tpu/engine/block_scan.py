"""Query-blocked serving scan: one DMA of each probed tile serves a whole
query block.

The per-query kernel (engine/pallas_scan.py) re-fetches every 128-row tile
once per query, capping serving at gather bandwidth.  This module is the
throughput path (reference hot loop: search.cpp:472-514, which scans
per-query serially on CPU):

  * queries are sorted by their top-probed bucket and grouped into blocks
    of `block_q`; similar queries probe overlapping buckets, so the block's
    *union* of probed tiles is far smaller than the sum;
  * round 1 — Pallas kernel over the union: supertiles (S=8 consecutive
    128-row tiles) are streamed from the flat bucket-contiguous corpus via
    scalar-prefetched indices, the (block_q, S·128) score block is computed
    on the MXU, and only the per-tile minimum is emitted (same group-min
    screen as ops/knn_pallas.py, which runs at ~2/3 of MXU peak);
  * the group-min matrix is masked by a per-(query, bucket) probed penalty
    — a query only "sees" tiles of buckets it probed, so results and recall
    match the per-query engines exactly;
  * round 2 — the top-(fetch_k+margin) tiles per query are gathered
    (tile-granular, full-bandwidth) and rescored exactly in f32 on device.

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

S_TILES = 8  # tiles per supertile: out block (8, block_q) meets f32 (8, 128) alignment

_BIG = 3e38


def _union_groupmin_kernel(sref, q_ref, chunk_ref, bsq_ref, out_ref, *, metric, precision):
    """One union supertile: (qb, d) × (S·128, d)ᵀ on the MXU → per-tile min.

    Emitted transposed (S, qb) so the output block is (8, 128)-aligned.
    """
    dot = jax.lax.dot_general(
        q_ref[...], chunk_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32,
    )  # (qb, S*128)
    qb = dot.shape[0]
    sq = bsq_ref[...].reshape(1, S_TILES * 128)
    if metric == "inner_product":
        scores = sq - dot
    else:
        scores = sq - 2.0 * dot
    out_ref[...] = scores.reshape(qb, S_TILES, 128).min(axis=-1).T


@partial(jax.jit, static_argnames=("metric", "kg", "precision", "interpret"))
def _blocked_select(
    q: jax.Array,  # (qb, d) in the round-1 corpus dtype
    supers: jax.Array,  # (U,) int32 supertile indices into the flat corpus
    tb_sel: jax.Array,  # (U*S,) int32 bucket id per union tile, -1 = invalid
    probed: jax.Array,  # (qb, n_bkt) bool probed mask
    corpus_flat: jax.Array,  # (n_super*S*128, d) bucket-contiguous corpus
    bsq: jax.Array,  # (n_super*S, 128) row penalties/norms (finite big at pad)
    metric: str,
    kg: int,
    precision: str,
    interpret: bool,
):
    """(gtile (qb, kg) int32 global tile ids, valid (qb, kg) bool)."""
    qb, d = q.shape
    U = supers.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(U,),
        in_specs=[
            pl.BlockSpec((qb, d), lambda u, sref: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (S_TILES * 128, d), lambda u, sref: (sref[u], 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((S_TILES, 128), lambda u, sref: (sref[u], 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S_TILES, qb), lambda u, sref: (u, 0), memory_space=pltpu.VMEM),
    )
    gmin_t = pl.pallas_call(
        partial(_union_groupmin_kernel, metric=metric, precision=precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((U * S_TILES, qb), jnp.float32),
        interpret=interpret,
    )(supers, q, corpus_flat, bsq)

    # per-(query, bucket) penalty expanded to union tiles by a row gather;
    # tb = -1 (padding) indexes the sentinel all-big row n_bkt
    pen_b = jnp.where(probed.T, 0.0, _BIG).astype(jnp.float32)  # (n_bkt, qb)
    pen_b = jnp.concatenate([pen_b, jnp.full((1, qb), _BIG, jnp.float32)], axis=0)
    tb = jnp.where(tb_sel >= 0, tb_sel, pen_b.shape[0] - 1)
    masked = gmin_t + pen_b[tb]  # (U*S, qb)

    vals, sel = jax.lax.top_k(-masked.T, kg)  # (qb, kg) over the union tiles
    gtile = supers[sel // S_TILES] * S_TILES + sel % S_TILES
    valid = vals > -(_BIG / 2)
    return gtile.astype(jnp.int32), valid


@partial(jax.jit, static_argnames=("metric", "fetch_k", "sub"))
def _blocked_rescan(
    q: jax.Array,  # (qb, d) f32
    gtile: jax.Array,  # (qb, kg) global tile ids
    valid: jax.Array,  # (qb, kg) bool
    corpus_flat_f32: jax.Array,  # (n_super*S*128, d) f32 corpus
    tiles_sq: jax.Array,  # (n_super*S, 128) metric-correct row norms (big at pad)
    tiles_ids: jax.Array,  # (n_super*S, 128) int32 global ids (-1 = pad)
    metric: str,
    fetch_k: int,
    sub: int = 256,
):
    """Exact f32 top-fetch_k among the selected tiles' members."""
    qb, kg = gtile.shape
    d = q.shape[1]
    tiles = corpus_flat_f32.reshape(-1, 128, d)  # free inside jit

    def body(args):
        qs, sel, val = args  # (sub, d), (sub, kg), (sub, kg)
        vec = tiles[sel]  # (sub, kg, 128, d) tile-granular gather
        dot = jnp.einsum(
            "stgd,sd->stg", vec, qs,
            precision="highest", preferred_element_type=jnp.float32,
        )
        sq = tiles_sq[sel]
        score = sq - dot if metric == "inner_product" else sq - 2.0 * dot
        ids = tiles_ids[sel]  # (sub, kg, 128)
        score = score + jnp.where(val, 0.0, _BIG)[:, :, None]
        score = jnp.where(ids >= 0, score, _BIG)
        n = qs.shape[0]
        neg, pos = jax.lax.top_k(-score.reshape(n, kg * 128), fetch_k)
        out_ids = jnp.take_along_axis(ids.reshape(n, kg * 128), pos, axis=1)
        out_ids = jnp.where(neg > -(_BIG / 2), out_ids, -1)
        return -neg, out_ids

    sub = min(sub, qb)
    if qb % sub:
        sub = qb  # tiny/unaligned blocks: one shot
    n_sub = qb // sub
    scores, ids = jax.lax.map(
        body,
        (
            q.reshape(n_sub, sub, -1),
            gtile.reshape(n_sub, sub, kg),
            valid.reshape(n_sub, sub, kg),
        ),
    )
    return scores.reshape(qb, fetch_k), ids.reshape(qb, fetch_k)


def _pow2ceil(x: int) -> int:
    return 1 << max(0, int(np.ceil(np.log2(max(x, 1)))))


class BlockScanState:
    """Device-resident round-1/round-2 corpus views for the blocked scan.

    HBM cost: one f32 corpus copy (round 2), plus a bf16 copy when
    scan_dtype is bfloat16 (round 1) — 1.0× / 1.5× the corpus.  All other
    state (norms, ids, bucket map) is O(n/128 · 128 · 8 B).
    """

    def __init__(self, padded_host, padded_ids, tile_bucket, metric, scan_dtype, tile=128):
        """padded_host: (padded_total, d) f32 host array (layout.gather_vectors);
        padded_ids: (padded_total,) int32 global ids, -1 = padding."""
        n_rows, d = padded_host.shape
        n_tiles = n_rows // tile
        n_super = max(1, -(-n_tiles // S_TILES))
        pad_rows = n_super * S_TILES * tile - n_rows

        ids = np.asarray(padded_ids, np.int32)
        if pad_rows:
            padded_host = np.concatenate(
                [padded_host, np.zeros((pad_rows, d), np.float32)]
            )
            ids = np.concatenate([ids, np.full(pad_rows, -1, np.int32)])

        self.corpus_flat_f32 = jnp.asarray(padded_host, jnp.float32)
        if scan_dtype == jnp.bfloat16:
            self.corpus_flat = self.corpus_flat_f32.astype(jnp.bfloat16)
        else:
            self.corpus_flat = self.corpus_flat_f32

        if metric == "inner_product":
            sq = np.where(ids >= 0, 0.0, _BIG).astype(np.float32)
        else:
            from ..ops.distance import row_sqnorms

            sq = np.where(ids >= 0, row_sqnorms(padded_host), _BIG).astype(np.float32)
        self.bsq = jnp.asarray(sq.reshape(n_super * S_TILES, tile))
        self.tiles_ids = jnp.asarray(ids.reshape(n_super * S_TILES, tile))

        tb = np.asarray(tile_bucket, np.int32)
        pad_tiles = n_super * S_TILES - len(tb)
        self.tile_bucket = (
            np.concatenate([tb, np.full(pad_tiles, -1, np.int32)]) if pad_tiles else tb
        )
        self.n_super = n_super
        self.scan_dtype = scan_dtype

    def union_supertiles(self, probed_any: np.ndarray, tile_start, tiles_per_bucket):
        """Sorted unique supertile indices covering a block's probed buckets."""
        bs = np.nonzero(probed_any)[0]
        reps = tiles_per_bucket[bs]
        total = int(reps.sum())
        if total == 0:
            return np.zeros(0, dtype=np.int32)
        starts_rep = np.repeat(tile_start[bs], reps)
        cum = np.cumsum(reps) - reps
        within = np.arange(total, dtype=np.int64) - np.repeat(cum, reps)
        tiles_flat = starts_rep + within
        return np.unique(tiles_flat // S_TILES).astype(np.int32)


def blocked_search(
    state: BlockScanState,
    q: np.ndarray,  # (B, d) f32 queries
    probed: np.ndarray,  # (B, n_bkt) bool
    top1: np.ndarray,  # (B,) top-probed bucket per query (grouping key)
    tile_start: np.ndarray,
    tiles_per_bucket: np.ndarray,
    fetch_k: int,
    metric: str,
    block_q: int = 256,
    margin: int | None = None,
    interpret: bool | None = None,
):
    """(scores (B, fetch_k), ids (B, fetch_k)) over all query blocks."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if margin is None:
        margin = 16 if state.scan_dtype == jnp.bfloat16 else 8
    precision = "default" if state.scan_dtype == jnp.bfloat16 else "highest"
    B, d = q.shape
    block_q = max(8, min(block_q, _pow2ceil(B)))

    order = np.argsort(top1, kind="stable")
    out_ids = np.full((B, fetch_k), -1, np.int32)
    out_scores = np.full((B, fetch_k), np.inf, np.float32)

    for s in range(0, B, block_q):
        sel = order[s : s + block_q]
        nsel = len(sel)
        probed_blk = probed[sel]
        supers = state.union_supertiles(probed_blk.any(axis=0), tile_start, tiles_per_bucket)
        U = max(1, _pow2ceil(len(supers)))
        supers_p = np.zeros(U, np.int32)
        supers_p[: len(supers)] = supers
        tb_sel = np.full(U * S_TILES, -1, np.int32)
        if len(supers):
            real = (supers[:, None] * S_TILES + np.arange(S_TILES)[None, :]).reshape(-1)
            tb_sel[: len(real)] = state.tile_bucket[real]

        if nsel < block_q:  # pad the tail block (padded queries probe nothing)
            q_blk = np.zeros((block_q, d), np.float32)
            q_blk[:nsel] = q[sel]
            p_blk = np.zeros((block_q, probed.shape[1]), bool)
            p_blk[:nsel] = probed_blk
        else:
            q_blk, p_blk = q[sel], probed_blk

        kg = min(fetch_k + margin, U * S_TILES)
        q_dev = jnp.asarray(q_blk).astype(state.scan_dtype)
        gtile, valid = _blocked_select(
            q_dev, jnp.asarray(supers_p), jnp.asarray(tb_sel), jnp.asarray(p_blk),
            state.corpus_flat, state.bsq, metric, kg, precision, interpret,
        )
        sc, ids = _blocked_rescan(
            jnp.asarray(q_blk), gtile, valid, state.corpus_flat_f32, state.bsq,
            state.tiles_ids, metric, fetch_k,
        )
        out_ids[sel] = np.asarray(ids[:nsel])
        out_scores[sel] = np.asarray(sc[:nsel])
    return out_scores, out_ids
