"""Fused Pallas serving scan: per-query probed-tile streaming at HBM speed.

The serving hot loop (engine/serve.py step 4) as a hand-written TPU kernel.
For each query, its probed buckets' 128-row tiles are streamed from the
HBM-resident bucket-contiguous corpus with double-buffered async DMA; each
tile's distances are computed on the MXU and folded into an exact running
top-k kept as a *per-lane sorted stack* in VMEM:

  * the stack holds R=⌈k/1⌉ rows × 128 lanes, each lane column sorted
    ascending; a bubble-insertion pass per tile keeps every lane's R best
    candidates — since a lane sees one candidate per tile, per-lane top-R
    with R=k is exact even if all k global bests land in one lane;
  * no sorts, no wide top_k inside the kernel: R compare/select passes per
    tile on the VPU;
  * the final (R·128)-candidate exact top-k runs outside in XLA (tiny).

Tile indices arrive via scalar prefetch so the DMA address computation
happens before the kernel body (pltpu.PrefetchScalarGridSpec).  Queries are
grid-major; tile slots are the inner grid dimension; slot −1 = no tile.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scan_kernel(
    # scalar prefetch
    tile_idx_ref,  # (B, T) int32 in SMEM
    # inputs
    q_ref,  # (1, 8, d) VMEM — this query's vector (sublane-replicated)
    corpus_ref,  # (n_tiles, 128, d) HBM
    corpus_ids_ref,  # (n_tiles, 128) HBM (int32)
    corpus_sq_ref,  # (n_tiles, 128) HBM (f32; +big at padding)
    # outputs
    out_vals_ref,  # (1, R_pad, 128) VMEM
    out_ids_ref,  # (1, R_pad, 128) VMEM (int32)
    # scratch
    vec_buf,  # (2, 128, d) VMEM
    ids_buf,  # (2, 1, 128) VMEM int32
    sq_buf,  # (2, 1, 128) VMEM f32
    stack_vals,  # (R, 128) VMEM f32
    stack_ids,  # (R, 128) VMEM int32
    sems,  # DMA semaphores (3, 2)
    *,
    n_slots: int,
    r_rows: int,
    metric: str,
    double_buffer: bool = True,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    big = jnp.float32(3e38)

    def start_dma(slot, tile):
        tile = jnp.maximum(tile, 0)
        pltpu.make_async_copy(corpus_ref.at[tile], vec_buf.at[slot], sems.at[0, slot]).start()
        pltpu.make_async_copy(
            corpus_ids_ref.at[pl.ds(tile, 1)], ids_buf.at[slot], sems.at[1, slot]
        ).start()
        pltpu.make_async_copy(
            corpus_sq_ref.at[pl.ds(tile, 1)], sq_buf.at[slot], sems.at[2, slot]
        ).start()

    def wait_dma(slot, tile):
        tile = jnp.maximum(tile, 0)
        pltpu.make_async_copy(corpus_ref.at[tile], vec_buf.at[slot], sems.at[0, slot]).wait()
        pltpu.make_async_copy(
            corpus_ids_ref.at[pl.ds(tile, 1)], ids_buf.at[slot], sems.at[1, slot]
        ).wait()
        pltpu.make_async_copy(
            corpus_sq_ref.at[pl.ds(tile, 1)], sq_buf.at[slot], sems.at[2, slot]
        ).wait()

    cur_tile = tile_idx_ref[b, t]
    if double_buffer:
        # first step of each query: reset the stack and warm the pipeline
        @pl.when(t == 0)
        def _():
            stack_vals[...] = jnp.full_like(stack_vals, big)
            stack_ids[...] = jnp.full_like(stack_ids, -1)
            start_dma(0, tile_idx_ref[b, 0])

        slot = jax.lax.rem(t, 2)

        # prefetch the next slot while computing this one
        @pl.when(t + 1 < n_slots)
        def _():
            start_dma(1 - slot, tile_idx_ref[b, t + 1])

        wait_dma(slot, cur_tile)
    else:
        @pl.when(t == 0)
        def _():
            stack_vals[...] = jnp.full_like(stack_vals, big)
            stack_ids[...] = jnp.full_like(stack_ids, -1)

        slot = jnp.int32(0)
        start_dma(slot, cur_tile)
        wait_dma(slot, cur_tile)

    @pl.when(cur_tile >= 0)
    def _():
        vec = vec_buf[slot]  # (128, d)
        # (8, d) × (128, d)ᵀ → (8, 128): the query block is sublane-replicated,
        # so this is a well-tiled MXU shape (a 1-wide GEMV miscompiled under
        # Mosaic — wrong scores on ~5% of rows; see tests/test_pallas_scan.py)
        dot8 = jax.lax.dot_general(
            q_ref[0], vec,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision="highest",  # Mosaic defaults f32 dots to bf16 passes,
            preferred_element_type=jnp.float32,  # which reorders near-ties
        )  # (8, 128)
        dot = dot8[0]
        if metric == "inner_product":
            score = -dot + sq_buf[slot][0]
        else:
            score = sq_buf[slot][0] - 2.0 * dot
        ids = ids_buf[slot][0]
        score = jnp.where(ids >= 0, score, big)

        # bubble-insert the new candidates into the per-lane sorted stacks:
        # one pass keeps each lane ascending because the stack was sorted
        cur_v, cur_i = score[None, :], ids[None, :]
        for r in range(r_rows):
            old_v, old_i = stack_vals[r][None, :], stack_ids[r][None, :]
            take_new = cur_v < old_v
            stack_vals[r] = jnp.where(take_new, cur_v, old_v)[0]
            stack_ids[r] = jnp.where(take_new, cur_i, old_i)[0]
            cur_v = jnp.where(take_new, old_v, cur_v)
            cur_i = jnp.where(take_new, old_i, cur_i)

    # last step: emit the stacks
    @pl.when(t == n_slots - 1)
    def _():
        out_vals_ref[0] = stack_vals[...]
        out_ids_ref[0] = stack_ids[...]


def pallas_probed_scan(
    q: jax.Array,
    tile_idx: jax.Array,
    corpus: jax.Array,
    corpus_ids: jax.Array,
    corpus_sq: jax.Array,
    k: int,
    metric: str = "L2",
    interpret: bool = False,
    double_buffer: bool = True,
    smem_budget: int = 1 << 18,  # scalar-prefetch operand must fit SMEM (1 MiB,
    # shared with grid control state — keep a wide margin)
):
    """(scores (B, k), ids (B, k)) — exact top-k over each query's probed tiles.

    The tile-index matrix is a scalar-prefetch operand and must fit in SMEM;
    large batches are processed in sub-batches transparently.
    """
    if k > 128:
        # per-lane exactness requires a full k-deep stack per lane; r_rows is
        # capped at 128, so k > 128 would silently drop candidates that hash
        # to an overfull lane.  Callers (engine/serve.py) fall back to the
        # XLA scan for such fetch widths.
        raise ValueError(f"pallas_probed_scan supports k <= 128 (got k={k})")
    B, T = tile_idx.shape
    max_b = max(8, smem_budget // max(T * 4, 1))
    if B > max_b:
        outs = [
            _pallas_probed_scan(
                q[s : s + max_b], tile_idx[s : s + max_b], corpus, corpus_ids,
                corpus_sq, k, metric, interpret, double_buffer,
            )
            for s in range(0, B, max_b)
        ]
        return (
            jnp.concatenate([o[0] for o in outs]),
            jnp.concatenate([o[1] for o in outs]),
        )
    return _pallas_probed_scan(
        q, tile_idx, corpus, corpus_ids, corpus_sq, k, metric, interpret, double_buffer
    )


@partial(jax.jit, static_argnames=("k", "metric", "interpret", "double_buffer"))
def _pallas_probed_scan(
    q: jax.Array,  # (B, d)
    tile_idx: jax.Array,  # (B, T) int32, -1 = no tile
    corpus: jax.Array,  # (n_tiles, 128, d)
    corpus_ids: jax.Array,  # (n_tiles, 128) int32
    corpus_sq: jax.Array,  # (n_tiles, 128) f32 (big value at padding)
    k: int,
    metric: str = "L2",
    interpret: bool = False,
    double_buffer: bool = True,
):
    B, T = tile_idx.shape
    d = q.shape[1]
    r_rows = min(k, 128)
    r_pad = ((r_rows + 7) // 8) * 8  # TPU block alignment: sublane dim % 8

    # queries replicated over 8 sublanes so the (1, 8, d) block is legal
    q_rep = jnp.broadcast_to(q[:, None, :], (B, 8, d))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, 8, d), lambda b, t, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, r_pad, 128), lambda b, t, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_pad, 128), lambda b, t, *_: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 128, d), jnp.float32),
            pltpu.VMEM((2, 1, 128), jnp.int32),
            pltpu.VMEM((2, 1, 128), jnp.float32),
            pltpu.VMEM((r_pad, 128), jnp.float32),
            pltpu.VMEM((r_pad, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((3, 2)),
        ],
    )
    kernel = partial(
        _scan_kernel, n_slots=T, r_rows=r_rows, metric=metric, double_buffer=double_buffer
    )
    vals, ids = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, r_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, r_pad, 128), jnp.int32),
        ],
        interpret=interpret,
    )(tile_idx, q_rep, corpus, corpus_ids, corpus_sq)

    # final exact top-k over the R·128 candidates (tiny, XLA)
    vals = vals.reshape(B, r_pad * 128)
    ids = ids.reshape(B, r_pad * 128)
    neg, sel = jax.lax.top_k(-vals, k)
    out_ids = jnp.take_along_axis(ids, sel, axis=1)
    out_ids = jnp.where(jnp.isfinite(-neg) & (-neg < 1e37), out_ids, -1)
    return -neg, out_ids
