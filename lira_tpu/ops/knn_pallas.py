"""Fused two-round exact kNN: Pallas group-min sweep + tile rescan.

The XLA brute-force path (ops/knn.py) is bound by materializing the
(Q, n) score matrix in HBM (written + read twice per corpus pass).  This
module never materializes it:

  Round 1 — Pallas kernel: stream corpus chunks through VMEM, compute the
  MXU distance block, and emit only the per-128-row-group minimum
  (group = corpus tile).  Output is (Q, n/128) — 128× smaller than scores.
  Any group containing a true top-k element has group-min ≤ the k-th best
  value, and at most k groups can — so the top-(k+margin) groups by min
  contain the exact answer (see ops/topk.py).

  Round 2 — XLA: gather the selected groups as whole 128-row tiles
  (tile-granular gathers run at full HBM bandwidth, unlike row gathers),
  recompute their scores at high precision, exact top-k.

Round 1 may run the matmul at bf16 input precision ("fast" mode) or on a
symmetric per-dim int8 quantization of the corpus ("int8": ¼ the sweep's
HBM bytes, int32 MXU accumulation — the serving engine's screen
formulation, engine/block_scan.py): the selection margin absorbs the
rounding/quantization of the group mins, and round 2 re-ranks at f32 —
misses are possible only when > margin groups have approximate mins
within error of the k-th value.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _groupmin_kernel(q_ref, chunk_ref, bsq_ref, *rest, precision, metric,
                     quantized=False):
    """One (q_block × corpus-chunk) step: distance block → per-tile min.

    The group-min matrix is emitted *transposed* — (n_groups, Q) — so each
    step's (16, q_block) output block satisfies the TPU (8, 128) block
    alignment (a (q_block, 16) block would put 16 in the lane dimension).

    quantized=True: q/chunk arrive int8 (per-dim corpus scale folded into
    the query, engine/block_scan._screen_rescore's formulation), the dot
    accumulates int32 on the MXU, and `rest` carries one extra SMEM scalar
    — the dequantization factor t (×2 for L2).
    """
    if quantized:
        t_ref, out_ref = rest
        doti = jax.lax.dot_general(
            q_ref[...], chunk_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (QB, CB)
        dot = t_ref[0, 0] * doti.astype(jnp.float32)
        qb, cb = dot.shape
        scores = bsq_ref[...].reshape(cb)[None, :] - dot
    else:
        (out_ref,) = rest
        dot = jax.lax.dot_general(
            q_ref[...], chunk_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32,
        )  # (QB, CB)
        qb, cb = dot.shape
        if metric == "inner_product":
            scores = bsq_ref[...].reshape(cb)[None, :] - dot
        else:
            scores = bsq_ref[...].reshape(cb)[None, :] - 2.0 * dot
    gmin = scores.reshape(qb, cb // 128, 128).min(axis=-1)  # (QB, 16)
    out_ref[...] = gmin.T


@partial(jax.jit, static_argnames=("metric", "kg", "q_block", "c_block", "precision", "interpret"))
def _round1_select(
    q: jax.Array,  # (Q, d) — f32, or int8 when t is given
    base: jax.Array,  # (n_pad, d) — f32, or int8 when t is given
    base_sq: jax.Array,  # (n_groups, 128) norms (or penalty)
    metric: str,
    kg: int,
    q_block: int = 512,
    c_block: int = 2048,
    precision: str = "default",
    interpret: bool = False,
    t: jax.Array | None = None,  # (1, 1) f32 — int8 dequantization scalar
) -> jax.Array:
    """(Q, kg) int32 — per query, the kg tiles guaranteed* to hold its top-k."""
    Q, d = q.shape
    n_pad = base.shape[0]
    n_groups = n_pad // 128
    quantized = t is not None
    if precision not in ("default", "highest"):
        precision = "highest"  # Mosaic's dot lowering supports only these two

    in_specs = [
        pl.BlockSpec((q_block, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c_block, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c_block // 128, 128), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
    ]
    operands = [q, base, base_sq]
    if quantized:
        in_specs.append(
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
        )
        operands.append(t)
    gmin_t = pl.pallas_call(
        partial(_groupmin_kernel, precision=precision, metric=metric,
                quantized=quantized),
        grid=(Q // q_block, n_pad // c_block),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (c_block // 128, q_block), lambda i, j: (j, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_groups, Q), jnp.float32),
        interpret=interpret,
    )(*operands)

    _, gsel = jax.lax.top_k(-gmin_t.T, min(kg, n_groups))
    return gsel.astype(jnp.int32)


@partial(jax.jit, static_argnames=("metric", "k", "sub"))
def _round2_rescan(
    q: jax.Array,  # (Q, d)
    gsel: jax.Array,  # (Q, kg) tile ids
    base_p: jax.Array,  # (n_pad, d) padded corpus, n_pad a multiple of 128
    tiles_sq: jax.Array,  # (n_tiles, 128)
    metric: str,
    k: int,
    sub: int = 1024,
):
    """Exact top-k among the selected tiles' members (full f32).

    Takes the FLAT padded corpus and reshapes to (n_tiles, 128, d) inside
    the traced program — a contiguous reshape XLA aliases for free.  An
    eager `base_p.reshape(...)` at the call site materializes a SECOND
    full corpus copy in HBM (3.84 GB at 1M×960: the allocation that,
    stacked on the GT pass's buffers, pushed the GIST pipeline's self-kNN
    into RESOURCE_EXHAUSTED — logs/gist_dim_bench_r4.log)."""
    tiles = base_p.reshape(-1, 128, base_p.shape[1])
    Q, kg = gsel.shape

    def body(args):
        qs, sel = args  # (sub, d), (sub, kg)
        vec = tiles[sel]  # (sub, kg, 128, d) tile-granular gather
        dot = jnp.einsum(
            "stgd,sd->stg", vec, qs,
            precision="highest", preferred_element_type=jnp.float32,
        )
        sq = tiles_sq[sel]  # (sub, kg, 128)
        score = sq - dot if metric == "inner_product" else sq - 2.0 * dot
        flat = score.reshape(qs.shape[0], kg * 128)
        neg, pos = jax.lax.top_k(-flat, k)
        gids = (sel[:, :, None] * 128 + jnp.arange(128, dtype=jnp.int32)).reshape(
            qs.shape[0], kg * 128
        )
        ids = jnp.take_along_axis(gids, pos, axis=1)
        return -neg, ids

    n_sub = Q // sub
    scores, ids = jax.lax.map(
        body, (q.reshape(n_sub, sub, -1), gsel.reshape(n_sub, sub, kg))
    )
    return scores.reshape(Q, k), ids.reshape(Q, k)


# corpora above this f32 byte size sync each q-tile's results to host
# (see the bound_queue comment in knn_fused); module-level so tests can
# force the host-assembly path at unit scale
_QUEUE_BOUND_BYTES = 1 << 30
# how many q-tiles may be queued/in-flight ahead of the trailing host fetch
# when the bound is active: W tiles × ~0.5 GB of intermediates at 1M×960
# stays comfortably inside the post-corpus HBM headroom while overlapping
# the (tunneled) per-tile d2h fetch with the next tiles' compute
_QUEUE_WINDOW = 2


def _auto_interpret() -> bool:
    """Pallas compiles natively on TPU; elsewhere run the interpreter."""
    return jax.default_backend() != "tpu"


def _r1_blocks(d: int) -> tuple[int, int] | None:
    """(q_block, c_block) sized to the dimensionality, or None if no
    block shape fits.

    Empirical scoped-VMEM constraint, fit to compile-probes of
    `_round1_select` against the real v5e Mosaic compiler at d=960/128
    (every outcome matches):

        8·d·(q_block + c_block) + 12·q_block·c_block  ≤  15.5 MB

    First term: double-buffered f32 q + corpus-chunk operands; second:
    the (q_block, c_block) f32 score temporaries (dot output, norms
    broadcast, group-min reshape).  Probe matrix at d=960: (512,1024)
    OOM 20.21M / (256,2048) OOM 16.03M / (512,2048) OOM 16.06M /
    (128,2048) OOM 16.02M / (256,1024) and (128,1024) compile; the
    production d=128 (512, 2048) blocks (measured 84-94 TFLOPS,
    logs/kernel_micro*.log) sit at 15.2M and are preserved.  Prefer a
    large q_block (amortizes the corpus stream over more queries), then
    the largest c_block that fits.  c_block must be a multiple of 1024:
    the (c_block//128, ·) bsq/out block sublane counts must divide by 8
    (Mosaic (8, 128) block alignment).
    """
    budget = int(15.5 * 1024 * 1024)
    for q_block in (512, 256, 128):
        c_max = (budget - 8 * d * q_block) // (8 * d + 12 * q_block)
        c_block = min(2048, c_max // 1024 * 1024)
        if c_block >= 1024:
            return q_block, c_block
    return None  # d too wide for the smallest legal blocks → XLA path


@partial(jax.jit, static_argnames=("n_pad", "need_l2"))
def _pad_and_norms(base: jax.Array, n_pad: int, need_l2: bool):
    """Fused pad + row-norms for a device-resident corpus.

    One compiled program so XLA fuses the zeros/scatter/square chain —
    device peak is base + base_p, not the 3 corpus-sized transients the
    eager `zeros().at[].set()` + `sum(base*base)` sequence staged (which
    OOMed the 1M×960 GIST run before its first kernel,
    logs/gist_dim_bench_r4d.log).
    """
    n, d = base.shape
    base = base.astype(jnp.float32)
    if n_pad != n:
        base_p = jnp.zeros((n_pad, d), jnp.float32).at[:n].set(base)
    else:
        base_p = base
    penalty = jnp.where(jnp.arange(n_pad) < n, 0.0, 1e30).astype(jnp.float32)
    if need_l2:
        bsq = jnp.pad(jnp.sum(base * base, axis=1), (0, n_pad - n)) + penalty
    else:
        bsq = penalty
    return base_p, bsq.reshape(n_pad // 128, 128)


@jax.jit
def _quantize_corpus(base_p: jax.Array):
    """Symmetric per-dim int8 quantization as ONE fused program (the eager
    abs/round/clip chain materialized corpus-sized f32 temporaries)."""
    dim_scale = jnp.maximum(jnp.max(jnp.abs(base_p), axis=0), 1e-30) / 127.0
    q = jnp.clip(jnp.round(base_p / dim_scale), -127, 127).astype(jnp.int8)
    return dim_scale, q


def _r2_sub(kg: int, d: int, q_tile: int) -> int:
    """Round-2 sub-batch: the (sub, kg, 128, d) f32 gather stage must stay
    within a ~256 MB HBM budget (at d=960 the fixed sub=512 staged ~4 GB
    per sub-batch next to the corpus)."""
    budget = 256 * 1024 * 1024
    sub = budget // max(kg * 128 * d * 4, 1)
    sub = 1 << max(int(sub).bit_length() - 1, 3)  # pow2 floor, ≥ 8
    while q_tile % sub:
        sub //= 2
    return min(512, sub)


def knn_fused(
    base,  # (n, d) host or device
    query,  # (nq, d) host or device; may alias base for self-kNN
    k: int,
    metric: str = "L2",
    q_tile: int = 8192,
    margin: int | None = None,
    precision: str = "default",
    interpret: bool | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Two-round kNN. Returns (scores, ids) ranking scores as ops.knn.exact_knn.

    `precision="default"` runs the round-1 sweep at bf16 input precision
    (round 2 re-ranks at f32); "highest" is fully-f32 selection; "int8"
    quantizes the round-1 corpus to symmetric per-dim int8 (¼ the HBM
    bytes per sweep — the sweep re-reads the whole corpus once per
    512-query block, so the one-time quantization pass amortizes ~Q/512×)
    with the engine's int8-screen formulation (block_scan._screen_rescore).
    Round 2 always re-ranks at f32.  `margin=None` → 8, or 16 for int8 —
    the fused path's own offline sweep (scripts/bf16_margin_sweep.py,
    docs/bf16_screen.md) measures int8 misses at margin 4 and zero at 8,
    so 16 is that zero-miss point × 2 safety.
    """
    if interpret is None:
        interpret = _auto_interpret()
    if margin is None:
        margin = 16 if precision == "int8" else 8
    self_mode = query is base  # self-kNN: one upload, queries slice base
    host_base = not isinstance(base, jax.Array)
    n, d = np.shape(base)
    blocks = _r1_blocks(d)  # VMEM-budgeted round-1 blocks
    if blocks is None:
        # d too wide for the smallest legal Pallas blocks (> ~1.6k dims):
        # the XLA tiled exact path has no per-step VMEM ceiling
        from .knn import exact_knn

        return exact_knn(base, query, k, metric=metric)
    q_block, c_block = blocks
    n_pad = ((n + c_block - 1) // c_block) * c_block
    need_l2 = metric != "inner_product"

    if host_base:
        # Host-side pad + norms: the device only ever holds the one padded
        # table.  Padding on device staged base + zeros + the scatter
        # result (3 corpus copies ≈ 11.5 GB at 1M×960) and OOMed the chip
        # before the first kernel ran; the error then surfaced at the
        # first d2h fetch (logs/gist_dim_bench_r4d.log vs the pre-padded
        # probes logs/gist_probe_r4*.log, which ran clean).
        base_np = np.ascontiguousarray(base, dtype=np.float32)
        bsq_np = np.full(n_pad, 1e30, np.float32)
        if need_l2:
            bsq_np[:n] = np.einsum("ij,ij->i", base_np, base_np)
        else:
            bsq_np[:n] = 0.0
        if n_pad != n:
            pad_np = np.zeros((n_pad, d), np.float32)
            pad_np[:n] = base_np
            base_p = jnp.asarray(pad_np)
            del pad_np
        else:
            base_p = jnp.asarray(base_np)
        bsq_g = jnp.asarray(bsq_np.reshape(n_pad // 128, 128))
    else:
        base_p, bsq_g = _pad_and_norms(
            jnp.asarray(base, jnp.float32), n_pad=n_pad, need_l2=need_l2
        )

    kg = min(k + margin, n_pad // 128)
    if self_mode:
        # queries are slices of the padded table; nq stays the real n
        query, nq = base_p, n
    else:
        query = jnp.asarray(query, jnp.float32)
        nq = query.shape[0]
    base = None  # the padded table carries the data from here on
    q_tile = min(q_tile, max(512, nq))
    q_tile = ((q_tile + 511) // 512) * 512

    if precision == "int8":
        # one-time symmetric per-dim quantization of the sweep corpus
        # (round 2 rescans the f32 `base_p`); scale folded into each query
        # tile below with one per-tile scalar t — see _groupmin_kernel
        dim_scale, base_r1 = _quantize_corpus(base_p)
    else:
        base_r1 = base_p

    # Large corpora: bound the dispatch queue.  The q-tile loop is async —
    # JAX queues every iteration's intermediates (the (n_groups, q_tile)
    # screen output + round-2 gathers, ~0.5 GB/tile at 1M×960) ahead of
    # execution, and ~100 queued tiles next to the corpus copies exhausted
    # HBM at GIST dims (logs/gist_dim_bench4.log RESOURCE_EXHAUSTED).
    # The sync must be a HOST FETCH of the tile's (small) results, not
    # block_until_ready: on the axon remote backend block_until_ready
    # returns without waiting (measured: logs/gist_probe_r4.log — r1
    # "blocked" in 0.00 s, the first fetch then waited out the 522 s
    # compile), so an r3 attempt to bound the queue with it bounded
    # nothing and 123 queued tiles OOMed again
    # (logs/gist_dim_bench_r4b.log).  Fetching ~720 KB/tile costs ~20 ms
    # against seconds of per-tile compute at these sizes, and host-side
    # assembly also skips the final device concatenate.  The fetch runs a
    # _QUEUE_WINDOW tiles BEHIND dispatch: a fully synchronous fetch made
    # the device idle through every tunnel round trip (1M×960 warm 266 s,
    # logs/gist_selfknn_time.log), while a small window keeps ≤ W tiles of
    # queued intermediates live and overlaps tile i's fetch with tile
    # i+1..i+W's compute.
    bound_queue = n_pad * d * 4 > _QUEUE_BOUND_BYTES

    out_s, out_i = [], []
    pending = []  # (sc_dev, ids_dev, rows) not yet fetched, oldest first

    def _drain_oldest():
        sc_d, ids_d, rows = pending.pop(0)
        out_s.append(np.asarray(sc_d[:rows]))  # true sync: d2h fetch
        out_i.append(np.asarray(ids_d[:rows]))

    for s in range(0, nq, q_tile):
        e = min(s + q_tile, nq)
        qt = jnp.zeros((q_tile, d), jnp.float32).at[: e - s].set(query[s:e])
        if precision == "int8":
            qp = qt * dim_scale[None, :]
            t = jnp.maximum(jnp.max(jnp.abs(qp)) / 127.0, 1e-30)
            qt_r1 = jnp.clip(jnp.round(qp / t), -127, 127).astype(jnp.int8)
            t_eff = jnp.reshape(
                t if metric == "inner_product" else 2.0 * t, (1, 1)
            ).astype(jnp.float32)
            gsel = _round1_select(
                qt_r1, base_r1, bsq_g, metric, kg, precision="default",
                q_block=q_block, c_block=c_block, interpret=interpret, t=t_eff,
            )
        else:
            gsel = _round1_select(
                qt, base_p, bsq_g, metric, kg, precision=precision,
                q_block=q_block, c_block=c_block, interpret=interpret,
            )
        sc, ids = _round2_rescan(
            qt, gsel, base_p, bsq_g, metric, min(k, n),
            sub=_r2_sub(gsel.shape[1], d, q_tile),
        )
        if bound_queue:
            pending.append((sc, ids, e - s))
            if len(pending) > _QUEUE_WINDOW:
                _drain_oldest()
        else:
            out_s.append(sc[: e - s])
            out_i.append(ids[: e - s])
    if bound_queue:
        while pending:
            _drain_oldest()
        scores = np.concatenate(out_s)
        ids = np.concatenate(out_i)
    else:
        scores = np.asarray(jnp.concatenate(out_s))
        ids = np.asarray(jnp.concatenate(out_i))
    ids = np.where(ids < n, ids, -1)
    return scores, ids


def self_knn_fused(
    base, k: int, metric: str = "L2", q_tile: int = 8192,
    margin: int | None = None, precision: str = "default",
    interpret: bool | None = None,
) -> np.ndarray:
    """Self-kNN via the fused path; same contract as ops.knn.self_knn."""
    from .knn import drop_self

    _, ids = knn_fused(
        base, base, k + 1, metric=metric, q_tile=q_tile, margin=margin,
        precision=precision, interpret=interpret,
    )
    return drop_self(ids, k)
