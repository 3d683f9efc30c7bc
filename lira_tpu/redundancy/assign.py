"""Learning-based redundancy: duplicate boundary vectors into extra
model-chosen partitions.

Re-states the reference's per-point branch logic (mul_partition_by_model,
reference: LIRA_smallscale.py:77-97 and the batch-offset variant
LIRA_largescale.py:51-72) as one vectorized rule evaluated on-device.
Per selected point with native partition c:

    ranking   = partitions sorted by probing score, descending
                (ties: lower index first)
    n_eff     = #{partitions with score > σ}
    n_act     = min(n_mul − 1, n_eff)
    loc       = rank of c in the ranking
    row       = [c, ranking[:n_act]]        if loc ≥ n_act      (native kept)
              = [ranking[:n_act]]           if n_eff == n_act   (native inside)
              = [ranking[:n_act + 1]]       otherwise           (native inside)
    remaining slots → −1

In every branch the native partition stays a member of the row, so the
bucket layout can always be rebuilt from the assignment matrix alone.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("n_mul",))
def _redundancy_rows_jit(scores: jax.Array, predicts: jax.Array, cur: jax.Array, n_mul: int):
    n_bkt = scores.shape[1]
    m = min(n_mul, n_bkt)
    _, top = jax.lax.top_k(scores, m)  # ties -> lowest index first (stable desc)
    top = top.astype(jnp.int32)

    n_eff = jnp.sum(predicts.astype(jnp.int32), axis=1)
    n_act = jnp.minimum(n_mul - 1, n_eff)

    score_cur = jnp.take_along_axis(scores, cur[:, None].astype(jnp.int32), axis=1)[:, 0]
    col = jnp.arange(n_bkt, dtype=jnp.int32)[None, :]
    gt = jnp.sum(scores > score_cur[:, None], axis=1)
    ties_before = jnp.sum((scores == score_cur[:, None]) & (col < cur[:, None]), axis=1)
    loc = gt + ties_before  # rank of the native partition in the descending order

    slot = jnp.arange(n_mul, dtype=jnp.int32)[None, :]
    pad_top = jnp.pad(top, ((0, 0), (0, n_mul - m)), constant_values=-1)

    # branch 1: [cur, top[:n_act], -1...]
    row1 = jnp.concatenate([cur[:, None].astype(jnp.int32), pad_top[:, : n_mul - 1]], axis=1)
    keep1 = slot <= n_act[:, None]
    row1 = jnp.where(keep1, row1, -1)

    # branches 2/3: [top[:n_keep], -1...] with n_keep = n_act or n_act+1
    n_keep = jnp.where(n_eff == n_act, n_act, n_act + 1)
    row23 = jnp.where(slot < n_keep[:, None], pad_top, -1)

    is_b1 = loc >= n_act
    return jnp.where(is_b1[:, None], row1, row23)


def redundancy_rows(
    scores: np.ndarray,
    predicts: np.ndarray,
    cur: np.ndarray,
    n_mul: int,
    chunk: int = 262144,
) -> np.ndarray:
    """Vectorized replacement rows for the selected points. (n_sel, n_mul) int32."""
    n = len(scores)
    out = np.empty((n, n_mul), dtype=np.int32)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        out[s:e] = np.asarray(
            _redundancy_rows_jit(
                jnp.asarray(scores[s:e], jnp.float32),
                jnp.asarray(predicts[s:e]),
                jnp.asarray(cur[s:e], jnp.int32),
                n_mul,
            )
        )
    return out


def select_top_ratio(predicts: np.ndarray, ratio: float) -> np.ndarray:
    """Points ranked by predicted nprobe (descending, stable), top `ratio` share.

    The reference sorts all base vectors by how many partitions the model
    predicts for them and duplicates the top x% (LIRA_smallscale.py:336-342).
    Accepts either the (n, n_bkt) 0/1 predict matrix or a precomputed (n,)
    count vector (`models.train.predict_counts` — the device-reduced form).
    """
    p = np.asarray(predicts)
    nprobe = p.sum(axis=1) if p.ndim == 2 else p
    order = np.argsort(-nprobe, kind="stable")
    n_red = int(len(order) * ratio)
    return order[:n_red]


def apply_redundancy(
    data_2_bkt: np.ndarray,
    scores: np.ndarray,
    predicts: np.ndarray,
    selected: np.ndarray,
) -> np.ndarray:
    """Return a copy of the assignment matrix with the selected rows replaced.

    `scores`/`predicts` are indexed by the same global ids as `data_2_bkt`
    (pass sliced views plus matching `selected` offsets for batched
    large-scale application).
    """
    out = np.array(data_2_bkt, copy=True)
    if len(selected) == 0:
        return out
    cur = out[selected, 0]
    out[selected] = redundancy_rows(scores[selected], predicts[selected], cur, out.shape[1])
    return out


def apply_redundancy_subset(
    data_2_bkt: np.ndarray,
    sel_scores: np.ndarray,
    sel_predicts: np.ndarray,
    selected: np.ndarray,
) -> np.ndarray:
    """Like `apply_redundancy`, but `sel_scores`/`sel_predicts` carry ONLY the
    selected rows (row i describes point selected[i]) — the caller scored just
    the duplicated minority instead of materializing the full (n, n_bkt)
    matrix (~4 GB at 1M×1024)."""
    out = np.array(data_2_bkt, copy=True)
    if len(selected) == 0:
        return out
    cur = out[selected, 0]
    out[selected] = redundancy_rows(sel_scores, sel_predicts, cur, out.shape[1])
    return out
