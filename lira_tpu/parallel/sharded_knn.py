"""Multi-chip brute-force kNN: corpus sharded over the mesh.

The pod-scale form of the offline kNN labeler (BIGANN-100M never fits one
chip's HBM): each device keeps a corpus shard and *streams* it in
`c_block`-row chunks — per chunk, an MXU score block, a group-min screen and
an exact within-chunk top-k folded into a running (Q, k) result (the
lax.scan formulation of ops/knn.py:_knn_query_tile).  The full (Q, n_local)
score matrix is never materialized: peak per-device live memory is the
shard itself plus Q × c_block scores (bounded by `score_budget` bytes) —
at 100M rows / 8 devices / Q=4096 the old dense form needed ~200 GB/device,
this needs the 6.4 GB shard + 256 MB of scores.  Per-shard top-k results
are all_gather'ed over ICI and re-merged — identical results to the
single-device kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _local_knn(q, shard, shard_sq, k: int, metric: str, axis: str, c_block: int):
    """Per-device exact kNN against the local corpus shard + global merge."""
    shard, shard_sq = shard[0], shard_sq[0]  # squeeze the device axis
    n_local, d = shard.shape
    n_chunks = n_local // c_block
    Q = q.shape[0]
    g = c_block // 128
    kg = min(k + 2, g)  # groups guaranteed to hold the chunk top-k (ops/topk.py)
    k_loc = min(k, n_local)

    def body(carry, i):
        best_neg, best_idx = carry
        chunk = jax.lax.dynamic_slice_in_dim(shard, i * c_block, c_block, axis=0)
        csq = jax.lax.dynamic_slice_in_dim(shard_sq, i * c_block, c_block)
        dot = jax.lax.dot_general(
            q, chunk, dimension_numbers=(((1,), (1,)), ((), ())),
            precision="highest", preferred_element_type=jnp.float32,
        )  # (Q, c_block) — the only score block live at a time
        if metric == "inner_product":
            scores = csq[None, :] - dot
        else:
            scores = csq[None, :] - 2.0 * dot
        grouped = scores.reshape(Q, g, 128)
        gmin = grouped.min(axis=-1)
        _, gsel = jax.lax.top_k(-gmin, kg)
        sub = jnp.take_along_axis(grouped, gsel[:, :, None], axis=1)  # (Q, kg, 128)
        neg, pos = jax.lax.top_k(-sub.reshape(Q, kg * 128), min(k_loc, kg * 128))
        lidx = (gsel[:, :, None] * 128 + jnp.arange(128, dtype=jnp.int32)).reshape(Q, -1)
        idx = jnp.take_along_axis(lidx, pos, axis=1) + i * c_block
        merged_neg = jnp.concatenate([best_neg, neg], axis=1)
        merged_idx = jnp.concatenate([best_idx, idx], axis=1)
        new_neg, sel = jax.lax.top_k(merged_neg, k_loc)
        return (new_neg, jnp.take_along_axis(merged_idx, sel, axis=1)), None

    init = (
        jnp.full((Q, k_loc), -jnp.inf, jnp.float32),
        jnp.full((Q, k_loc), -1, jnp.int32),
    )
    (neg, ids_local), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    if k_loc < k:  # shard smaller than k: pad so the cross-shard merge is k-wide
        pad = k - k_loc
        neg = jnp.concatenate([neg, jnp.full((Q, pad), -jnp.inf, jnp.float32)], axis=1)
        ids_local = jnp.concatenate([ids_local, jnp.full((Q, pad), -1, jnp.int32)], axis=1)

    # map to global ids: shard s owns rows [s*n_local, (s+1)*n_local)
    shard_id = jax.lax.axis_index(axis)
    ids_global = jnp.where(ids_local >= 0, ids_local + shard_id * n_local, -1)

    # merge over ICI
    all_neg = jax.lax.all_gather(neg, axis)  # (n_dev, Q, k)
    all_ids = jax.lax.all_gather(ids_global, axis)
    n_dev = all_neg.shape[0]
    flat_neg = jnp.moveaxis(all_neg, 0, 1).reshape(Q, n_dev * k)
    flat_ids = jnp.moveaxis(all_ids, 0, 1).reshape(Q, n_dev * k)
    best_neg, sel = jax.lax.top_k(flat_neg, k)
    return -best_neg, jnp.take_along_axis(flat_ids, sel, axis=1)


def sharded_exact_knn(
    base: np.ndarray,
    query: np.ndarray,
    k: int,
    mesh: Mesh,
    metric: str = "L2",
    axis: str = "data",
    q_tile: int = 4096,
    score_budget: int = 1 << 28,  # max bytes of (q_tile, c_block) scores live
) -> tuple[np.ndarray, np.ndarray]:
    """Exact kNN with the corpus row-sharded across the mesh.

    Returns (scores, ids) like ops.knn.exact_knn.  Rows are padded per shard
    to a multiple of the streaming chunk; padding carries a large penalty.
    `score_budget` caps the per-device live score block (q_tile × c_block ×
    4 B ≤ budget) so the HBM model at 100M rows / 8 devices is
    shard (6.4 GB @128d) + scores (≤256 MB) + queries, independent of n.
    """
    n_dev = mesh.devices.size
    base = np.asarray(base, dtype=np.float32)
    n, d = base.shape
    q_tile = min(q_tile, max(8, len(query)))

    # chunk size: multiple of 128, bounded by the score budget
    c_block = max(128, min(1 << 17, (score_budget // (q_tile * 4)) // 128 * 128))
    per_raw = (n + n_dev - 1) // n_dev
    per = ((per_raw + c_block - 1) // c_block) * c_block
    n_pad = per * n_dev
    base_p = np.zeros((n_pad, d), np.float32)
    base_p[:n] = base
    penalty = np.where(np.arange(n_pad) < n, 0.0, 1e30).astype(np.float32)
    if metric == "inner_product":
        bsq = penalty
    else:
        bsq = (base_p * base_p).sum(axis=1).astype(np.float32) + penalty

    shard = NamedSharding(mesh, P(axis))
    base_dev = jax.device_put(jnp.asarray(base_p.reshape(n_dev, per, d)), shard)
    bsq_dev = jax.device_put(jnp.asarray(bsq.reshape(n_dev, per)), shard)

    fn = jax.jit(
        jax.shard_map(
            partial(_local_knn, k=k, metric=metric, axis=axis, c_block=min(c_block, per)),
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )

    nq = len(query)
    out_s = np.empty((nq, k), np.float32)
    out_i = np.empty((nq, k), np.int32)
    query = np.asarray(query, dtype=np.float32)
    for s in range(0, nq, q_tile):
        e = min(s + q_tile, nq)
        qt = np.zeros((min(q_tile, max(8, e - s)), d), np.float32)
        qt[: e - s] = query[s:e]
        sc, ids = fn(jnp.asarray(qt), base_dev, bsq_dev)
        out_s[s:e] = np.asarray(sc[: e - s])
        out_i[s:e] = np.asarray(ids[: e - s])
    # padded global rows (per-shard padding) → mark missing
    out_i = np.where(out_s < 1e29, out_i, -1)
    return out_s, out_i


def sharded_self_knn(
    base: np.ndarray, k: int, mesh: Mesh, metric: str = "L2", **kw
) -> np.ndarray:
    """Self-kNN with the corpus sharded across the mesh; self-hit removed."""
    from ..ops.knn import drop_self

    _, ids = sharded_exact_knn(base, base, k + 1, mesh, metric=metric, **kw)
    return drop_self(ids, k)
