"""Multi-chip brute-force kNN: corpus sharded over the mesh.

The pod-scale form of the offline kNN labeler (BIGANN-100M never fits one
chip's HBM): each device keeps a corpus shard, runs the two-round screen +
rescan against its shard (same algorithm as ops/knn_pallas.py, expressed in
XLA so it runs inside shard_map on any backend), and per-shard top-k
results are all_gather'ed and re-merged — identical results to the
single-device kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _local_knn(q, shard, shard_sq, k: int, kg: int, metric: str, axis: str):
    """Per-device exact kNN against the local corpus shard + global merge."""
    shard, shard_sq = shard[0], shard_sq[0]  # squeeze the device axis
    n_local, d = shard.shape
    n_groups = n_local // 128

    # round 1: group-min screen (local)
    dot = jax.lax.dot_general(
        q, shard, dimension_numbers=(((1,), (1,)), ((), ())),
        precision="highest", preferred_element_type=jnp.float32,
    )  # (Q, n_local)
    if metric == "inner_product":
        scores = shard_sq.reshape(-1)[None, :] - dot
    else:
        scores = shard_sq.reshape(-1)[None, :] - 2.0 * dot
    gmin = scores.reshape(-1, n_groups, 128).min(axis=-1)
    kg_eff = min(kg, n_groups)
    _, gsel = jax.lax.top_k(-gmin, kg_eff)  # (Q, kg)

    # round 2: exact rescan of selected tiles (gather from the score matrix
    # directly — it is already materialized locally)
    grouped = scores.reshape(-1, n_groups, 128)
    sub = jnp.take_along_axis(grouped, gsel[:, :, None], axis=1)  # (Q, kg, 128)
    flat = sub.reshape(q.shape[0], kg_eff * 128)
    neg, pos = jax.lax.top_k(-flat, k)
    local_idx = (gsel[:, :, None] * 128 + jnp.arange(128, dtype=jnp.int32)).reshape(
        q.shape[0], -1
    )
    ids_local = jnp.take_along_axis(local_idx, pos, axis=1)

    # map to global ids: shard s owns rows [s*n_local, (s+1)*n_local)
    shard_id = jax.lax.axis_index(axis)
    ids_global = ids_local + shard_id * n_local

    # merge over ICI
    all_neg = jax.lax.all_gather(neg, axis)  # (n_dev, Q, k)
    all_ids = jax.lax.all_gather(ids_global, axis)
    n_dev = all_neg.shape[0]
    flat_neg = jnp.moveaxis(all_neg, 0, 1).reshape(q.shape[0], n_dev * k)
    flat_ids = jnp.moveaxis(all_ids, 0, 1).reshape(q.shape[0], n_dev * k)
    best_neg, sel = jax.lax.top_k(flat_neg, k)
    return -best_neg, jnp.take_along_axis(flat_ids, sel, axis=1)


def sharded_exact_knn(
    base: np.ndarray,
    query: np.ndarray,
    k: int,
    mesh: Mesh,
    metric: str = "L2",
    margin: int = 8,
    axis: str = "data",
    q_tile: int = 4096,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact kNN with the corpus row-sharded across the mesh.

    Returns (scores, ids) like ops.knn.exact_knn.  Rows are padded per shard
    to a 128 multiple; padding carries a large penalty.
    """
    n_dev = mesh.devices.size
    base = np.asarray(base, dtype=np.float32)
    n, d = base.shape
    per = ((n + n_dev - 1) // n_dev + 127) // 128 * 128
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

    kg = min(k + margin, per // 128)
    fn = jax.jit(
        jax.shard_map(
            partial(_local_knn, k=min(k, per), kg=kg, metric=metric, axis=axis),
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
    n = base.shape[0]
    _, ids = sharded_exact_knn(base, base, k + 1, mesh, metric=metric, **kw)
    rows = np.arange(n)[:, None]
    is_self = ids == rows
    has_self = is_self.any(axis=1)
    drop_col = np.where(has_self, is_self.argmax(axis=1), k)
    keep = np.ones_like(ids, dtype=bool)
    keep[rows[:, 0], drop_col] = False
    return ids[keep].reshape(n, k).astype(np.int32)
