"""Brute-force exact kNN, tiled for TPU.

Replaces the reference's Faiss/OpenMP C++ self-kNN precompute tool
(reference: compute_knn.cpp) with a streaming MXU formulation: the corpus
is HBM-resident, query tiles stream through a lax.scan over corpus chunks,
each chunk contributing a matmul-distance block whose per-row top-k is
merged into a running top-k.  All shapes static → one compile per config.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .topk import grouped_topk


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(jax.jit, static_argnames=("k", "metric", "b_tile", "precision"))
def _knn_query_tile(
    q: jax.Array,  # (Q, d) query tile
    base: jax.Array,  # (n_pad, d) padded corpus
    pad_penalty: jax.Array,  # (n_pad,) 0 for real rows, +inf for padding
    k: int,
    metric: str,
    b_tile: int,
    precision: str,
):
    """Running top-k of one query tile against the whole (padded) corpus."""
    n_pad = base.shape[0]
    n_chunks = n_pad // b_tile

    if metric != "inner_product":
        base_sq = jnp.sum(base.astype(jnp.float32) * base, axis=1) + pad_penalty
    else:
        base_sq = pad_penalty

    q32 = q.astype(jnp.float32)

    def body(carry, i):
        best_neg, best_idx = carry
        chunk = jax.lax.dynamic_slice_in_dim(base, i * b_tile, b_tile)
        chunk_extra = jax.lax.dynamic_slice_in_dim(base_sq, i * b_tile, b_tile)
        dot = jax.lax.dot_general(
            q32,
            chunk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32,
        )
        if metric == "inner_product":
            score = -dot + chunk_extra
        else:
            score = chunk_extra - 2.0 * dot
        vals, idx = grouped_topk(score, k)  # exact per-chunk top-k, ascending
        neg = -vals
        idx = idx + i * b_tile
        merged_neg = jnp.concatenate([best_neg, neg], axis=1)
        merged_idx = jnp.concatenate([best_idx, idx], axis=1)
        new_neg, sel = jax.lax.top_k(merged_neg, k)
        new_idx = jnp.take_along_axis(merged_idx, sel, axis=1)
        return (new_neg, new_idx), None

    init = (
        jnp.full((q.shape[0], k), -jnp.inf, dtype=jnp.float32),
        jnp.full((q.shape[0], k), -1, dtype=jnp.int32),
    )
    (best_neg, best_idx), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    return -best_neg, best_idx


def exact_knn(
    base: np.ndarray | jax.Array,
    query: np.ndarray | jax.Array,
    k: int,
    metric: str = "L2",
    q_tile: int = 4096,
    b_tile: int = 131072,
    precision: str = "highest",
    verbose: bool = False,
    score_budget: int = 1 << 29,  # max Q×C elements of the score tensor (2 GiB f32)
) -> tuple[np.ndarray, np.ndarray]:
    """Exact kNN of `query` against `base`.

    Returns (scores, ids): scores are ranking scores (L2² minus the per-query
    norm, or −IP), ids are int32 indices into `base`.  Ties broken by index
    order within each corpus chunk, matching a stable argsort per chunk.
    """
    n_b, dim = base.shape
    n_q = query.shape[0]
    k = min(k, n_b)

    b_tile = min(b_tile, _round_up(n_b, 128))
    while q_tile * b_tile > score_budget and q_tile > 256:
        q_tile //= 2
    n_pad = _round_up(n_b, b_tile)
    base_pad = jnp.zeros((n_pad, dim), dtype=jnp.float32)
    base_pad = base_pad.at[:n_b].set(jnp.asarray(base, dtype=jnp.float32))
    penalty = jnp.where(jnp.arange(n_pad) < n_b, 0.0, jnp.inf).astype(jnp.float32)

    out_scores = np.empty((n_q, k), dtype=np.float32)
    out_ids = np.empty((n_q, k), dtype=np.int32)

    q_tile = min(q_tile, _round_up(n_q, 8))
    n_tiles = math.ceil(n_q / q_tile)
    query = np.asarray(query, dtype=np.float32)
    for t in range(n_tiles):
        s, e = t * q_tile, min((t + 1) * q_tile, n_q)
        qt = np.zeros((q_tile, dim), dtype=np.float32)
        qt[: e - s] = query[s:e]
        sc, ids = _knn_query_tile(
            jnp.asarray(qt), base_pad, penalty, k, metric, b_tile, precision
        )
        out_scores[s:e] = np.asarray(sc[: e - s])
        out_ids[s:e] = np.asarray(ids[: e - s])
        if verbose and (t % 10 == 0 or t == n_tiles - 1):
            print(f"  kNN: {e}/{n_q} queries")
    return out_scores, out_ids


def self_knn(
    base: np.ndarray | jax.Array,
    k: int,
    metric: str = "L2",
    q_tile: int = 1024,
    b_tile: int = 65536,
    precision: str = "highest",
    verbose: bool = False,
) -> np.ndarray:
    """Self-kNN of the corpus: (n, k) int32, self-match removed.

    Searches k+1 and drops each row's own id (or the last hit when the row id
    is absent due to exact-duplicate ties) — the same contract as the
    reference's offline tool (reference: compute_knn.cpp:229-259).
    """
    n = base.shape[0]
    _, ids = exact_knn(
        base, base, k + 1, metric=metric, q_tile=q_tile, b_tile=b_tile,
        precision=precision, verbose=verbose,
    )
    rows = np.arange(n)[:, None]
    is_self = ids == rows  # (n, k+1)
    # Drop exactly one entry per row: the self hit if present, else the last.
    has_self = is_self.any(axis=1)
    drop_col = np.where(has_self, is_self.argmax(axis=1), k)
    keep = np.ones_like(ids, dtype=bool)
    keep[rows[:, 0], drop_col] = False
    return ids[keep].reshape(n, k).astype(np.int32)
