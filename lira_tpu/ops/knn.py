"""Brute-force exact kNN, tiled for TPU.

Replaces the reference's Faiss/OpenMP C++ self-kNN precompute tool
(reference: compute_knn.cpp) with a streaming MXU formulation.  The corpus
is stored **transposed** (dim, n) in HBM so each chunk's score block comes
out of the MXU directly in a (Q, 128, G) strided-group layout:

  * group-min over the sublane axis (one VPU pass, no transpose) finds the
    k+2 groups guaranteed to contain the exact top-k (see ops/topk.py for
    the argument);
  * the selected groups are extracted with a one-hot *matmul* instead of a
    lane gather (TPU gathers are element-at-a-time; the MXU does the same
    selection at full throughput);
  * a small exact top-k finishes per chunk, and a (2k)-wide merge folds
    chunks into the running result.

All shapes static → one compile per (q_tile, b_tile, k, metric, precision).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _chunk_topk3(scores3: jax.Array, k: int):
    """Exact smallest-k of each row of a (Q, S, G) strided-group score block.

    Element (q, i, j) is chunk-local index i*G + j.  Returns (neg_vals, idx)
    with neg_vals = -score (descending = closer first).
    """
    q, s, g = scores3.shape
    gmin = scores3.min(axis=1)  # (Q, G) sublane reduce
    k_groups = min(g, k + 2)
    _, gsel = jax.lax.top_k(-gmin, k_groups)  # (Q, kg) groups holding the top-k

    # one-hot matmul extraction: sub[q, i, j] = scores3[q, i, gsel[q, j]].
    # precision must be full f32 — bf16 inputs would round the extracted
    # score *values* and corrupt the final ranking.
    iota_g = jax.lax.broadcasted_iota(jnp.int32, (q, g, k_groups), 1)
    onehot = (iota_g == gsel[:, None, :]).astype(scores3.dtype)  # (Q, G, kg)
    sub = jax.lax.dot_general(
        scores3, onehot,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        precision="highest",
        preferred_element_type=jnp.float32,
    )  # (Q, S, kg)
    neg, sel = jax.lax.top_k(-sub.reshape(q, s * k_groups), k)
    # sub element (i, j) -> chunk-local index i*G + gsel[q, j]
    base = (
        jax.lax.broadcasted_iota(jnp.int32, (q, s, k_groups), 1) * g
        + gsel[:, None, :]
    ).reshape(q, s * k_groups)
    idx = jnp.take_along_axis(base, sel, axis=1)
    return neg, idx


@partial(jax.jit, static_argnames=("k", "metric", "b_tile", "precision"))
def _knn_query_tile(
    q: jax.Array,  # (Q, d) query tile
    base_t: jax.Array,  # (d, n_pad) transposed padded corpus
    base_sq: jax.Array,  # (n_pad,) row norms (or 0) + padding penalty (+inf)
    k: int,
    metric: str,
    b_tile: int,
    precision: str,
):
    """Running top-k of one query tile against the whole (padded) corpus."""
    n_pad = base_t.shape[1]
    n_chunks = n_pad // b_tile
    sub = 128  # sublane group height; G = b_tile // sub strided groups
    g = b_tile // sub

    q32 = q.astype(jnp.float32)

    def body(carry, i):
        best_neg, best_idx = carry
        chunk = jax.lax.dynamic_slice_in_dim(base_t, i * b_tile, b_tile, axis=1)
        chunk_sq = jax.lax.dynamic_slice_in_dim(base_sq, i * b_tile, b_tile)
        dot = jax.lax.dot_general(
            q32,
            chunk.reshape(chunk.shape[0], sub, g),
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32,
        )  # (Q, sub, G)
        if metric == "inner_product":
            score3 = -dot + chunk_sq.reshape(sub, g)[None]
        else:
            score3 = chunk_sq.reshape(sub, g)[None] - 2.0 * dot
        neg, idx = _chunk_topk3(score3, k)
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


def _prepare_corpus(base, metric: str, b_tile: int):
    """Device-resident transposed corpus + norm/penalty vector.

    Host numpy inputs are transposed/padded on the host and uploaded as ONE
    device buffer — doing it on device peaks at ~3 corpus copies (input,
    zeros target, transpose), which OOMs a 16 GB chip at 10M×128 f32."""
    n_b, dim = base.shape
    # the query-tile kernel reshapes chunks to (dim, 128, b_tile//128):
    # a non-multiple-of-128 b_tile would fail deep in tracing
    b_tile = min(_round_up(b_tile, 128), _round_up(n_b, 128))
    n_pad = _round_up(n_b, b_tile)
    if isinstance(base, np.ndarray):
        bt = np.zeros((dim, n_pad), dtype=np.float32)
        bt[:, :n_b] = np.asarray(base, dtype=np.float32).T
        base_t = jnp.asarray(bt)
        del bt
        sq_host = np.zeros(n_pad, dtype=np.float32)
        if metric != "inner_product":
            np.einsum("ij,ij->i", base, base, out=sq_host[:n_b],
                      dtype=np.float32, casting="unsafe")
        # large *finite* penalty: +inf would become NaN through the one-hot
        # matmul extraction (inf × 0) in _chunk_topk3
        sq_host[n_b:] = 1e30
        return base_t, jnp.asarray(sq_host), b_tile
    base = jnp.asarray(base, dtype=jnp.float32)
    base_t = jnp.zeros((dim, n_pad), dtype=jnp.float32).at[:, :n_b].set(base.T)
    penalty = jnp.where(jnp.arange(n_pad) < n_b, 0.0, 1e30).astype(jnp.float32)
    if metric == "inner_product":
        base_sq = penalty
    else:
        base_sq = jnp.sum(base * base, axis=1)
        base_sq = jnp.concatenate(
            [base_sq, jnp.zeros(n_pad - n_b, jnp.float32)]
        ) + penalty
    return base_t, base_sq, b_tile


def exact_knn(
    base: np.ndarray | jax.Array,
    query: np.ndarray | jax.Array,
    k: int,
    metric: str = "L2",
    q_tile: int = 4096,
    b_tile: int = 131072,
    precision: str = "highest",
    verbose: bool = False,
    score_budget: int = 1 << 29,  # max Q×C score elements in flight (2 GiB f32)
) -> tuple[np.ndarray, np.ndarray]:
    """Exact kNN of `query` against `base`.

    Returns (scores, ids): scores are ranking scores (L2² minus the per-query
    norm, or −IP), ids int32 into `base`.  Ties may reorder between exactly
    equal scores (group selection is exact on values).
    """
    n_b, dim = base.shape
    n_q = query.shape[0]
    k = min(k, n_b)

    while q_tile * b_tile > score_budget and q_tile > 256:
        q_tile //= 2
    base_t, base_sq, b_tile = _prepare_corpus(base, metric, b_tile)

    out_scores = np.empty((n_q, k), dtype=np.float32)
    out_ids = np.empty((n_q, k), dtype=np.int32)

    q_tile = min(q_tile, _round_up(n_q, 8))
    n_tiles = math.ceil(n_q / q_tile)
    if isinstance(query, jax.Array):
        # device-resident queries stay on device: pad once and slice per
        # tile — np.asarray would download the whole matrix just to
        # re-upload it tile by tile
        q_pad = jnp.zeros((n_tiles * q_tile, dim), jnp.float32).at[:n_q].set(query)
        tiles = [
            jax.lax.dynamic_slice_in_dim(q_pad, t * q_tile, q_tile)
            for t in range(n_tiles)
        ]
    else:
        query = np.asarray(query, dtype=np.float32)
        tiles = None
    for t in range(n_tiles):
        s, e = t * q_tile, min((t + 1) * q_tile, n_q)
        if tiles is None:
            qt = np.zeros((q_tile, dim), dtype=np.float32)
            qt[: e - s] = query[s:e]
            q_dev = jnp.asarray(qt)
        else:
            q_dev = tiles[t]
        sc, ids = _knn_query_tile(q_dev, base_t, base_sq, k, metric, b_tile, precision)
        out_scores[s:e] = np.asarray(sc[: e - s])
        out_ids[s:e] = np.asarray(ids[: e - s])
        if verbose and (t % 10 == 0 or t == n_tiles - 1):
            print(f"  kNN: {e}/{n_q} queries")
    return out_scores, out_ids


def exact_knn_stream(
    base: np.ndarray,
    query: np.ndarray | jax.Array,
    k: int,
    metric: str = "L2",
    base_chunk: int = 2_097_152,
    verbose: bool = False,
    **kw,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact kNN over a corpus too large for device HBM.

    Streams `base` through `exact_knn` in host chunks (device holds one
    chunk + its transpose at a time) and merges the per-chunk top-k on the
    host.  exact_knn's ranking scores are chunk-independent (L2² minus the
    per-query norm, or −IP), so the host merge is a plain top-k over
    concatenated (score, global id) pairs.  Same contract as exact_knn;
    the one-chip GT path for ≥50M-row corpora (f32 corpus 25.6 GB at 50M —
    the whole-corpus upload of exact_knn cannot fit 16 GB HBM)."""
    base = np.asarray(base)
    n_b = base.shape[0]
    q_dev = jnp.asarray(np.asarray(query, np.float32))  # upload queries once
    best_s = best_i = None
    for s in range(0, n_b, base_chunk):
        e = min(s + base_chunk, n_b)
        sc, ids = exact_knn(base[s:e], q_dev, min(k, e - s), metric=metric, **kw)
        ids = ids.astype(np.int64) + s
        if best_s is None:
            best_s, best_i = sc, ids
        else:
            cs = np.concatenate([best_s, sc], axis=1)
            ci = np.concatenate([best_i, ids], axis=1)
            sel = np.argsort(cs, axis=1, kind="stable")[:, :k]
            best_s = np.take_along_axis(cs, sel, axis=1)
            best_i = np.take_along_axis(ci, sel, axis=1)
        if verbose:
            print(f"  kNN-stream: {e:,}/{n_b:,} rows", flush=True)
    if best_s.shape[1] < k:  # n_b < k: pad to the exact_knn k-clamp contract
        pad = k - best_s.shape[1]
        best_s = np.pad(best_s, ((0, 0), (0, pad)), constant_values=np.inf)
        best_i = np.pad(best_i, ((0, 0), (0, pad)), constant_values=-1)
    return best_s.astype(np.float32), best_i.astype(np.int64)


def self_knn(
    base: np.ndarray | jax.Array,
    k: int,
    metric: str = "L2",
    q_tile: int = 4096,
    b_tile: int = 131072,
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
    return drop_self(ids, k)


def drop_self(ids: np.ndarray, k: int, row_ids: np.ndarray | None = None) -> np.ndarray:
    """Drop each row's own id from a (n, kk) self-search result → (n, k).

    Drops exactly one entry per row: the self hit if present, else the last
    (exact-duplicate ties).  kk may be < k+1 when the search clamped k to
    the corpus size (k >= n): the missing tail is -1-padded, matching the
    -1 contract of knn_fused's padded-corpus hits.  `row_ids` overrides the
    default arange(n) when the query rows are a slice of the corpus
    (chunked self-search: global ids s..e)."""
    n, kk = ids.shape
    if row_ids is None:
        rows = np.arange(n)[:, None]
    else:
        rows = np.asarray(row_ids).reshape(n, 1)
    is_self = ids == rows  # (n, kk)
    has_self = is_self.any(axis=1)
    drop_col = np.where(has_self, is_self.argmax(axis=1), kk - 1)
    keep = np.ones_like(ids, dtype=bool)
    keep[np.arange(n), drop_col] = False
    out = ids[keep].reshape(n, kk - 1).astype(np.int32)
    if kk - 1 < k:  # k >= n: fewer than k real neighbors exist
        out = np.concatenate(
            [out, np.full((n, k - (kk - 1)), -1, np.int32)], axis=1
        )
    return out
