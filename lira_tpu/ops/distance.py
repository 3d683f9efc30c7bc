"""Pairwise distance computation, MXU-first.

Everything is expressed as one large matmul plus rank-1 norm corrections:

    ‖q − b‖² = ‖q‖² − 2 q·b + ‖b‖²

so XLA tiles the hot loop onto the systolic array.  All scores are
"smaller is better": squared L2 for the L2 metric, −⟨q,b⟩ for inner
product — the same ranking convention the reference scan uses
(reference: search.cpp:252-269).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _dot(q: jax.Array, b: jax.Array, precision) -> jax.Array:
    return jax.lax.dot_general(
        q,
        b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32,
    )


@partial(jax.jit, static_argnames=("metric", "precision"))
def pairwise_scores(
    q: jax.Array,
    b: jax.Array,
    metric: str = "L2",
    precision: str = "highest",
) -> jax.Array:
    """(n_q, d) × (n_b, d) → (n_q, n_b) ranking scores (smaller = closer).

    L2 scores omit the per-query ‖q‖² term: it is constant per row and does
    not affect ranking.  Use `scores_to_distances` to recover true squared
    distances when needed.
    """
    if metric == "inner_product":
        return -_dot(q, b, precision)
    b_sq = jnp.sum(b.astype(jnp.float32) * b.astype(jnp.float32), axis=1)
    return b_sq[None, :] - 2.0 * _dot(q, b, precision)


def scores_to_distances(scores: jax.Array, q: jax.Array, metric: str = "L2") -> jax.Array:
    """Convert ranking scores back to true squared L2 (or −IP) values."""
    if metric == "inner_product":
        return scores
    q_sq = jnp.sum(q.astype(jnp.float32) ** 2, axis=1)
    return scores + q_sq[:, None]


@partial(jax.jit, static_argnames=("precision",))
def l2_to_centroids(x: jax.Array, centroids: jax.Array, precision: str = "highest") -> jax.Array:
    """Euclidean (sqrt) distance from each row of x to every centroid.

    This is the probing model's distance-feature input; it uses true sqrt-L2
    to match the feature definition used at train and serve time
    (reference: utils.py:98-118, search.cpp:219-235).
    """
    s = pairwise_scores(x, centroids, metric="L2", precision=precision)
    d2 = scores_to_distances(s, x, metric="L2")
    return jnp.sqrt(jnp.maximum(d2, 0.0))


def row_sqnorms(x, chunk: int = 1 << 20):
    """Host-side f32 row squared norms, accumulated in f64 per chunk.

    Avoids the `x.astype(float64)` full-array temporary (10 GB at 10M×128)
    that a naive `(x**2).sum(1)` in double precision would allocate.
    """
    import numpy as np

    n = x.shape[0]
    out = np.empty(n, np.float32)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        blk = x[s:e]
        out[s:e] = np.einsum("ij,ij->i", blk, blk, dtype=np.float64).astype(np.float32)
    return out
