"""K-Means partitioner, TPU-native.

Replaces the reference's Faiss coarse quantizer (reference: utils.py:321-330,
faiss.Kmeans niter=20).  Lloyd iterations run fully jitted: assignment is an
MXU matmul-argmin over centroid scores, the centroid update is a one-hot
segment-sum (also a matmul).  Training subsamples the corpus to
`max_points_per_centroid` points per centroid like the reference quantizer
does, so huge corpora train on a bounded set; the full corpus is then
assigned in streaming chunks.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.distance import pairwise_scores


@dataclass
class KMeans:
    centroids: np.ndarray  # (n_bkt, dim) float32
    objective: np.ndarray  # (niter,) mean squared distance per iteration

    @property
    def n_bkt(self) -> int:
        return self.centroids.shape[0]


@partial(jax.jit, static_argnames=("n_chunks",))
def _assign_chunked(x: jax.Array, centroids: jax.Array, n_chunks: int):
    """argmin-distance assignment + per-point min score, scanned over rows."""
    rows = x.shape[0] // n_chunks

    def body(_, xc):
        s = pairwise_scores(xc, centroids)
        return None, (jnp.argmin(s, axis=1).astype(jnp.int32), jnp.min(s, axis=1))

    _, (assign, best) = jax.lax.scan(body, None, x.reshape(n_chunks, rows, x.shape[1]))
    return assign.reshape(-1), best.reshape(-1)


@partial(jax.jit, static_argnames=("n_bkt", "niter", "n_chunks"))
def _lloyd(x: jax.Array, init: jax.Array, reseed: jax.Array, n_bkt: int, niter: int, n_chunks: int):
    """niter Lloyd iterations; empty clusters re-seeded from preselected rows."""
    n = x.shape[0]
    # pairwise_scores drops the per-point ||x||^2 (rank-invariant); add its
    # mean back so `objective` really is the documented mean squared distance
    # (otherwise it can go negative and can't be compared across datasets)
    msq = jnp.mean(jnp.sum(x.astype(jnp.float32) ** 2, axis=1))

    def step(carry, i):
        centroids = carry
        assign, best = _assign_chunked(x, centroids, n_chunks)
        one_hot = jax.nn.one_hot(assign, n_bkt, dtype=jnp.float32)  # (n, n_bkt)
        sums = jax.lax.dot_general(
            one_hot, x, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (n_bkt, dim)
        counts = jnp.sum(one_hot, axis=0)  # (n_bkt,)
        new_c = sums / jnp.maximum(counts, 1.0)[:, None]
        # empty cluster -> re-seed at a distinct random training point
        new_c = jnp.where((counts > 0)[:, None], new_c, x[reseed])
        obj = jnp.mean(best) + msq
        return new_c, obj

    centroids, objs = jax.lax.scan(step, init, jnp.arange(niter))
    return centroids, objs


def _kmeanspp_init(
    xt: np.ndarray, n_bkt: int, rng: np.random.Generator, rounds: int = 5,
) -> np.ndarray:
    """kmeans|| (scalable k-means++, Bahmani et al. 2012) — TPU-native form.

    Sequential k-means++ draws one center at a time (n_bkt dependent
    passes: hostile to a 2048-partition build).  kmeans|| oversamples
    ~2·n_bkt/rounds candidates per round with probability proportional to
    the current squared distance — each round is ONE matmul distance pass
    over the training rows — then reduces the ~2-3·n_bkt weighted
    candidates to n_bkt with a short weighted Lloyd.  Spread-out initial
    centers mean fewer empty-cluster reseeds and a lower final objective
    than the random-subset init (pinned by tests/test_partition.py)."""
    n = len(xt)
    x_dev = jnp.asarray(xt)
    cand = [int(rng.integers(0, n))]
    per_round = max(2, (2 * n_bkt) // rounds)
    d2 = None  # running min squared distance to the candidate set
    msq = (xt.astype(np.float64) ** 2).sum(axis=1)
    new = np.array(cand)
    for _ in range(rounds):
        # distances only against the NEW candidates; running min on host
        scores = np.asarray(pairwise_scores(x_dev, jnp.asarray(xt[new])))
        d2_new = (scores.min(axis=1) + msq).clip(min=0.0)
        d2 = d2_new if d2 is None else np.minimum(d2, d2_new)
        total = d2.sum()
        if total <= 0:
            break
        take = np.nonzero(rng.random(n) < per_round * d2 / total)[0]
        if len(take) == 0:
            take = np.array([int(np.argmax(d2))])
        cand.extend(int(i) for i in take)
        new = take
    cand = np.unique(np.array(cand))
    if len(cand) <= n_bkt:  # degenerate (tiny data): fall back to random fill
        extra = rng.choice(n, size=n_bkt - len(cand) + 1, replace=False)
        cand = np.unique(np.concatenate([cand, extra]))[:n_bkt]
        return xt[cand] if len(cand) == n_bkt else xt[
            rng.choice(n, size=n_bkt, replace=False)
        ]

    # weight candidates by how many training rows they currently own, then
    # reduce to n_bkt with a weighted Lloyd over the (small) candidate set
    scores = np.asarray(pairwise_scores(x_dev, jnp.asarray(xt[cand])))
    owner = scores.argmin(axis=1)
    w = np.bincount(owner, minlength=len(cand)).astype(np.float64)
    pts = xt[cand].astype(np.float64)
    # duplicated corpus rows tie the ownership argmin to the first candidate
    # with that value, leaving later duplicates weightless — if fewer than
    # n_bkt candidates have weight, a zero-probability no-replacement draw
    # raises; a tiny floor keeps every candidate drawable (the weighted
    # Lloyd below still uses the true weights)
    p = w + 1e-9
    seeds = rng.choice(len(cand), size=n_bkt, replace=False, p=p / p.sum())
    centers = pts[seeds].copy()
    psq = (pts**2).sum(axis=1)
    wp = pts * w[:, None]
    for _ in range(10):
        # matmul distances: a dense (cand, n_bkt, dim) difference tensor
        # would be ~12 GB at n_bkt=2048 with 3x oversampling
        d = psq[:, None] - 2.0 * (pts @ centers.T) + (centers**2).sum(axis=1)[None, :]
        a = d.argmin(axis=1)
        wsum = np.bincount(a, weights=w, minlength=n_bkt)
        sums = np.zeros_like(centers)
        np.add.at(sums, a, wp)
        live = wsum > 0
        centers[live] = sums[live] / wsum[live, None]
    return centers.astype(np.float32)


def kmeans_fit(
    x: np.ndarray | jax.Array,
    n_bkt: int,
    niter: int = 20,
    seed: int = 43,
    max_points_per_centroid: int = 256,
    chunk_rows: int = 16384,
    verbose: bool = False,
    init: str = "random",  # 'random' (reference faiss parity) | 'kmeans++'
) -> KMeans:
    """Train K-Means with Lloyd iterations on (a subsample of) x.

    `init='kmeans++'` runs the kmeans|| oversampling init (one matmul
    distance pass per round) before Lloyd — better-spread centers, lower
    final objective; 'random' matches the reference's faiss default."""
    x = np.asarray(x, dtype=np.float32)
    n, dim = x.shape
    rng = np.random.default_rng(seed)

    n_train = min(n, max_points_per_centroid * n_bkt)
    if n_train < n:
        sel = rng.choice(n, size=n_train, replace=False)
        xt = x[sel]
    else:
        xt = x

    # round rows up to a multiple of n_chunks by repeating head rows
    # (repeats only bias cluster means negligibly and keep shapes static)
    n_chunks = max(1, int(np.ceil(len(xt) / chunk_rows)))
    rows = int(np.ceil(len(xt) / n_chunks))
    total = rows * n_chunks
    if total > len(xt):
        xt = np.concatenate([xt, xt[: total - len(xt)]], axis=0)

    if init == "kmeans++":
        init_c = _kmeanspp_init(xt, n_bkt, rng)
    elif init == "random":
        init_c = xt[rng.choice(len(xt), size=n_bkt, replace=False)]
    else:
        raise ValueError(f"init={init!r}: expected 'random' or 'kmeans++'")
    # distinct rows (matching the comment at the reseed site): drawing with
    # replacement could reseed two simultaneously-empty clusters to the SAME
    # point, leaving them identical — and one of them permanently empty
    reseed_idx = rng.choice(len(xt), size=n_bkt, replace=len(xt) < n_bkt)

    centroids, objs = _lloyd(
        jnp.asarray(xt), jnp.asarray(init_c), jnp.asarray(reseed_idx),
        n_bkt, niter, n_chunks,
    )
    if verbose:
        print(f"kmeans: n_train={len(xt)} objective {np.asarray(objs)[0]:.4g} -> {np.asarray(objs)[-1]:.4g}")
    return KMeans(centroids=np.asarray(centroids), objective=np.asarray(objs))


def kmeans_assign(
    x: np.ndarray | jax.Array,
    centroids: np.ndarray | jax.Array,
    chunk_rows: int = 65536,
) -> np.ndarray:
    """Assign every row of x to its nearest centroid (streaming). (n,) int32."""
    x = np.asarray(x, dtype=np.float32)
    c = jnp.asarray(centroids, dtype=jnp.float32)
    out = np.empty(len(x), dtype=np.int32)
    for s in range(0, len(x), chunk_rows):
        e = min(s + chunk_rows, len(x))
        sc = pairwise_scores(jnp.asarray(x[s:e]), c)
        out[s:e] = np.asarray(jnp.argmin(sc, axis=1), dtype=np.int32)
    return out
