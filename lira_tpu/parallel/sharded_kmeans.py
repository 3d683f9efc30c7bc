"""Mesh-sharded K-Means: Lloyd with the corpus sharded over devices.

The single-chip partitioner (partition/kmeans.py) bounds training memory by
subsampling to max_points_per_centroid rows — the reference quantizer's
semantics (reference: utils.py:321-330).  This module is the scale-out
path SURVEY §7 names for 10-100M builds: corpus ROWS are sharded over the
mesh (P(axis)), centroids are replicated, and every Lloyd step runs inside
one `shard_map` program —

  local assignment  : chunked matmul-argmin over the shard's rows (the
                      (rows, n_bkt) score matrix never materializes; same
                      lax.scan chunking as partition/kmeans._assign_chunked)
  local accumulation: one-hot segment-sum of the shard's rows (MXU matmul),
                      padding rows masked by a per-row weight
  global reduction  : `psum` of the (n_bkt, d) sums, (n_bkt,) counts and the
                      objective over ICI — every device then computes the
                      SAME new centroids, so no broadcast is needed

Per-device HBM is one corpus shard + O(n_bkt·d); the only cross-device
traffic is 2·(n_bkt·d + n_bkt) floats per iteration, independent of n.

Numerics: the psum tree reduces partial sums in a different order than the
single-chip dot over all rows, so centroids match kmeans_fit to float
accumulation error (not bitwise) — tests pin one-step allclose and
final-objective agreement.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.distance import pairwise_scores
from ..partition.kmeans import KMeans


def _shard_rows(x: np.ndarray, mesh: Mesh, axis: str, multiple: int = 8):
    """Upload host rows shard-by-shard: (x_sharded (n_dev·rows, d),
    w_sharded (n_dev·rows, 1), rows) with zero rows / zero weights past n.

    Host staging never exceeds one shard; `rows` is padded to `multiple`
    so the in-shard chunked scan divides evenly."""
    n, d = x.shape
    n_dev = mesh.devices.size
    rows = -(-n // n_dev)
    rows = -(-rows // multiple) * multiple
    shard = NamedSharding(mesh, P(axis))
    devs = list(mesh.devices.flat)
    x_shards, w_shards = [], []
    for i in range(n_dev):
        s, e = i * rows, min((i + 1) * rows, n)
        xs = np.zeros((rows, d), np.float32)
        ws = np.zeros((rows, 1), np.float32)
        if e > s:
            xs[: e - s] = x[s:e]
            ws[: e - s] = 1.0
        x_shards.append(jax.device_put(xs, devs[i]))
        w_shards.append(jax.device_put(ws, devs[i]))
    x_sh = jax.make_array_from_single_device_arrays(
        (n_dev * rows, d), shard, x_shards
    )
    w_sh = jax.make_array_from_single_device_arrays(
        (n_dev * rows, 1), shard, w_shards
    )
    return x_sh, w_sh, rows


def _local_step(xs, ws, c, reseed_c, *, n_bkt: int, n_chunks: int, axis: str):
    """One Lloyd step on this device's shard; psum'ed update.

    xs (rows, d), ws (rows, 1) local; c/reseed_c (n_bkt, d) replicated.
    Returns (new centroids (n_bkt, d) — identical on every device, obj)."""
    rows, d = xs.shape
    chunk = rows // n_chunks

    def body(_, args):
        xc, wc = args
        sc = pairwise_scores(xc, c)
        a = jnp.argmin(sc, axis=1).astype(jnp.int32)
        oh = jax.nn.one_hot(a, n_bkt, dtype=jnp.float32) * wc  # (chunk, n_bkt)
        sums = jax.lax.dot_general(
            oh, xc, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        counts = jnp.sum(oh, axis=0)
        best = jnp.sum(jnp.min(sc, axis=1) * wc[:, 0])
        msq = jnp.sum(jnp.sum(xc * xc, axis=1) * wc[:, 0])
        return None, (sums, counts, best, msq)

    _, (sums, counts, best, msq) = jax.lax.scan(
        body, None,
        (xs.reshape(n_chunks, chunk, d), ws.reshape(n_chunks, chunk, 1)),
    )
    sums = jax.lax.psum(jnp.sum(sums, axis=0), axis)  # (n_bkt, d)
    counts = jax.lax.psum(jnp.sum(counts, axis=0), axis)  # (n_bkt,)
    tot = jax.lax.psum(jnp.sum(best) + jnp.sum(msq), axis)
    n_real = jnp.maximum(jnp.sum(counts), 1.0)
    new_c = sums / jnp.maximum(counts, 1.0)[:, None]
    new_c = jnp.where((counts > 0)[:, None], new_c, reseed_c)
    return new_c, tot / n_real


def sharded_kmeans_fit(
    x: np.ndarray,
    n_bkt: int,
    mesh: Mesh,
    niter: int = 20,
    seed: int = 43,
    axis: str = "data",
    chunk_rows: int = 16384,
    verbose: bool = False,
    init_centroids: np.ndarray | None = None,  # (n_bkt, d) override
    reseed_vectors: np.ndarray | None = None,  # (n_bkt, d) empty-cluster seeds
) -> KMeans:
    """Full-corpus Lloyd over the mesh (no subsampling — sharding IS the
    memory bound).  Same init/reseed semantics as partition.kmeans_fit:
    random distinct training rows for both, seeded identically; pass
    `init_centroids`/`reseed_vectors` to pin them (single-chip parity
    tests, warm restarts).

    Returns the same KMeans record (centroids replicated, gathered once)."""
    x = np.asarray(x, np.float32)
    n, d = x.shape
    rng = np.random.default_rng(seed)
    if init_centroids is None:
        init_centroids = x[rng.choice(n, size=n_bkt, replace=n < n_bkt)]
    if reseed_vectors is None:
        reseed_vectors = x[rng.choice(n, size=n_bkt, replace=n < n_bkt)]
    init_c = np.asarray(init_centroids, np.float32)
    reseed_c = np.asarray(reseed_vectors, np.float32)

    # pad each shard to a multiple of the scan chunk so the in-shard score
    # matrix is bounded at (chunk, n_bkt) regardless of shard size
    chunk = -(-max(8, min(chunk_rows, -(-n // mesh.devices.size))) // 8) * 8
    x_sh, w_sh, rows = _shard_rows(x, mesh, axis, multiple=chunk)
    n_chunks = rows // chunk

    step = jax.jit(
        jax.shard_map(
            partial(_local_step, n_bkt=n_bkt, n_chunks=n_chunks, axis=axis),
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )
    c = jnp.asarray(init_c)
    rc = jnp.asarray(reseed_c)
    objs = []
    for i in range(niter):
        c, obj = step(x_sh, w_sh, c, rc)
        objs.append(float(obj))
        if verbose:
            print(f"sharded kmeans iter {i}: objective {objs[-1]:.6g}", flush=True)
    return KMeans(centroids=np.asarray(c), objective=np.asarray(objs))


def sharded_kmeans_assign(
    x: np.ndarray,
    centroids: np.ndarray,
    mesh: Mesh,
    axis: str = "data",
    chunk_rows: int = 65536,
) -> np.ndarray:
    """Nearest-centroid assignment with rows sharded over the mesh. (n,) i32.

    Bitwise-identical to partition.kmeans_assign (same per-row argmin on the
    same scores); the mesh only splits the row space."""
    x = np.asarray(x, np.float32)
    n, d = x.shape
    chunk = -(-max(8, min(chunk_rows, -(-n // mesh.devices.size))) // 8) * 8
    x_sh, w_sh, rows = _shard_rows(x, mesh, axis, multiple=chunk)
    n_chunks = rows // chunk

    def local(xs, c):
        chunk = xs.shape[0] // n_chunks

        def body(_, xc):
            sc = pairwise_scores(xc, c)
            return None, jnp.argmin(sc, axis=1).astype(jnp.int32)

        _, a = jax.lax.scan(body, None, xs.reshape(n_chunks, chunk, d))
        return a.reshape(-1)

    fn = jax.jit(
        jax.shard_map(
            local, mesh=mesh, in_specs=(P(axis), P()), out_specs=P(axis),
            check_vma=False,
        )
    )
    out = np.asarray(fn(x_sh, jnp.asarray(centroids, jnp.float32)))
    n_dev = mesh.devices.size
    if n_dev * rows == n:
        return out
    # drop each shard's padding tail: global row g lives in shard g//rows
    per = out.reshape(n_dev, rows)
    parts = [per[i, : min(rows, max(0, n - i * rows))] for i in range(n_dev)]
    return np.concatenate([p for p in parts if len(p)])
