"""Streaming ingestion: disk → f32 chunks → device, without a host-resident
f32 corpus.

The reference reads BIGANN-scale bvecs record-by-record in C++
(reference: compute_knn.cpp:113-140).  A naive Python load widens the whole
file to float32 on the host — 51 GB for BIGANN-100M u8 — before any device
transfer.  Here the file stays a memmap; fixed-size row chunks are widened
to f32 one at a time and written into a pre-allocated device buffer with a
donated dynamic-update-slice (true in-place on device), so peak host memory
is one chunk regardless of corpus size.

For corpora beyond one chip's HBM, `stream_to_shards` performs the same
chunked pass per device shard of a mesh (the sharded kNN / serving layouts
consume it).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .xvecs import read_xvecs


class XvecsStream:
    """Lazy row-chunk reader over an xvecs file (fvecs/bvecs/ivecs).

    The underlying array is a memmap view; `read(s, e)` materializes only
    rows [s, e) as float32.
    """

    def __init__(self, path: str):
        self.path = path
        self._view = read_xvecs(path)  # memmap-backed (n, d), raw dtype
        self.n, self.dim = self._view.shape

    def read(self, s: int, e: int) -> np.ndarray:
        return np.asarray(self._view[s:e], dtype=np.float32)

    def chunks(self, rows: int = 1 << 20):
        for s in range(0, self.n, rows):
            yield s, self.read(s, min(s + rows, self.n))


@partial(jax.jit, donate_argnums=(0,), static_argnames=())
def _place(buf: jax.Array, chunk: jax.Array, start: jax.Array) -> jax.Array:
    return jax.lax.dynamic_update_slice(buf, chunk.astype(buf.dtype), (start, 0))


def stream_to_device(
    src: str | XvecsStream,
    chunk_rows: int = 1 << 20,
    dtype=jnp.float32,
    pad_rows_to: int = 1,
    device=None,
) -> jax.Array:
    """Upload an xvecs file to one device as an (n_pad, d) array.

    Host peak memory = one `chunk_rows` × d f32 chunk; the device buffer is
    updated in place (donated), so device peak = the final buffer + one
    chunk.  `pad_rows_to` rounds the row count up (zero rows appended) for
    tile-aligned consumers.
    """
    stream = src if isinstance(src, XvecsStream) else XvecsStream(src)
    n_pad = -(-stream.n // pad_rows_to) * pad_rows_to
    buf = jnp.zeros((n_pad, stream.dim), dtype)
    if device is not None:
        buf = jax.device_put(buf, device)
    for s, chunk in stream.chunks(chunk_rows):
        # the uneven tail chunk is its own (one extra) compile shape
        buf = _place(buf, jnp.asarray(chunk), jnp.int32(s))
    return buf


def stream_to_shards(
    src: str | XvecsStream,
    mesh,
    axis: str = "data",
    chunk_rows: int = 1 << 20,
    dtype=jnp.float32,
    rows_multiple: int = 128,
):
    """Upload an xvecs file row-sharded over a mesh: (n_dev, per, d).

    Each device shard is filled by its own chunked pass (host peak = one
    chunk); returns the global array assembled from per-device buffers,
    plus the per-shard row count.  Rows beyond n are zero.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    stream = src if isinstance(src, XvecsStream) else XvecsStream(src)
    n_dev = mesh.devices.size
    per = -(-stream.n // n_dev)
    per = -(-per // rows_multiple) * rows_multiple
    devs = list(mesh.devices.flat)
    shards = []
    for d_i in range(n_dev):
        lo = min(d_i * per, stream.n)
        hi = min(lo + per, stream.n)
        buf = jax.device_put(jnp.zeros((per, stream.dim), dtype), devs[d_i])
        for s in range(lo, hi, chunk_rows):
            chunk = stream.read(s, min(s + chunk_rows, hi))
            # device_put straight from numpy: jnp.asarray first would commit
            # the chunk to the default device and copy device-to-device,
            # doubling transfer volume and serializing ingest through dev 0
            buf = _place(buf, jax.device_put(chunk, devs[d_i]), jnp.int32(s - lo))
        shards.append(buf[None])
    sharding = NamedSharding(mesh, P(axis))
    arr = jax.make_array_from_single_device_arrays(
        (n_dev, per, stream.dim), sharding, shards
    )
    return arr, per


def base_file_path(data_path: str, dataset: str) -> str | None:
    """Locate the base/learn vectors file for a dataset (fvecs or bvecs)."""
    ddir = os.path.join(data_path, dataset)
    for kind in ("base", "learn"):
        for ext in ("fvecs", "bvecs"):
            p = os.path.join(ddir, f"{dataset}_{kind}.{ext}")
            if os.path.exists(p):
                return p
    return None
