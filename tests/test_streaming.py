"""Streaming ingestion: correctness + capped host memory.

A bvecs corpus must reach the device (or mesh shards) without ever being
widened to f32 on the host in full (reference reads record-by-record:
compute_knn.cpp:113-140)."""

import tracemalloc

import jax
import numpy as np
import pytest

from lira_tpu.io.streaming import XvecsStream, stream_to_device, stream_to_shards
from lira_tpu.io.xvecs import read_xvecs, write_xvecs

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _write_bvecs(tmp_path, n=200_000, dim=32, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 256, size=(n, dim)).astype(np.uint8)
    path = str(tmp_path / "big.bvecs")
    write_xvecs(path, x)
    return path, x


def test_stream_to_device_matches_full_load(tmp_path):
    path, x = _write_bvecs(tmp_path, n=3000, dim=16)
    buf = stream_to_device(path, chunk_rows=512, pad_rows_to=1024)
    assert buf.shape == (3072, 16)
    np.testing.assert_array_equal(np.asarray(buf[:3000]), x.astype(np.float32))
    assert (np.asarray(buf[3000:]) == 0).all()


def test_stream_to_device_capped_host_memory(tmp_path):
    n, dim = 200_000, 32
    path, x = _write_bvecs(tmp_path, n=n, dim=dim)
    full_f32_bytes = n * dim * 4  # 25.6 MB
    chunk_rows = 16_384
    tracemalloc.start()
    buf = stream_to_device(path, chunk_rows=chunk_rows)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    # host staging must be ~one chunk, far below the full f32 corpus
    assert peak < full_f32_bytes // 2, (peak, full_f32_bytes)
    # spot-check a few rows without materializing everything
    idx = np.array([0, 1, 99_999, 199_999])
    np.testing.assert_array_equal(np.asarray(buf[idx]), x[idx].astype(np.float32))


@needs_8
def test_stream_to_shards_matches(tmp_path):
    from lira_tpu.parallel.mesh import make_mesh

    path, x = _write_bvecs(tmp_path, n=5000, dim=8)
    mesh = make_mesh(8)
    arr, per = stream_to_shards(path, mesh, chunk_rows=300)
    assert arr.shape[0] == 8 and arr.shape[1] == per
    flat = np.asarray(arr).reshape(-1, 8)
    np.testing.assert_array_equal(flat[:5000], x.astype(np.float32))
    assert (flat[5000 : 8 * per] == 0).all()


def test_streaming_compute_knn_cli(tmp_path):
    """CLI end-to-end: --streaming produces the same cache as the full load."""
    from lira_tpu.io.cache import load_knn_cache
    from lira_tpu.io.datasets import synthetic_dataset, write_dataset
    from lira_tpu.pipelines.compute_knn_cli import main as knn_main

    b = synthetic_dataset(n_base=1500, n_query=5, dim=12, n_clusters=6, k_gt=5, seed=3)
    b.name = "strm"
    write_dataset(b, str(tmp_path))
    knn_main(["strm", str(tmp_path), "5", "--streaming", "--chunk_rows", "400"])
    cached = load_knn_cache(str(tmp_path), "strm", 5, 1500)
    from lira_tpu.ops.knn import self_knn

    np.testing.assert_array_equal(cached, self_knn(b.base, 5))
