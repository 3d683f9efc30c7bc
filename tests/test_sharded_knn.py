import jax
import numpy as np
import pytest
from scipy.spatial.distance import cdist

from lira_tpu.parallel.mesh import make_mesh
from lira_tpu.parallel.sharded_knn import sharded_exact_knn, sharded_self_knn

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


@needs_8
def test_sharded_knn_matches_oracle(rng):
    base = rng.normal(size=(3000, 16)).astype(np.float32)
    query = rng.normal(size=(40, 16)).astype(np.float32)
    mesh = make_mesh(8)
    _, ids = sharded_exact_knn(base, query, 5, mesh)
    d = cdist(query, base, metric="sqeuclidean")
    expected = np.argsort(d, axis=1, kind="stable")[:, :5]
    for i in range(40):
        assert set(ids[i]) == set(expected[i]), i


@needs_8
def test_sharded_self_knn(rng):
    base = rng.normal(size=(2000, 8)).astype(np.float32)
    mesh = make_mesh(8)
    knn = sharded_self_knn(base, 4, mesh)
    assert knn.shape == (2000, 4)
    rows = np.arange(2000)[:, None]
    assert not (knn == rows).any()
    d = cdist(base, base, metric="sqeuclidean")
    np.fill_diagonal(d, np.inf)
    expected = np.argsort(d, axis=1, kind="stable")[:, :4]
    agree = np.mean([len(set(knn[i]) & set(expected[i])) / 4 for i in range(2000)])
    assert agree == 1.0


@needs_8
def test_sharded_knn_ip(rng):
    base = rng.normal(size=(1600, 8)).astype(np.float32)
    query = rng.normal(size=(10, 8)).astype(np.float32)
    mesh = make_mesh(8)
    _, ids = sharded_exact_knn(base, query, 3, mesh, metric="inner_product")
    expected = np.argsort(-(query @ base.T), axis=1, kind="stable")[:, :3]
    for i in range(10):
        assert set(ids[i]) == set(expected[i]), i


@needs_8
def test_sharded_knn_streams_under_budget(rng):
    """Chunked streaming: a score budget far below the dense (Q, n_local)
    matrix must still give exact results (many chunks per shard, top-k
    spanning chunk boundaries)."""
    base = rng.normal(size=(8192, 8)).astype(np.float32)
    query = rng.normal(size=(64, 8)).astype(np.float32)
    mesh = make_mesh(8)
    # dense per-shard scores would be 64×1024×4 = 256 KiB; budget 64 KiB
    # forces c_block = 256 → 4 streamed chunks per shard
    _, ids = sharded_exact_knn(base, query, 7, mesh, score_budget=1 << 16)
    d = cdist(query, base, metric="sqeuclidean")
    expected = np.argsort(d, axis=1, kind="stable")[:, :7]
    for i in range(64):
        assert set(ids[i]) == set(expected[i]), i


@needs_8
def test_sharded_knn_k_wider_than_chunk(rng):
    """k larger than one streamed chunk's group capacity stays exact."""
    base = rng.normal(size=(4096, 8)).astype(np.float32)
    query = rng.normal(size=(16, 8)).astype(np.float32)
    mesh = make_mesh(8)
    _, ids = sharded_exact_knn(base, query, 150, mesh, score_budget=1 << 15)
    d = cdist(query, base, metric="sqeuclidean")
    expected = np.argsort(d, axis=1, kind="stable")[:, :150]
    for i in range(16):
        assert set(ids[i]) == set(expected[i]), i
