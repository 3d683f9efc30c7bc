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
