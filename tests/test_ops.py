import numpy as np
import jax.numpy as jnp
from scipy.spatial.distance import cdist

from lira_tpu.ops.distance import pairwise_scores, scores_to_distances, l2_to_centroids
from lira_tpu.ops.knn import exact_knn, self_knn


def test_pairwise_l2_matches_cdist(rng):
    q = rng.normal(size=(17, 9)).astype(np.float32)
    b = rng.normal(size=(23, 9)).astype(np.float32)
    s = pairwise_scores(jnp.asarray(q), jnp.asarray(b))
    d2 = scores_to_distances(s, jnp.asarray(q))
    expected = cdist(q, b, metric="sqeuclidean")
    np.testing.assert_allclose(np.asarray(d2), expected, rtol=1e-4, atol=1e-4)


def test_pairwise_ip(rng):
    q = rng.normal(size=(7, 5)).astype(np.float32)
    b = rng.normal(size=(11, 5)).astype(np.float32)
    s = pairwise_scores(jnp.asarray(q), jnp.asarray(b), metric="inner_product")
    np.testing.assert_allclose(np.asarray(s), -(q @ b.T), rtol=1e-5, atol=1e-5)


def test_l2_to_centroids_matches_cdist(rng):
    x = rng.normal(size=(50, 12)).astype(np.float32)
    c = rng.normal(size=(8, 12)).astype(np.float32)
    d = l2_to_centroids(jnp.asarray(x), jnp.asarray(c))
    expected = cdist(x, c, metric="euclidean")
    np.testing.assert_allclose(np.asarray(d), expected, rtol=1e-4, atol=1e-4)


def test_exact_knn_matches_numpy(rng):
    base = rng.normal(size=(500, 16)).astype(np.float32)
    query = rng.normal(size=(37, 16)).astype(np.float32)
    _, ids = exact_knn(base, query, k=5, q_tile=16, b_tile=128)
    d = cdist(query, base, metric="sqeuclidean")
    expected = np.argsort(d, axis=1, kind="stable")[:, :5]
    np.testing.assert_array_equal(ids, expected)


def test_exact_knn_ip(rng):
    base = rng.normal(size=(300, 8)).astype(np.float32)
    query = rng.normal(size=(11, 8)).astype(np.float32)
    _, ids = exact_knn(base, query, k=4, metric="inner_product", q_tile=8, b_tile=128)
    expected = np.argsort(-(query @ base.T), axis=1, kind="stable")[:, :4]
    np.testing.assert_array_equal(ids, expected)


def test_exact_knn_unpadded_shapes(rng):
    # n_b and n_q not multiples of tiles; padding must not leak into results
    base = rng.normal(size=(97, 7)).astype(np.float32)
    query = rng.normal(size=(13, 7)).astype(np.float32)
    _, ids = exact_knn(base, query, k=3, q_tile=8, b_tile=128)
    d = cdist(query, base, metric="sqeuclidean")
    expected = np.argsort(d, axis=1, kind="stable")[:, :3]
    np.testing.assert_array_equal(ids, expected)
    assert ids.max() < 97


def test_self_knn_excludes_self(rng):
    base = rng.normal(size=(200, 8)).astype(np.float32)
    knn = self_knn(base, k=5, q_tile=16, b_tile=128)
    assert knn.shape == (200, 5)
    rows = np.arange(200)[:, None]
    assert not (knn == rows).any()
    # matches numpy oracle with self removed
    d = cdist(base, base, metric="sqeuclidean")
    np.fill_diagonal(d, np.inf)
    expected = np.argsort(d, axis=1, kind="stable")[:, :5]
    np.testing.assert_array_equal(knn, expected)


def test_self_knn_with_duplicates():
    # exact duplicate rows: self may not rank first; exactly one slot dropped per row
    base = np.ones((10, 4), dtype=np.float32)
    base[5:] = 2.0
    knn = self_knn(base, k=3, q_tile=8, b_tile=128)
    assert knn.shape == (10, 3)
    rows = np.arange(10)[:, None]
    assert not (knn == rows).any()
    # each row's neighbors are the other duplicates of its value group
    assert set(knn[0]) <= set(range(1, 5))
    assert set(knn[7]) <= {5, 6, 8, 9}


def test_self_knn_k_ge_n_pads():
    """k >= n: only n-1 real neighbors exist — pad with -1, don't crash."""
    from lira_tpu.ops.knn import self_knn

    rng = np.random.default_rng(3)
    x = rng.normal(size=(6, 4)).astype(np.float32)
    ids = self_knn(x, 8)
    assert ids.shape == (6, 8)
    for i in range(6):
        real = ids[i][ids[i] >= 0]
        assert set(real) == set(range(6)) - {i}  # all others, no self
        assert (ids[i][len(real):] == -1).all()


def test_exact_knn_odd_b_tile():
    """b_tile is rounded up to the kernel's 128-row contract."""
    from lira_tpu.ops.knn import exact_knn

    rng = np.random.default_rng(4)
    x = rng.normal(size=(500, 8)).astype(np.float32)
    q = rng.normal(size=(9, 8)).astype(np.float32)
    _, ids = exact_knn(x, q, 5, b_tile=100)  # not a multiple of 128
    gt = np.argsort(((x[None] - q[:, None]) ** 2).sum(-1), axis=1)[:, :5]
    for i in range(9):
        assert set(ids[i]) == set(gt[i])


def test_exact_knn_device_resident_query():
    """A jax.Array query must not be bounced through the host."""
    import jax.numpy as jnp
    from lira_tpu.ops.knn import exact_knn

    rng = np.random.default_rng(5)
    x = rng.normal(size=(400, 8)).astype(np.float32)
    q = rng.normal(size=(33, 8)).astype(np.float32)
    _, ids_np = exact_knn(x, q, 5)
    _, ids_dev = exact_knn(x, jnp.asarray(q), 5)
    np.testing.assert_array_equal(ids_np, ids_dev)


def test_exact_knn_stream_matches_whole():
    """Chunk-streamed exact kNN (the >=50M one-chip GT path) merges per-chunk
    top-k into the same neighbors and scores as the whole-corpus pass,
    including uneven final chunks and chunk boundaries splitting neighbors."""
    from lira_tpu.ops.knn import exact_knn, exact_knn_stream

    rng = np.random.default_rng(6)
    x = rng.normal(size=(1000, 12)).astype(np.float32)
    q = rng.normal(size=(17, 12)).astype(np.float32)
    s_ref, i_ref = exact_knn(x, q, 7)
    for chunk in (64, 333, 1000, 4096):
        s_st, i_st = exact_knn_stream(x, q, 7, base_chunk=chunk)
        for i in range(len(q)):
            assert set(i_st[i]) == set(i_ref[i]), (chunk, i)
        np.testing.assert_allclose(np.sort(s_st, 1), np.sort(s_ref, 1), rtol=1e-5, atol=1e-5)

    # inner product metric
    s_ref, i_ref = exact_knn(x, q, 5, metric="inner_product")
    s_st, i_st = exact_knn_stream(x, q, 5, metric="inner_product", base_chunk=256)
    for i in range(len(q)):
        assert set(i_st[i]) == set(i_ref[i]), i

    # n < k pads with -1
    s_st, i_st = exact_knn_stream(x[:3], q, 5, base_chunk=2)
    assert (i_st[:, 3:] == -1).all() and np.isinf(s_st[:, 3:]).all()
