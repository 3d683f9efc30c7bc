import numpy as np
import jax
import jax.numpy as jnp


def _mk_engine(rng, n_mul=1, **kw):
    from lira_tpu.engine.serve import QueryEngine
    from lira_tpu.labels.scaler import StandardScaler
    from lira_tpu.models.probing_mlp import init_params
    from lira_tpu.ops.distance import l2_to_centroids
    from lira_tpu.partition.assign import build_bucket_layout
    from lira_tpu.partition.kmeans import kmeans_fit

    n, dim, n_bkt = 500, 8, 4
    x_d = rng.normal(size=(n, dim)).astype(np.float32)
    d2b = rng.integers(0, n_bkt, size=n).astype(np.int32)
    layout = build_bucket_layout(d2b, n_bkt, tile=64)
    km = kmeans_fit(x_d, n_bkt, niter=2, seed=0)
    raw = np.asarray(l2_to_centroids(jnp.asarray(x_d), jnp.asarray(km.centroids)))
    scaler = StandardScaler().fit(raw)
    params = init_params(jax.random.PRNGKey(0), n_bkt, dim)
    return QueryEngine(x_d, layout, km.centroids, scaler, params, tile=64, n_mul=n_mul, **kw), x_d


def test_engine_n_mul_1(rng):
    eng, x_d = _mk_engine(rng, n_mul=1)
    q = x_d[:7]
    r = eng.search(q, 0.0, k=3)
    d = ((q[:, None, :] - x_d[None]) ** 2).sum(-1)
    expected = np.argsort(d, axis=1, kind="stable")[:, :3]
    np.testing.assert_array_equal(np.sort(r.ids, 1), np.sort(expected, 1))


def test_engine_k_larger_than_results(rng):
    # k larger than some probed bucket populations: -1 padding only when
    # the whole probed set is smaller than k
    eng, x_d = _mk_engine(rng)
    r = eng.search(x_d[:3], 1.5, k=200)  # fallback to 1 bucket, k > bucket size
    assert r.ids.shape == (3, 200)
    assert (r.ids >= -1).all()
    valid_counts = (r.ids >= 0).sum(axis=1)
    assert (valid_counts == np.minimum(r.ndis, 200)).all()


def test_sweep_with_qps_fn():
    from lira_tpu.engine.sweep import threshold_sweep

    outputs = np.random.default_rng(0).random((5, 4)).astype(np.float32)
    rows = threshold_sweep(
        outputs,
        np.zeros((5, 2, 1), np.int32),
        np.zeros((5, 2, 1), bool),
        np.ones(4),
        k=2,
        thresholds=np.array([0.2, 0.6]),
        qps_fn=lambda thr: 1000.0 * thr,
    )
    assert rows[0].qps == 200.0
    assert rows[1].qps == 600.0
