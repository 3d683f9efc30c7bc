import numpy as np
import jax
import jax.numpy as jnp


def test_probe_cap_matches_dense_when_uncapped(rng):
    from lira_tpu.engine.serve import QueryEngine
    from lira_tpu.labels.scaler import StandardScaler
    from lira_tpu.models.probing_mlp import init_params
    from lira_tpu.ops.distance import l2_to_centroids
    from lira_tpu.partition.assign import build_bucket_layout
    from lira_tpu.partition.kmeans import kmeans_fit

    n, dim, n_bkt = 600, 8, 8
    x_d = rng.normal(size=(n, dim)).astype(np.float32)
    x_q = rng.normal(size=(11, dim)).astype(np.float32)
    layout = build_bucket_layout(rng.integers(0, n_bkt, size=n), n_bkt, tile=64)
    km = kmeans_fit(x_d, n_bkt, niter=2, seed=0)
    raw = np.asarray(l2_to_centroids(jnp.asarray(x_d), jnp.asarray(km.centroids)))
    scaler = StandardScaler().fit(raw)
    params = init_params(jax.random.PRNGKey(0), n_bkt, dim)

    dense = QueryEngine(x_d, layout, km.centroids, scaler, params, tile=64)
    capped = QueryEngine(
        x_d, layout, km.centroids, scaler, params, tile=64, probe_cap=n_bkt
    )
    for thr in (0.2, 0.6, 1.5):
        r1 = dense.search(x_q, thr, k=4)
        r2 = capped.search(x_q, thr, k=4)
        np.testing.assert_array_equal(r1.nprobe, r2.nprobe)
        np.testing.assert_array_equal(r1.ndis, r2.ndis)
        for i in range(len(x_q)):
            assert set(r1.ids[i].tolist()) == set(r2.ids[i].tolist()), (thr, i)


def test_probe_cap_truncates(rng):
    # cap 2: at a low threshold nprobe is limited to 2 highest-scoring buckets
    from lira_tpu.engine.serve import QueryEngine
    from lira_tpu.labels.scaler import StandardScaler
    from lira_tpu.models.probing_mlp import init_params
    from lira_tpu.ops.distance import l2_to_centroids
    from lira_tpu.partition.assign import build_bucket_layout
    from lira_tpu.partition.kmeans import kmeans_fit

    n, dim, n_bkt = 300, 8, 6
    x_d = rng.normal(size=(n, dim)).astype(np.float32)
    layout = build_bucket_layout(rng.integers(0, n_bkt, size=n), n_bkt, tile=64)
    km = kmeans_fit(x_d, n_bkt, niter=2, seed=0)
    raw = np.asarray(l2_to_centroids(jnp.asarray(x_d), jnp.asarray(km.centroids)))
    scaler = StandardScaler().fit(raw)
    params = init_params(jax.random.PRNGKey(0), n_bkt, dim)
    eng = QueryEngine(x_d, layout, km.centroids, scaler, params, tile=64, probe_cap=2)
    r = eng.search(x_d[:5], 0.0, k=3)
    assert (r.nprobe <= 2).all()
    assert (r.nprobe >= 1).all()
