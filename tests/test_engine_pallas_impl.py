import numpy as np
import pytest


def _build_engines(rng, metric, **kw):
    import jax
    from lira_tpu.engine.serve import QueryEngine
    from lira_tpu.labels.scaler import StandardScaler
    from lira_tpu.models.probing_mlp import init_params
    from lira_tpu.ops.distance import l2_to_centroids
    from lira_tpu.partition.assign import build_bucket_layout
    from lira_tpu.partition.kmeans import kmeans_fit
    import jax.numpy as jnp

    n, dim, n_bkt = 700, 8, 5
    x_d = rng.normal(size=(n, dim)).astype(np.float32)
    x_q = rng.normal(size=(12, dim)).astype(np.float32)
    d2b = np.full((n, 2), -1, dtype=np.int32)
    d2b[:, 0] = rng.integers(0, n_bkt, size=n)
    layout = build_bucket_layout(d2b, n_bkt, tile=128)
    km = kmeans_fit(x_d, n_bkt, niter=3, seed=0)
    raw = np.asarray(l2_to_centroids(jnp.asarray(x_d), jnp.asarray(km.centroids)))
    scaler = StandardScaler().fit(raw)
    params = init_params(jax.random.PRNGKey(0), n_bkt, dim)

    e_xla = QueryEngine(x_d, layout, km.centroids, scaler, params, metric=metric)
    e_pl = QueryEngine(
        x_d, layout, km.centroids, scaler, params, metric=metric, scan_impl="pallas", **kw
    )
    return x_q, e_xla, e_pl


@pytest.mark.parametrize("metric", ["L2", "inner_product"])
def test_engine_pallas_impl_matches_xla(rng, metric):
    """QueryEngine(scan_impl='pallas') returns the same neighbor sets."""
    x_q, e_xla, e_pl = _build_engines(rng, metric)
    for thr in (0.0, 0.6):
        r1 = e_xla.search(x_q, thr, k=4)
        r2 = e_pl.search(x_q, thr, k=4)
        np.testing.assert_array_equal(r1.nprobe, r2.nprobe)
        for i in range(len(x_q)):
            assert set(r1.ids[i][r1.ids[i] >= 0]) == set(r2.ids[i][r2.ids[i] >= 0]), (thr, i)


def test_engine_pallas_wide_fetch_falls_back(rng):
    """fetch_k > 128 exceeds the kernel's per-lane stack: the engine must
    fall back to the XLA scan rather than silently dropping candidates."""
    x_q, e_xla, e_pl = _build_engines(rng, "L2", n_mul=40)  # fetch_k = 4*40 > 128
    r1 = e_xla.search(x_q, 0.0, k=4)
    r2 = e_pl.search(x_q, 0.0, k=4)
    for i in range(len(x_q)):
        assert set(r1.ids[i][r1.ids[i] >= 0]) == set(r2.ids[i][r2.ids[i] >= 0])


def test_pallas_probed_scan_rejects_k_over_128():
    import jax.numpy as jnp
    from lira_tpu.engine.pallas_scan import pallas_probed_scan

    with pytest.raises(ValueError, match="k <= 128"):
        pallas_probed_scan(
            jnp.zeros((8, 8)), jnp.zeros((8, 2), jnp.int32),
            jnp.zeros((2, 128, 8)), jnp.zeros((2, 128), jnp.int32),
            jnp.zeros((2, 128)), k=129,
        )
