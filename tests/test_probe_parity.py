import numpy as np
import jax
import jax.numpy as jnp


def test_engine_probe_matches_composed_ops(rng):
    """engine.probe == sqrt-L2 features → scaler → MLP applied stepwise
    (the serving contract the reference's C++ engine re-implements,
    search.cpp:219-250 + :431-445)."""
    from lira_tpu.engine.serve import QueryEngine
    from lira_tpu.labels.scaler import StandardScaler
    from lira_tpu.models.probing_mlp import init_params, forward
    from lira_tpu.ops.distance import l2_to_centroids
    from lira_tpu.partition.assign import build_bucket_layout

    n, dim, n_bkt = 300, 8, 5
    x_d = rng.normal(size=(n, dim)).astype(np.float32)
    x_q = rng.normal(size=(9, dim)).astype(np.float32)
    centroids = rng.normal(size=(n_bkt, dim)).astype(np.float32)
    layout = build_bucket_layout(rng.integers(0, n_bkt, size=n), n_bkt, tile=64)
    raw = np.asarray(l2_to_centroids(jnp.asarray(x_d), jnp.asarray(centroids)))
    scaler = StandardScaler().fit(raw)
    params = init_params(jax.random.PRNGKey(1), n_bkt, dim)

    eng = QueryEngine(x_d, layout, centroids, scaler, params, tile=64)
    got = eng.probe(x_q)

    feats = scaler.transform(np.asarray(l2_to_centroids(jnp.asarray(x_q), jnp.asarray(centroids))))
    expected = np.asarray(forward(params, jnp.asarray(feats), jnp.asarray(x_q)))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)
