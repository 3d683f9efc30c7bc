import numpy as np
import jax


def test_bf16_serving_matches_f32(rng):
    from lira_tpu.engine.serve import QueryEngine
    from lira_tpu.labels.scaler import StandardScaler
    from lira_tpu.models.probing_mlp import init_params
    from lira_tpu.ops.distance import l2_to_centroids
    from lira_tpu.partition.assign import build_bucket_layout
    from lira_tpu.partition.kmeans import kmeans_fit
    import jax.numpy as jnp

    n, dim, n_bkt = 900, 16, 6
    x_d = rng.normal(size=(n, dim)).astype(np.float32)
    x_q = rng.normal(size=(15, dim)).astype(np.float32)
    d2b = np.full((n, 2), -1, dtype=np.int32)
    d2b[:, 0] = rng.integers(0, n_bkt, size=n)
    layout = build_bucket_layout(d2b, n_bkt, tile=64)
    km = kmeans_fit(x_d, n_bkt, niter=3, seed=0)
    raw = np.asarray(l2_to_centroids(jnp.asarray(x_d), jnp.asarray(km.centroids)))
    scaler = StandardScaler().fit(raw)
    params = init_params(jax.random.PRNGKey(0), n_bkt, dim)

    e32 = QueryEngine(x_d, layout, km.centroids, scaler, params, tile=64)
    e16 = QueryEngine(x_d, layout, km.centroids, scaler, params, tile=64, scan_dtype="bfloat16")

    for thr in (0.0, 0.5):
        r32 = e32.search(x_q, thr, k=5)
        r16 = e16.search(x_q, thr, k=5)
        np.testing.assert_array_equal(r32.ndis, r16.ndis)
        for i in range(len(x_q)):
            s32 = set(int(v) for v in r32.ids[i] if v >= 0)
            s16 = set(int(v) for v in r16.ids[i] if v >= 0)
            assert s32 == s16, (thr, i)
