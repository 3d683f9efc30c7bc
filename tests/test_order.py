"""Bucket locality ordering (partition/order.py) + grouping invariance.

The centroid-tour rank only changes which queries share a scan block —
per-query results and ndis must be bit-identical for any rank, and the
tour must actually shorten neighbor distances vs the raw-id order.
"""

import numpy as np
import pytest

from lira_tpu.partition.order import centroid_tour_rank


def test_tour_rank_is_permutation():
    rng = np.random.default_rng(0)
    c = rng.standard_normal((257, 16)).astype(np.float32)
    rank = centroid_tour_rank(c)
    assert rank.dtype == np.int32 and rank.shape == (257,)
    assert np.array_equal(np.sort(rank), np.arange(257))


def test_tour_shortens_neighbor_hops():
    # clustered centroids with shuffled ids: the tour must order them so
    # consecutive buckets are far closer than consecutive raw ids
    rng = np.random.default_rng(1)
    centers = rng.standard_normal((8, 24)) * 20
    c = (centers[rng.integers(0, 8, 512)] +
         rng.standard_normal((512, 24))).astype(np.float32)
    rank = centroid_tour_rank(c)
    order = np.argsort(rank)
    hop_tour = np.linalg.norm(np.diff(c[order], axis=0), axis=1).mean()
    hop_id = np.linalg.norm(np.diff(c, axis=0), axis=1).mean()
    assert hop_tour < 0.5 * hop_id, (hop_tour, hop_id)


def test_pca_fallback_is_permutation():
    rng = np.random.default_rng(2)
    c = rng.standard_normal((300, 8)).astype(np.float32)
    rank = centroid_tour_rank(c, max_exact=100)  # force the PCA path
    assert np.array_equal(np.sort(rank), np.arange(300))


@pytest.mark.parametrize("scan_dtype", ["float32", "bfloat16"])
def test_blocked_results_rank_invariant(scan_dtype):
    """tour vs id grouping on the same engine: identical ids/scores/ndis."""
    import jax
    import jax.numpy as jnp

    from lira_tpu.engine.serve import QueryEngine
    from lira_tpu.labels.scaler import StandardScaler
    from lira_tpu.models.probing_mlp import init_params
    from lira_tpu.ops.distance import l2_to_centroids
    from lira_tpu.partition.assign import build_bucket_layout

    rng = np.random.default_rng(3)
    n, d, n_bkt, k = 4096, 32, 16, 5
    x_d = rng.standard_normal((n, d), dtype=np.float32)
    x_q = rng.standard_normal((96, d), dtype=np.float32)  # uneven vs qb
    cents = rng.standard_normal((n_bkt, d)).astype(np.float32)
    raw = np.asarray(l2_to_centroids(jnp.asarray(x_d), jnp.asarray(cents)))
    layout = build_bucket_layout(raw.argmin(1).astype(np.int32), n_bkt)
    scaler = StandardScaler().fit(raw)
    params = init_params(jax.random.PRNGKey(0), n_bkt, d)

    eng = QueryEngine(x_d, layout, cents, scaler, params, scan_impl="blocked",
                      block_q=64, scan_dtype=scan_dtype, block_order="tour")
    assert eng.bucket_rank is not None
    thr = float(np.quantile(np.asarray(eng.probe(x_q)), 0.7))
    r_tour = eng.search(x_q, thr, k)
    eng.bucket_rank = None  # flip to raw-id grouping on the same engine
    r_id = eng.search(x_q, thr, k)
    np.testing.assert_array_equal(r_tour.ids, r_id.ids)
    np.testing.assert_allclose(r_tour.scores, r_id.scores, rtol=0, atol=0)
    np.testing.assert_array_equal(r_tour.ndis, r_id.ndis)
    np.testing.assert_array_equal(r_tour.nprobe, r_id.nprobe)
