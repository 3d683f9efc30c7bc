import numpy as np
import pytest
from scipy.spatial.distance import cdist

from lira_tpu.ops.knn_pallas import knn_fused, self_knn_fused


def test_knn_fused_matches_oracle(rng):
    base = rng.normal(size=(3000, 16)).astype(np.float32)
    query = rng.normal(size=(50, 16)).astype(np.float32)
    _, ids = knn_fused(base, query, k=5, interpret=True, precision="highest")
    d = cdist(query, base, metric="sqeuclidean")
    expected = np.argsort(d, axis=1, kind="stable")[:, :5]
    np.testing.assert_array_equal(ids, expected)


@pytest.mark.parametrize("metric", ["L2", "inner_product"])
def test_knn_fused_int8(rng, metric):
    """int8 round-1 sweep + f32 round-2 rescan.  With an exhaustive margin
    (kg covers all 24 tiles) selection cannot miss, so results must match
    the exact oracle bit-for-bit regardless of quantization error; at the
    default margin (16) misses are possible in principle but must be rare
    on this scale."""
    base = rng.normal(size=(3000, 16)).astype(np.float32)
    query = rng.normal(size=(50, 16)).astype(np.float32)
    if metric == "inner_product":
        expected = np.argsort(-(query @ base.T), axis=1, kind="stable")[:, :5]
    else:
        d = cdist(query, base, metric="sqeuclidean")
        expected = np.argsort(d, axis=1, kind="stable")[:, :5]
    _, ids = knn_fused(base, query, k=5, metric=metric, interpret=True,
                       precision="int8", margin=24)
    np.testing.assert_array_equal(ids, expected)
    _, ids_def = knn_fused(base, query, k=5, metric=metric, interpret=True,
                           precision="int8")
    recall = (ids_def[:, :, None] == expected[:, None, :]).any(1).mean()
    assert recall >= 0.98, recall


def test_knn_fused_ip(rng):
    base = rng.normal(size=(2100, 8)).astype(np.float32)
    query = rng.normal(size=(20, 8)).astype(np.float32)
    _, ids = knn_fused(base, query, k=4, metric="inner_product", interpret=True, precision="highest")
    expected = np.argsort(-(query @ base.T), axis=1, kind="stable")[:, :4]
    np.testing.assert_array_equal(ids, expected)


def test_knn_fused_unpadded(rng):
    # n not a multiple of the 2048 chunk; padding must not leak
    base = rng.normal(size=(2500, 12)).astype(np.float32)
    query = rng.normal(size=(9, 12)).astype(np.float32)
    _, ids = knn_fused(base, query, k=3, interpret=True, precision="highest")
    assert ids.max() < 2500
    d = cdist(query, base, metric="sqeuclidean")
    expected = np.argsort(d, axis=1, kind="stable")[:, :3]
    np.testing.assert_array_equal(ids, expected)


def test_self_knn_fused(rng):
    base = rng.normal(size=(2048, 8)).astype(np.float32)
    knn = np.asarray(self_knn_fused(base, k=4, interpret=True, precision="highest"))
    d = cdist(base, base, metric="sqeuclidean")
    np.fill_diagonal(d, np.inf)
    expected = np.argsort(d, axis=1, kind="stable")[:, :4]
    # the fused kernel scores ‖x‖²−2x·q in f32 while scipy computes
    # ‖x−q‖²: candidates within one ULP of the k-th distance can swap
    # (one observed swap at 5e-8 apart in a 2048×8 draw) — compare the
    # DISTANCES of the returned ids, and ids exactly where no tie exists
    rows = np.arange(len(base))[:, None]
    np.testing.assert_allclose(d[rows, knn], d[rows, expected], rtol=1e-6)
    tied = np.isclose(d[rows, knn], d[rows, expected], rtol=1e-6) & (knn != expected)
    np.testing.assert_array_equal(np.where(tied, expected, knn), expected)
    assert all(len(set(r)) == len(r) for r in knn)  # distinct neighbors
    assert not (knn == np.arange(len(base))[:, None]).any()  # self excluded


def test_knn_fused_adversarial_tile_concentration(rng):
    # all true top-k inside a single tile: group-selection must keep it
    base = rng.normal(size=(4096, 8)).astype(np.float32) * 100
    query = np.zeros((8, 8), dtype=np.float32)
    base[256:266] = rng.normal(size=(10, 8)) * 0.01  # 10 closest, one tile
    _, ids = knn_fused(base, query, k=10, interpret=True, precision="highest")
    for b in range(8):
        assert set(ids[b]) == set(range(256, 266))


def test_r1_blocks_vmem_budget():
    """Round-1 block sizes shrink with d so the kernel stays under the
    16 MB scoped-VMEM limit — the constraint is the EMPIRICAL fit
    8d(qb+cb) + 12·qb·cb ≤ 15.5M validated by compile-probes against the
    real v5e Mosaic compiler (see _r1_blocks; the fixed (512, 2048)
    blocks failed at d=960 — logs/gist_dim_bench.log)."""
    from lira_tpu.ops.knn_pallas import _r1_blocks

    for d in (16, 128, 512, 960, 1024, 1536):
        qb, cb = _r1_blocks(d)
        assert 8 * d * (qb + cb) + 12 * qb * cb <= int(15.5 * 1024 * 1024), (d, qb, cb)
        assert qb % 128 == 0 and cb % 1024 == 0
        assert 512 % qb == 0  # q_tile (multiple of 512) stays divisible
    assert _r1_blocks(128) == (512, 2048)  # 128d keeps the measured blocks
    # d=960: the real-compiler probe matrix admits (256, 1024) and
    # (128, 1024) only — the fit must pick the larger q_block
    assert _r1_blocks(960) == (256, 1024)
    # beyond ~1.6k dims no legal block shape fits → None → XLA exact path
    assert _r1_blocks(3072) is None and _r1_blocks(8192) is None


def test_knn_fused_ultrawide_xla_fallback(rng):
    """d > ~1.6k has no legal Pallas block shape — knn_fused must fall
    through to the XLA exact path and stay exact."""
    base = rng.normal(size=(200, 3072)).astype(np.float32)
    query = rng.normal(size=(8, 3072)).astype(np.float32)
    _, ids = knn_fused(base, query, k=4, interpret=True, precision="highest")
    d = cdist(query, base, metric="sqeuclidean")
    expected = np.argsort(d, axis=1, kind="stable")[:, :4]
    np.testing.assert_array_equal(np.asarray(ids), expected)


def test_knn_fused_gist_dim(rng):
    """Exactness at GIST dimensionality (d=960) where the d-aware blocks
    and the budgeted round-2 sub-batch take effect."""
    base = rng.normal(size=(700, 960)).astype(np.float32)
    query = rng.normal(size=(20, 960)).astype(np.float32)
    _, ids = knn_fused(base, query, k=5, interpret=True, precision="highest")
    d = cdist(query, base, metric="sqeuclidean")
    expected = np.argsort(d, axis=1, kind="stable")[:, :5]
    np.testing.assert_array_equal(ids, expected)


def test_knn_fused_bound_queue_path(monkeypatch):
    """The large-corpus dispatch-queue bound fetches each q-tile's results
    to host (a TRUE sync — block_until_ready does not wait on the axon
    remote backend) and assembles on host.  Forcing the path at unit scale
    must be bit-identical to the device-assembly path."""
    from lira_tpu.ops import knn_pallas

    rng = np.random.default_rng(11)
    base = rng.normal(size=(700, 16)).astype(np.float32)
    q = rng.normal(size=(40, 16)).astype(np.float32)
    s_ref, i_ref = knn_pallas.knn_fused(base, q, 5, q_tile=512)
    monkeypatch.setattr(knn_pallas, "_QUEUE_BOUND_BYTES", 1)
    s_b, i_b = knn_pallas.knn_fused(base, q, 5, q_tile=512)
    np.testing.assert_array_equal(i_ref, i_b)
    np.testing.assert_allclose(s_ref, s_b, rtol=0, atol=0)


def test_knn_fused_bound_queue_window_rotation(monkeypatch):
    """The trailing-fetch window (_QUEUE_WINDOW tiles behind dispatch) must
    assemble tiles in order across >window tiles plus a ragged tail."""
    from lira_tpu.ops import knn_pallas

    rng = np.random.default_rng(12)
    base = rng.normal(size=(700, 16)).astype(np.float32)
    q = rng.normal(size=(2210, 16)).astype(np.float32)  # 4 full tiles + 162
    s_ref, i_ref = knn_pallas.knn_fused(base, q, 5, q_tile=512)
    monkeypatch.setattr(knn_pallas, "_QUEUE_BOUND_BYTES", 1)
    for window in (1, 2, 7):  # drain-every-tile / shipped / larger-than-loop
        monkeypatch.setattr(knn_pallas, "_QUEUE_WINDOW", window)
        s_b, i_b = knn_pallas.knn_fused(base, q, 5, q_tile=512)
        np.testing.assert_array_equal(i_ref, i_b)
        np.testing.assert_allclose(s_ref, s_b, rtol=0, atol=0)
