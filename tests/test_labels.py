import numpy as np
import pytest

from lira_tpu.labels.scaler import StandardScaler, scaled_centroid_distances
from lira_tpu.labels.distr import (
    knn_bucket_labels,
    knn_bucket_counts,
    gt_bucket_map,
    label_recall,
)


# ---------- scaler ----------


def test_scaler_matches_sklearn(rng):
    from sklearn.preprocessing import StandardScaler as SkScaler

    x = rng.normal(loc=3.0, scale=2.0, size=(500, 7)).astype(np.float32)
    ours = StandardScaler().fit(x)
    theirs = SkScaler().fit(x)
    np.testing.assert_allclose(ours.mean_, theirs.mean_, rtol=1e-5)
    np.testing.assert_allclose(ours.scale_, theirs.scale_, rtol=1e-5)
    np.testing.assert_allclose(ours.transform(x), theirs.transform(x), rtol=1e-3, atol=1e-4)


def test_scaler_zero_variance():
    x = np.ones((10, 3), dtype=np.float32)
    x[:, 1] = np.arange(10)
    sc = StandardScaler().fit(x)
    assert sc.scale_[0] == 1.0 and sc.scale_[2] == 1.0
    out = sc.transform(x)
    np.testing.assert_allclose(out[:, 0], 0.0)


def test_scaler_streaming_matches_full(rng):
    x = rng.normal(size=(1000, 5)).astype(np.float32)
    full = StandardScaler().fit(x)
    stream = StandardScaler()
    for s in range(0, 1000, 128):
        stream.partial_fit(x[s : s + 128])
    np.testing.assert_allclose(stream.mean_, full.mean_, rtol=1e-5)
    np.testing.assert_allclose(stream.scale_, full.scale_, rtol=1e-5)


def test_scaler_save_load(tmp_path, rng):
    x = rng.normal(size=(50, 4)).astype(np.float32)
    sc = StandardScaler().fit(x)
    sc.save(str(tmp_path), "pfx")
    sc2 = StandardScaler.load(str(tmp_path), "pfx")
    np.testing.assert_allclose(sc2.transform(x), sc.transform(x))


def test_scaled_centroid_distances(rng):
    from scipy.spatial.distance import cdist
    from sklearn.preprocessing import StandardScaler as SkScaler

    x_d = rng.normal(size=(300, 8)).astype(np.float32)
    x_q = rng.normal(size=(20, 8)).astype(np.float32)
    c = rng.normal(size=(6, 8)).astype(np.float32)
    dd, dq, sc = scaled_centroid_distances(x_d, x_q, c, chunk_rows=64)

    raw_d = cdist(x_d, c).astype(np.float32)
    raw_q = cdist(x_q, c).astype(np.float32)
    sk = SkScaler().fit(raw_d)
    np.testing.assert_allclose(dd, sk.transform(raw_d), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(dq, sk.transform(raw_q), rtol=1e-3, atol=1e-3)


# ---------- label construction (golden-tested against reference-semantics oracles) ----------


def _oracle_labels(knn, data_2_bkt, n_bkt):
    """Direct per-row re-statement of the reference 0/1 labeler semantics
    (utils.py:381-405): bucket gets 1 iff any neighbor's valid slot maps there."""
    n = knn.shape[0]
    labels = np.zeros((n, n_bkt), dtype=np.uint8)
    for i in range(n):
        bkts = data_2_bkt[knn[i]].flatten()
        bkts = np.unique(bkts[bkts != -1])
        labels[i, bkts] = 1
    return labels


def _oracle_counts(knn, data_2_bkt, n_bkt):
    """Count semantics of get_knn_distr_redundancy (utils.py:354-379)."""
    n = knn.shape[0]
    counts = np.zeros((n, n_bkt), dtype=np.int32)
    for i in range(n):
        bkts = data_2_bkt[knn[i]].flatten()
        u, c = np.unique(bkts[bkts != -1], return_counts=True)
        counts[i, u] = c
    return counts


@pytest.fixture
def label_case(rng):
    n, k, n_bkt, n_mul = 50, 5, 8, 2
    knn = rng.integers(0, 200, size=(n, k)).astype(np.int32)
    data_2_bkt = np.full((200, n_mul), -1, dtype=np.int32)
    data_2_bkt[:, 0] = rng.integers(0, n_bkt, size=200)
    # ~30% of points get a replica bucket
    mask = rng.random(200) < 0.3
    data_2_bkt[mask, 1] = rng.integers(0, n_bkt, size=mask.sum())
    return knn, data_2_bkt, n_bkt


def test_labels_match_oracle(label_case):
    knn, d2b, n_bkt = label_case
    np.testing.assert_array_equal(
        knn_bucket_labels(knn, d2b, n_bkt), _oracle_labels(knn, d2b, n_bkt)
    )


def test_counts_match_oracle(label_case):
    knn, d2b, n_bkt = label_case
    np.testing.assert_array_equal(
        knn_bucket_counts(knn, d2b, n_bkt), _oracle_counts(knn, d2b, n_bkt)
    )


def test_labels_1d_assignment():
    knn = np.array([[0, 1], [2, 3]])
    assign = np.array([0, 0, 1, 2])
    labels = knn_bucket_labels(knn, assign, 3)
    np.testing.assert_array_equal(labels, [[1, 0, 0], [0, 1, 1]])


def test_gt_bucket_map():
    knn = np.array([[0, 2]])
    d2b = np.array([[1, -1], [0, 2], [3, 1]])
    out = gt_bucket_map(knn, d2b)
    np.testing.assert_array_equal(out, [[[1, -1], [3, 1]]])


def test_label_recall():
    # query 0: neighbors in buckets {1},{3 or 1}; probe {1} -> both covered
    knn = np.array([[0, 2]])
    d2b = np.array([[1, -1], [0, 2], [3, 1]])
    gtb = gt_bucket_map(knn, d2b)
    predicts = np.zeros((1, 4), dtype=bool)
    predicts[0, 1] = True
    np.testing.assert_allclose(label_recall(predicts, gtb, k=2), [1.0])
    predicts2 = np.zeros((1, 4), dtype=bool)
    predicts2[0, 3] = True  # covers only neighbor 2 (bucket 3)
    np.testing.assert_allclose(label_recall(predicts2, gtb, k=2), [0.5])
    # probe nothing -> 0
    np.testing.assert_allclose(label_recall(np.zeros((1, 4), bool), gtb, k=2), [0.0])


def test_scaled_distances_device_resident_matches_host(rng):
    """The on-device shifted-moment scaler path must match the host
    (sklearn-parity) path to float tolerance and return the same features."""
    x_d = rng.normal(loc=2.0, size=(3000, 12)).astype(np.float32)
    x_q = rng.normal(size=(40, 12)).astype(np.float32)
    cent = rng.normal(size=(9, 12)).astype(np.float32)
    d_host, q_host, sc_host = scaled_centroid_distances(
        x_d, x_q, cent, chunk_rows=700, device_resident=False
    )
    d_dev, q_dev, sc_dev = scaled_centroid_distances(
        x_d, x_q, cent, chunk_rows=700, device_resident=True
    )
    np.testing.assert_allclose(sc_dev.mean_, sc_host.mean_, rtol=1e-5)
    np.testing.assert_allclose(sc_dev.scale_, sc_host.scale_, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d_dev), d_host, rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(q_dev, q_host, rtol=1e-4, atol=1e-5)


def test_negative_knn_ids_masked():
    """-1 neighbor padding (knn_fused's k > candidates contract) must not
    wrap around to the LAST corpus point's buckets."""
    from lira_tpu.labels.distr import gt_bucket_map, knn_bucket_counts, knn_bucket_labels

    d2b = np.array([[0], [1], [2], [3]], np.int32)  # point 3 -> bucket 3
    knn = np.array([[0, -1], [1, -1]], np.int32)
    labels = knn_bucket_labels(knn, d2b, 4)
    assert labels[0, 3] == 0 and labels[1, 3] == 0  # no wraparound to bucket 3
    assert labels[0, 0] == 1 and labels[1, 1] == 1
    counts = knn_bucket_counts(knn, d2b, 4)
    assert counts[:, 3].sum() == 0
    gmap = gt_bucket_map(knn, d2b)
    assert gmap[0, 1, 0] == -1 and gmap[1, 1, 0] == -1


def test_scaled_distances_respects_given_scaler_device_resident():
    """device_resident=True with a caller scaler must standardize with the
    CALLER's moments, not silently refit on the new data."""
    from lira_tpu.labels.scaler import StandardScaler, scaled_centroid_distances

    rng = np.random.default_rng(6)
    x = rng.normal(size=(300, 8)).astype(np.float32)
    c = rng.normal(size=(5, 8)).astype(np.float32)
    sc = StandardScaler()
    sc.mean_ = np.full(5, 2.5, np.float32)
    sc.scale_ = np.full(5, 3.0, np.float32)
    d_dev, _, sc_out = scaled_centroid_distances(
        x, None, c, scaler=sc, device_resident=True
    )
    d_host, _, _ = scaled_centroid_distances(
        x, None, c, scaler=sc, device_resident=False
    )
    assert sc_out is sc
    np.testing.assert_allclose(np.asarray(d_dev), d_host, rtol=1e-5, atol=1e-5)
