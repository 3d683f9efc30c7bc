import numpy as np
import pytest

from lira_tpu.io.xvecs import read_xvecs, write_xvecs
from lira_tpu.io.datasets import synthetic_dataset, write_dataset, load_data, _exact_knn_numpy
from lira_tpu.io.cache import (
    save_knn_cache,
    load_knn_cache,
    find_knn_cache,
    read_knn_meta,
)


@pytest.mark.parametrize(
    "ext,dtype",
    [("fvecs", np.float32), ("ivecs", np.int32), ("bvecs", np.uint8)],
)
def test_xvecs_roundtrip(tmp_path, rng, ext, dtype):
    if dtype == np.uint8:
        x = rng.integers(0, 256, size=(17, 9)).astype(dtype)
    elif dtype == np.int32:
        x = rng.integers(-1000, 1000, size=(17, 9)).astype(dtype)
    else:
        x = rng.normal(size=(17, 9)).astype(dtype)
    path = str(tmp_path / f"test.{ext}")
    write_xvecs(path, x)
    y = read_xvecs(path)
    assert y.shape == x.shape
    assert y.dtype == dtype
    np.testing.assert_array_equal(np.asarray(y), x)


def test_xvecs_missing_file():
    with pytest.raises(FileNotFoundError):
        read_xvecs("/nonexistent/file.fvecs")


def test_dataset_write_load(tmp_path):
    bundle = synthetic_dataset(n_base=500, n_query=10, dim=8, n_clusters=4, k_gt=5)
    write_dataset(bundle, str(tmp_path))
    loaded = load_data("synthetic", data_path=str(tmp_path))
    np.testing.assert_allclose(loaded.base, bundle.base)
    np.testing.assert_allclose(loaded.query, bundle.query)
    np.testing.assert_array_equal(loaded.groundtruth, bundle.groundtruth)


def test_synthetic_groundtruth_is_exact():
    bundle = synthetic_dataset(n_base=300, n_query=5, dim=8, n_clusters=4, k_gt=10)
    # brute-force check of first query
    d = ((bundle.base - bundle.query[0]) ** 2).sum(axis=1)
    expected = np.argsort(d, kind="stable")[:10]
    np.testing.assert_array_equal(bundle.groundtruth[0], expected)


def test_exact_knn_ip_metric():
    bundle = synthetic_dataset(n_base=200, n_query=4, dim=8, compute_gt=False)
    gt = _exact_knn_numpy(bundle.base, bundle.query, 5, metric="inner_product")
    scores = bundle.query[0] @ bundle.base.T
    expected = np.argsort(-scores, kind="stable")[:5]
    np.testing.assert_array_equal(gt[0], expected)


def test_knn_cache_roundtrip(tmp_path):
    knn = np.arange(40, dtype=np.int32).reshape(10, 4)
    path = save_knn_cache(
        str(tmp_path), "toy", knn, dim=8, method="flat_exact", timings={"search_time": 1.5}
    )
    assert find_knn_cache(str(tmp_path), "toy", 4, 10) == path
    loaded = load_knn_cache(str(tmp_path), "toy", 4, 10)
    np.testing.assert_array_equal(loaded, knn)
    meta = read_knn_meta(path)
    assert meta["dataset"] == "toy"
    assert meta["method"] == "flat_exact"
    assert meta["k"] == "4"


def test_knn_cache_prefers_ivf(tmp_path):
    knn_exact = np.zeros((10, 4), dtype=np.int32)
    knn_ivf = np.ones((10, 4), dtype=np.int32)
    save_knn_cache(str(tmp_path), "toy", knn_exact, dim=8, method="flat_exact")
    save_knn_cache(
        str(tmp_path), "toy", knn_ivf, dim=8, method="ivf_approximate", nprobe=16, n_clusters=64
    )
    loaded = load_knn_cache(str(tmp_path), "toy", 4, 10)
    np.testing.assert_array_equal(loaded, knn_ivf)


def test_cache_miss_returns_none(tmp_path):
    assert load_knn_cache(str(tmp_path), "nope", 4, 10) is None


def test_knn_cache_tag_isolates_subsets(tmp_path):
    """Subset caches with different membership tags must not collide, and a
    tagged lookup must never fall back to an untagged (full-set) cache."""
    knn_a = np.zeros((10, 4), dtype=np.int32)
    knn_b = np.ones((10, 4), dtype=np.int32)
    save_knn_cache(str(tmp_path), "toy", knn_a, dim=8, method="exact", tag="seed1")
    save_knn_cache(str(tmp_path), "toy", knn_b, dim=8, method="exact", tag="seed2")
    np.testing.assert_array_equal(load_knn_cache(str(tmp_path), "toy", 4, 10, tag="seed1"), knn_a)
    np.testing.assert_array_equal(load_knn_cache(str(tmp_path), "toy", 4, 10, tag="seed2"), knn_b)
    assert load_knn_cache(str(tmp_path), "toy", 4, 10) is None  # untagged: miss
    assert load_knn_cache(str(tmp_path), "toy", 4, 10, tag="seed3") is None


def test_knn_cache_metric_separation(tmp_path):
    """L2 and inner_product self-kNN caches must not collide: an IP pipeline
    silently training on L2 neighbors was the round-3 review's top finding."""
    from lira_tpu.io.cache import load_knn_cache, save_knn_cache

    knn_l2 = np.arange(12, dtype=np.int32).reshape(4, 3)
    knn_ip = knn_l2[::-1].copy()
    save_knn_cache(str(tmp_path), "ds", knn_l2, dim=8, method="x")
    save_knn_cache(str(tmp_path), "ds", knn_ip, dim=8, method="x", metric="inner_product")
    got_l2 = load_knn_cache(str(tmp_path), "ds", 3, 4)
    got_ip = load_knn_cache(str(tmp_path), "ds", 3, 4, metric="inner_product")
    np.testing.assert_array_equal(got_l2, knn_l2)
    np.testing.assert_array_equal(got_ip, knn_ip)
    # missing metric variant -> miss, not a silent L2 fallback
    assert load_knn_cache(str(tmp_path), "other", 3, 4, metric="inner_product") is None
