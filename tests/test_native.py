import numpy as np
import pytest

from lira_tpu import native

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


def test_native_version():
    assert native._load().lira_native_version() == 1


def test_csr_matches_numpy(rng):
    from lira_tpu.partition.assign import build_bucket_layout

    n, n_bkt, n_mul = 5000, 32, 3
    d2b = np.full((n, n_mul), -1, dtype=np.int32)
    d2b[:, 0] = rng.integers(0, n_bkt, size=n)
    m = rng.random(n) < 0.4
    d2b[m, 1] = rng.integers(0, n_bkt, size=m.sum())
    m2 = rng.random(n) < 0.1
    d2b[m2, 2] = d2b[m2, 0]  # duplicate (id, bucket) pairs to exercise dedup

    lay_native = build_bucket_layout(d2b, n_bkt, use_native=True)
    lay_numpy = build_bucket_layout(d2b, n_bkt, use_native=False)
    np.testing.assert_array_equal(lay_native.offsets, lay_numpy.offsets)
    np.testing.assert_array_equal(lay_native.ids, lay_numpy.ids)
    np.testing.assert_array_equal(lay_native.padded_ids, lay_numpy.padded_ids)


def test_probe_tiles_matches_numpy(rng):
    B, n_bkt = 33, 16
    probed = rng.random((B, n_bkt)) < 0.3
    tiles_per_bucket = rng.integers(0, 5, size=n_bkt).astype(np.int64)
    tile_start = np.concatenate([[0], np.cumsum(tiles_per_bucket)[:-1]]).astype(np.int64)

    got = native.probe_tiles(probed, tile_start, tiles_per_bucket)
    # numpy oracle
    for q in range(B):
        expected = []
        for b in range(n_bkt):
            if probed[q, b]:
                expected.extend(range(tile_start[b], tile_start[b] + tiles_per_bucket[b]))
        row = [t for t in got[q] if t >= 0]
        assert row == expected, f"query {q}"


def test_xvecs_native_parse(rng, tmp_path):
    from lira_tpu.io.xvecs import write_xvecs

    x = rng.normal(size=(50, 12)).astype(np.float32)
    path = str(tmp_path / "t.fvecs")
    write_xvecs(path, x)
    raw = np.fromfile(path, dtype=np.float32)
    out = native.fvecs_rows(raw, 50, 12)
    np.testing.assert_array_equal(out, x)


def test_bvecs_native_parse(rng, tmp_path):
    from lira_tpu.io.xvecs import write_xvecs

    x = rng.integers(0, 256, size=(20, 9)).astype(np.uint8)
    path = str(tmp_path / "t.bvecs")
    write_xvecs(path, x)
    raw = np.fromfile(path, dtype=np.uint8)
    out = native.bvecs_rows(raw, 20, 9)
    np.testing.assert_array_equal(out, x.astype(np.float32))
