import numpy as np
import pytest

from lira_tpu.config import Config
from lira_tpu.io.datasets import synthetic_dataset, write_dataset


@pytest.fixture(scope="module")
def ls_result(tmp_path_factory):
    from lira_tpu.pipelines.largescale import run_largescale

    bundle = synthetic_dataset(n_base=4000, n_query=30, dim=12, n_clusters=10, k_gt=20, seed=43)
    logdir = str(tmp_path_factory.mktemp("ls_logs"))
    cfg = Config(
        dataset="synthetic", k=5, n_bkt=10, n_epoch=3, batch_size=64,
        subset_fraction=0.25, redundancy_batch=1500, data_path=logdir,
    ).update()
    cfg.pth_log = logdir + "/"
    res = run_largescale(cfg, bundle=bundle, use_cache=False)
    return cfg, res, bundle


def test_largescale_runs(ls_result):
    cfg, res, bundle = ls_result
    assert len(res["sweep_parts"]) == 2
    assert len(res["sub_idx"]) == 1000
    # full redundancy: every point was scored; most rows keep their native bucket in slot 0
    d2b = res["data_2_bkt"]
    assert d2b.shape == (4000, cfg.n_mul)
    assert (d2b[:, 0] >= 0).all()


def test_largescale_sweep_sane(ls_result):
    cfg, res, bundle = ls_result
    rows = res["sweep_parts"][1]
    assert rows[0].recall >= rows[-1].recall - 1e-9
    assert rows[0].computations >= rows[-1].computations


def test_build_index_and_search_cli(tmp_path):
    from lira_tpu.pipelines.build_index import build_index
    from lira_tpu.pipelines.search_cli import run_search

    bundle = synthetic_dataset(n_base=2000, n_query=25, dim=12, n_clusters=8, k_gt=10, seed=1)
    write_dataset(bundle, str(tmp_path))
    cfg = Config(
        dataset="synthetic", k=5, n_bkt=8, n_epoch=2, batch_size=64,
        data_path=str(tmp_path),
    ).update()
    out_dir = str(tmp_path / "artifacts")
    build_index(cfg, bundle=bundle, out_dir=out_dir, use_cache=False)
    rows = run_search(
        out_dir, cfg.file_name, "synthetic", data_path=str(tmp_path),
        k=5, t_min=0.1, t_max=0.5, t_step=0.2, bundle=bundle,
    )
    assert len(rows) == 3
    assert rows[0]["avg_recall"] >= rows[-1]["avg_recall"] - 1e-9
    assert all(r["qps"] > 0 for r in rows)

    # int8 screen through the CLI surface: the flag must pin the blocked
    # impl off-TPU and the sweep must match f32 exactly (default margin is
    # exhaustive at this scale; round 2 is f32-exact)
    rows8 = run_search(
        out_dir, cfg.file_name, "synthetic", data_path=str(tmp_path),
        k=5, t_min=0.1, t_max=0.5, t_step=0.2, bundle=bundle, scan_dtype="int8",
    )
    for a, b in zip(rows, rows8):
        assert a["avg_cmp"] == b["avg_cmp"]
        assert abs(a["avg_recall"] - b["avg_recall"]) < 1e-9

    # --block_q: 'auto' runs the measured in-run pick on the blocked
    # engine (int8 pins blocked off-TPU) and a fixed int is honored; both
    # must leave the sweep numbers identical (block_q is speed-only)
    for bq in ("auto", 16):
        rows_q = run_search(
            out_dir, cfg.file_name, "synthetic", data_path=str(tmp_path),
            k=5, t_min=0.1, t_max=0.5, t_step=0.2, bundle=bundle,
            scan_dtype="int8", block_q=bq,
        )
        for a, b in zip(rows, rows_q):
            assert a["avg_cmp"] == b["avg_cmp"]
            assert abs(a["avg_recall"] - b["avg_recall"]) < 1e-9

    # capacity mode through the CLI surface (one-table + host re-rank):
    # bf16 (0.5x corpus HBM) and int8 (0.25x)
    for cap_dtype in ("bfloat16", "int8"):
        rows_cap = run_search(
            out_dir, cfg.file_name, "synthetic", data_path=str(tmp_path),
            k=5, t_min=0.1, t_max=0.5, t_step=0.2, bundle=bundle,
            scan_dtype=cap_dtype, capacity=True,
        )
        for a, b in zip(rows, rows_cap):
            assert a["avg_cmp"] == b["avg_cmp"]
            assert abs(a["avg_recall"] - b["avg_recall"]) < 1e-9


def test_build_index_calibrated_margin(tmp_path):
    """--calibrate_margin persists measured screen margins in the manifest
    and search_cli serves at them (VERDICT r3 item 2 / ADVICE r3 item 2)."""
    import json

    from lira_tpu.pipelines.build_index import build_index
    from lira_tpu.pipelines.search_cli import manifest_margin, run_search

    bundle = synthetic_dataset(n_base=2000, n_query=25, dim=12, n_clusters=8, k_gt=10, seed=1)
    write_dataset(bundle, str(tmp_path))
    cfg = Config(
        dataset="synthetic", k=5, n_bkt=8, n_epoch=2, batch_size=64,
        data_path=str(tmp_path), calibrate_margin=True,
    ).update()
    out_dir = str(tmp_path / "artifacts")
    build_index(cfg, bundle=bundle, out_dir=out_dir, use_cache=False)
    with open(f"{out_dir}/{cfg.file_name}_manifest.json") as f:
        manifest = json.load(f)
    cal = manifest["calibrated_margins"]
    assert "bfloat16" in cal and "int8" in cal
    for d in ("bfloat16", "int8"):
        assert cal[d]["margin"] >= 1
        assert cal[d]["sel_rows"] in (32, 64, 128)
        # at this tiny scale every ladder rung is measured or exhaustive
        assert isinstance(cal[d]["miss_rates"], dict)

    # manifest_margin: same granularity passes through; a different one
    # rescales to constant row coverage
    m32 = manifest_margin(manifest, "bfloat16", sel_rows=cal["bfloat16"]["sel_rows"])
    assert m32 == cal["bfloat16"]["margin"]
    rows_sel = cal["bfloat16"]["sel_rows"]
    if rows_sel < 128:
        m128 = manifest_margin(manifest, "bfloat16", sel_rows=128)
        assert m128 == int(np.ceil(cal["bfloat16"]["margin"] * rows_sel / 128))
    assert manifest_margin(manifest, "float32") is None  # not calibrated

    # serving picks the manifest margin up (int8 pins the blocked impl, the
    # only path that consumes block_margin) and stays exact vs the f32 sweep
    rows = run_search(
        out_dir, cfg.file_name, "synthetic", data_path=str(tmp_path),
        k=5, t_min=0.1, t_max=0.5, t_step=0.2, bundle=bundle,
    )
    rows8 = run_search(
        out_dir, cfg.file_name, "synthetic", data_path=str(tmp_path),
        k=5, t_min=0.1, t_max=0.5, t_step=0.2, bundle=bundle,
        scan_dtype="int8",
    )
    for a, b in zip(rows, rows8):
        assert a["avg_cmp"] == b["avg_cmp"]
        assert abs(a["avg_recall"] - b["avg_recall"]) < 1e-9


def test_compute_knn_cli(tmp_path):
    from lira_tpu.pipelines.compute_knn_cli import main as knn_main
    from lira_tpu.io.cache import load_knn_cache
    from lira_tpu.io.datasets import _exact_knn_numpy

    bundle = synthetic_dataset(n_base=600, n_query=5, dim=8, n_clusters=4, k_gt=5, seed=2)
    write_dataset(bundle, str(tmp_path))
    knn_main(["synthetic", str(tmp_path), "4", "0"])  # exact mode
    knn = load_knn_cache(str(tmp_path), "synthetic", 4, 600)
    assert knn is not None and knn.shape == (600, 4)
    # row 0 matches oracle (self removed)
    d = ((bundle.base - bundle.base[0]) ** 2).sum(1)
    d[0] = np.inf
    np.testing.assert_array_equal(knn[0], np.argsort(d, kind="stable")[:4])


def test_compute_knn_cli_ivf(tmp_path):
    from lira_tpu.pipelines.compute_knn_cli import main as knn_main
    from lira_tpu.io.cache import find_knn_cache

    bundle = synthetic_dataset(n_base=500, n_query=5, dim=8, n_clusters=4, k_gt=5, seed=3)
    write_dataset(bundle, str(tmp_path))
    knn_main(["synthetic", str(tmp_path), "3", "8"])  # ivf mode, nprobe=8
    path = find_knn_cache(str(tmp_path), "synthetic", 3, 500)
    assert path is not None and "_ivf_nprobe8" in path
    knn = np.fromfile(path, dtype=np.int32).reshape(500, 3)
    # high recall vs exact (nprobe=8 of <=22 clusters)
    d = ((bundle.base[:, None, :] - bundle.base[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    exact = np.argsort(d, axis=1, kind="stable")[:, :3]
    recall = (knn[:, :, None] == exact[:, None, :]).any(1).mean()
    assert recall > 0.9


def test_extract_k1(tmp_path):
    from lira_tpu.io.cache import save_knn_cache
    from lira_tpu.pipelines.extract_k1 import extract_k_subset, find_cache_file
    from lira_tpu.io.cache import read_knn_meta

    knn = np.arange(50, dtype=np.int32).reshape(5, 10)
    save_knn_cache(str(tmp_path), "toy", knn, dim=8, method="flat_exact")
    src = find_cache_file(str(tmp_path), "toy", 10)
    dst = extract_k_subset(src, 10, 1)
    out = np.fromfile(dst, dtype=np.int32).reshape(5, 1)
    np.testing.assert_array_equal(out[:, 0], knn[:, 0])
    meta = read_knn_meta(dst)
    assert meta["k"] == "1"
    assert "derived_from" in meta
