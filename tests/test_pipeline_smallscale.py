import numpy as np
import pytest

from lira_tpu.config import Config
from lira_tpu.io.datasets import synthetic_dataset
from lira_tpu.pipelines.smallscale import run_smallscale


@pytest.fixture(scope="module")
def e2e_result(tmp_path_factory):
    bundle = synthetic_dataset(
        n_base=3000, n_query=40, dim=16, n_clusters=12, k_gt=20, seed=43
    )
    logdir = str(tmp_path_factory.mktemp("logs"))
    cfg = Config(
        dataset="synthetic", k=5, n_bkt=12, n_epoch=3, batch_size=64,
        redundancy_ratio=0.05, data_path=logdir,
    ).update()
    cfg.pth_log = logdir + "/"
    res = run_smallscale(cfg, bundle=bundle, serve_sweep=True, use_cache=False)
    return cfg, res, bundle


def test_e2e_runs_and_improves(e2e_result):
    cfg, res, bundle = e2e_result
    assert len(res["epoch_rows"]) == cfg.n_epoch + 1
    # training reduced loss
    losses = [r["Loss"] for r in res["epoch_rows"]]
    assert losses[-1] < losses[0]
    # two sweep parts (baseline + redundancy)
    assert len(res["sweep_parts"]) == 2


def test_e2e_sweep_monotonicity(e2e_result):
    cfg, res, bundle = e2e_result
    rows = res["sweep_parts"][0]
    nprobes = [r.nprobe for r in rows]
    recalls = [r.recall for r in rows]
    # higher threshold -> fewer probes, recall non-increasing
    assert all(a >= b for a, b in zip(nprobes, nprobes[1:]))
    assert all(a >= b - 1e-9 for a, b in zip(recalls, recalls[1:]))
    # at the lowest threshold, trained model should reach decent recall
    assert rows[0].recall > 0.5


def test_e2e_redundancy_helps_at_equal_probe(e2e_result):
    # at matched nprobe, part-1 (redundant) recall should be >= part-0 recall
    # (the core LIRA claim); compare the area under recall-vs-nprobe loosely
    cfg, res, bundle = e2e_result
    r0 = {round(r.nprobe): r.recall for r in res["sweep_parts"][0]}
    r1 = {round(r.nprobe): r.recall for r in res["sweep_parts"][1]}
    common = set(r0) & set(r1)
    if common:
        gains = [r1[c] - r0[c] for c in common]
        assert np.mean(gains) > -0.05


def test_e2e_serving_engine(e2e_result):
    cfg, res, bundle = e2e_result
    rows = res["serve_rows"]
    assert all(r["qps"] > 0 for r in rows)
    # low threshold probes much -> high recall
    assert rows[0]["avg_recall"] > 0.6
    # ndis decreases as threshold grows
    assert rows[0]["avg_cmp"] >= rows[-1]["avg_cmp"]


def test_e2e_csv_outputs(e2e_result):
    import os

    cfg, res, bundle = e2e_result
    assert os.path.exists(os.path.join(cfg.pth_log, cfg.df_name))
    assert os.path.exists(
        os.path.join(cfg.pth_log, cfg.file_name + "_tuning_threshold", "model_0.csv")
    )
    assert os.path.exists(
        os.path.join(cfg.pth_log, cfg.file_name + "_tuning_threshold", "model_1.csv")
    )


def test_artifact_roundtrip(e2e_result, tmp_path):
    from lira_tpu.io.artifacts import save_index_artifacts, load_index_artifacts
    from lira_tpu.engine.serve import QueryEngine
    from lira_tpu.partition.assign import build_bucket_layout

    cfg, res, bundle = e2e_result
    prefix = save_index_artifacts(
        str(tmp_path), "idx",
        centroids=res["kmeans"].centroids,
        data_2_bkt=res["data_2_bkt"],
        x_d=bundle.base,
        scaler=res["scaler"],
        params=res["state"].params,
        metric=cfg.dis_metric,
    )
    art = load_index_artifacts(str(tmp_path), "idx")
    assert art["manifest"]["n_bkt"] == cfg.n_bkt
    np.testing.assert_array_equal(art["data_2_bkt"], res["data_2_bkt"])
    # engine rebuilt from artifacts produces identical probing scores
    layout = build_bucket_layout(art["data_2_bkt"], cfg.n_bkt)
    eng = QueryEngine(
        art["x_d"], layout, art["centroids"], art["scaler"], art["params"],
        metric=art["manifest"]["metric"], n_mul=art["manifest"]["n_mul"],
    )
    out1 = eng.probe(bundle.query[:8])
    np.testing.assert_allclose(out1, res["engine"].probe(bundle.query[:8]), rtol=1e-5, atol=1e-6)
    # redundant flags match
    expected_flags = (res["data_2_bkt"][:, 1:] != -1).any(axis=1).astype(np.uint8)
    np.testing.assert_array_equal(art["redundant_flags"], expected_flags)
