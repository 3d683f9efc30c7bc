import os

from lira_tpu.io.datasets import synthetic_dataset, write_dataset
from lira_tpu.pipelines.batch import run_grid


def test_run_grid_continues_past_failures(tmp_path, monkeypatch):
    # one real dataset + one missing: the grid must finish both entries
    bundle = synthetic_dataset(n_base=800, n_query=10, dim=8, n_clusters=4, k_gt=6, seed=5)
    write_dataset(bundle, str(tmp_path))
    monkeypatch.chdir(tmp_path)  # logs land under tmp
    results = run_grid(
        ["synthetic", "missing_ds"],
        data_path=str(tmp_path),
        k=3,
        n_epoch=1,
        grid={"synthetic": {"n_bkt": [4], "metric": "L2"},
              "missing_ds": {"n_bkt": [4], "metric": "L2"}},
    )
    assert len(results) == 2
    by_ds = {r["dataset"]: r for r in results}
    assert by_ds["synthetic"]["status"] == "ok"
    assert by_ds["missing_ds"]["status"].startswith("failed")
    # outputs written under the config's log dir
    assert os.path.exists("logs/synthetic/ML_kmeans_RE_FLAT")
