"""Parity harness: CLI runs on an on-disk dataset and diffs sweep curves."""

import csv

import numpy as np
import pytest

from lira_tpu.config import Config
from lira_tpu.io.datasets import synthetic_dataset, write_dataset
from lira_tpu.pipelines.parity import diff_curves, load_reference_csv, run_parity


@pytest.fixture(scope="module")
def parity_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("parity")
    bundle = synthetic_dataset(n_base=2500, n_query=30, dim=12, n_clusters=8, k_gt=10, seed=7)
    bundle.name = "ptoy"
    write_dataset(bundle, str(tmp))
    cfg = Config(dataset="ptoy", data_path=str(tmp), k=5, n_bkt=8, n_epoch=1,
                 t_min=0.2, t_max=0.6, t_step=0.2).update()
    cfg.pth_log = str(tmp / "logs") + "/"
    out = run_parity(cfg, reference_csv=None, recall_tol=0.02, ndis_rtol=0.05)
    return tmp, cfg, out


def _write_csv(path, rows):
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["threshold", "nprobe", "Recall", "Computations", "QPS"])
        for r in rows:
            w.writerow(r)


def test_parity_self_match(parity_setup, tmp_path):
    """Diffing our sweep against itself (as a reference CSV) passes."""
    tmp, cfg, out = parity_setup
    sweep = out["sweep"]
    ref = str(tmp_path / "ref.csv")
    _write_csv(ref, [[r.threshold, r.nprobe, r.recall, r.computations, r.qps] for r in sweep])
    joined, ok = diff_curves(sweep, load_reference_csv(ref), 0.02, 0.05)
    assert ok and len(joined) == len(sweep)
    assert all(j["d_recall"] == 0 and j["ndis_rel"] == 0 for j in joined)


def test_parity_detects_divergence(parity_setup, tmp_path):
    """A reference curve with shifted recall/ndis fails the tolerance check."""
    tmp, cfg, out = parity_setup
    sweep = out["sweep"]
    ref = str(tmp_path / "ref_bad.csv")
    _write_csv(
        ref,
        [[r.threshold, r.nprobe, max(0.0, r.recall - 0.10), r.computations * 1.2, 0.0]
         for r in sweep],
    )
    joined, ok = diff_curves(sweep, load_reference_csv(ref), 0.02, 0.05)
    assert joined and not ok


def test_parity_no_reference_prints_recipe(parity_setup):
    """Without a reference CSV the harness still runs and returns the sweep."""
    _, _, out = parity_setup
    assert out["parity_ok"] is None
    assert len(out["sweep"]) >= 2
    assert any(r["qps"] > 0 for r in out["serve_rows"])
