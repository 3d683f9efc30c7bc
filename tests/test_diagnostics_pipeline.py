import os

from lira_tpu.config import Config
from lira_tpu.io.datasets import synthetic_dataset
from lira_tpu.pipelines.smallscale import run_smallscale


def test_smallscale_with_diagnostics(tmp_path):
    bundle = synthetic_dataset(n_base=1200, n_query=20, dim=10, n_clusters=6, k_gt=8, seed=9)
    cfg = Config(
        dataset="synthetic", k=4, n_bkt=6, n_epoch=1, batch_size=64,
        data_path=str(tmp_path), run_diagnostics=True,
    ).update()
    cfg.pth_log = str(tmp_path) + "/"
    res = run_smallscale(cfg, bundle=bundle, use_cache=False)
    assert os.path.exists(os.path.join(cfg.pth_log, f"{cfg.file_name}_perquery.csv"))
    assert len(res["sweep_parts"]) == 2
