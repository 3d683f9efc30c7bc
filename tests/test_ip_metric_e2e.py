import numpy as np

from lira_tpu.config import Config
from lira_tpu.io.datasets import synthetic_dataset
from lira_tpu.pipelines.smallscale import run_smallscale


def test_smallscale_inner_product(tmp_path):
    bundle = synthetic_dataset(
        n_base=1500, n_query=25, dim=12, n_clusters=8, k_gt=10, seed=7,
        metric="inner_product",
    )
    cfg = Config(
        dataset="synthetic", k=4, n_bkt=8, n_epoch=2, batch_size=64,
        dis_metric="inner_product", redundancy_ratio=0.05, data_path=str(tmp_path),
    ).update()
    cfg.pth_log = str(tmp_path) + "/"
    res = run_smallscale(cfg, bundle=bundle, serve_sweep=True, use_cache=False)
    rows = res["sweep_parts"][0]
    # at the lowest threshold the model probes most buckets -> decent recall
    assert rows[0].recall > 0.4
    # serving engine also runs under IP
    assert res["serve_rows"][0]["avg_recall"] > 0.4
    # gt for IP metric: engine full-probe matches exact IP search
    eng = res["engine"]
    r = eng.search(bundle.query, 0.0, k=4)
    exact = np.argsort(-(bundle.query @ bundle.base.T), axis=1, kind="stable")[:, :4]
    setmatch = np.mean(
        [len(set(r.ids[i]) & set(exact[i])) / 4 for i in range(len(bundle.query))]
    )
    assert setmatch > 0.95
