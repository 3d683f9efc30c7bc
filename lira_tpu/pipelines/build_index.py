"""Index builder: build + train + redundancy, then export serving artifacts.

The TPU re-design of the reference's index.py (build pipeline minus the
Python search, plus artifact export — reference: index.py:197-320 and
save_index_artifacts at :144-192).  The exported contract is consumed by
pipelines/search_cli.py (the serving engine), mirroring how index.py feeds
the C++ `search` binary.
"""

from __future__ import annotations

import os

import numpy as np

from ..config import Config, parse_config
from ..io.artifacts import save_index_artifacts
from ..io.datasets import DatasetBundle, load_data
from ..labels.distr import knn_bucket_labels
from ..labels.scaler import scaled_centroid_distances
from ..logging_utils import fprint, stage_timer
from ..models.train import infer, make_train_state, predict_counts, train_epoch
from ..partition.assign import build_bucket_layout
from ..partition.kmeans import kmeans_assign, kmeans_fit
from ..redundancy.assign import apply_redundancy_subset, select_top_ratio
from .smallscale import get_self_knn


def build_index(
    cfg: Config,
    bundle: DatasetBundle | None = None,
    out_dir: str | None = None,
    log_file=None,
    use_cache: bool = True,
) -> str:
    """Run the build pipeline and export artifacts; returns the prefix path."""
    fw = log_file
    if bundle is None:
        bundle = load_data(cfg.dataset, data_path=cfg.data_path)
    x_d, x_q = bundle.base, bundle.query
    n_d, dim = x_d.shape
    n_bkt = cfg.n_bkt

    knn_data = get_self_knn(x_d, cfg, use_cache=use_cache)

    with stage_timer("build kmeans index", fw):
        km = kmeans_fit(x_d, n_bkt, niter=cfg.kmeans_niter, seed=cfg.seed,
                        init=cfg.kmeans_init)
        assign = kmeans_assign(x_d, km.centroids)
    data_2_bkt = np.full((n_d, cfg.n_mul), -1, dtype=np.int32)
    data_2_bkt[:, 0] = assign

    labels_data = knn_bucket_labels(knn_data, data_2_bkt, n_bkt)
    with stage_timer("scaled distances", fw):
        dist_d, _, scaler = scaled_centroid_distances(x_d, None, km.centroids)

    state = make_train_state(cfg.seed, n_bkt, dim, lr=cfg.lr)
    for epoch in range(cfg.n_epoch):
        state, loss = train_epoch(state, dist_d, x_d, labels_data, batch_size=cfg.batch_size)
        fprint(f"Epoch {epoch}, Train Loss: {loss:.5f}", fw)

    if cfg.duplicate_type == "model":
        # device-reduced counts select the boundary minority; only its rows
        # are re-scored (see pipelines/smallscale.py — saves ~12 GB of D2H
        # traffic at 1M×1024 on a tunneled rig)
        counts = predict_counts(state, dist_d, x_d, sigma=cfg.sigma)
        selected = np.sort(select_top_ratio(counts, cfg.redundancy_ratio))
        fprint(f">> redundancy: duplicating {len(selected)}/{n_d} boundary vectors", fw)
        sel_predicts, sel_scores = infer(state, dist_d[selected], x_d[selected], sigma=cfg.sigma)
        data_2_bkt = apply_redundancy_subset(data_2_bkt, sel_scores, sel_predicts, selected)

    out_dir = out_dir or cfg.pth_log
    prefix = save_index_artifacts(
        out_dir,
        cfg.file_name,
        centroids=km.centroids,
        data_2_bkt=data_2_bkt,
        x_d=x_d,
        scaler=scaler,
        params=state.params,
        metric=cfg.dis_metric,
        extra_meta={"k": cfg.k, "redundancy_ratio": cfg.redundancy_ratio},
    )
    fprint(f">> artifacts saved under prefix {prefix}", fw)
    return prefix


def main(argv=None):
    cfg = parse_config(argv)
    os.makedirs(cfg.pth_log, exist_ok=True)
    with open(os.path.join(cfg.pth_log, cfg.log_name), "a", encoding="utf-8") as fw:
        build_index(cfg, log_file=fw)


if __name__ == "__main__":
    main()
