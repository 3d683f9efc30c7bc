"""Multi-chip end-to-end pipeline: every heavy stage runs on the mesh.

The single-chip pipelines (smallscale/largescale) bound memory by
subsampling and streaming; this pipeline is the pod-scale composition of
the parallel layer — the corpus never has to fit one chip's HBM:

  1. self-kNN labels      : `sharded_self_knn` (corpus row-sharded, per-shard
                            streamed scan, one ICI top-k merge per tile)
  2. K-Means partitioning : `sharded_kmeans_fit` / `sharded_kmeans_assign`
                            (psum'ed Lloyd — parallel/sharded_kmeans.py)
  3. label construction   : vectorized host ops (O(n·k) ints, not corpus-
                            sized; same code as smallscale)
  4. probing-MLP training : `dp_train_epoch` (batch data-parallel, gradient
                            psum over ICI)
  5. redundancy           : device-reduced predicted-nprobe counts + subset
                            re-score (smallscale's fused path — model state
                            is replicated, so this needs no mesh plumbing)
  6. serving              : `ShardedQueryEngine` threshold sweep (corpus
                            tile-sharded, Pallas screen per device, one ICI
                            merge per batch)

The reference has no distributed anything (SURVEY §2.4: OpenMP threads on
one node, one GPU); this module is the TPU-native scale-out story built on
`jax.sharding.Mesh` + shard_map collectives.  Testable end-to-end on the
virtual 8-device CPU mesh (tests/test_distributed_pipeline.py).
"""

from __future__ import annotations

import time

import numpy as np
from jax.sharding import Mesh

from ..config import Config
from ..io.datasets import DatasetBundle, load_data
from ..labels.distr import gt_bucket_map, knn_bucket_labels
from ..labels.scaler import scaled_centroid_distances
from ..logging_utils import ascii_table, fprint, stage_timer
from ..models.metrics import probing_metrics
from ..models.train import evaluate, infer, make_train_state, predict_counts
from ..parallel.sharded_engine import ShardedQueryEngine
from ..parallel.sharded_kmeans import sharded_kmeans_assign, sharded_kmeans_fit
from ..parallel.sharded_knn import sharded_self_knn
from ..parallel.train_dp import dp_train_epoch
from ..partition.assign import build_bucket_layout
from ..redundancy.assign import apply_redundancy_subset, select_top_ratio


def run_distributed(
    cfg: Config,
    mesh: Mesh,
    bundle: DatasetBundle | None = None,
    log_file=None,
    serve_sweep: bool = True,
    axis: str = "data",
) -> dict:
    """Full build → train → redundancy → sharded-serve pipeline on `mesh`.

    Returns the smallscale result dict plus 'serve_rows' (the measured
    sharded-engine sweep) and 'engine' (the live ShardedQueryEngine)."""
    fw = log_file
    if bundle is None:
        bundle = load_data(cfg.dataset, data_path=cfg.data_path)
    if bundle.groundtruth is None:
        raise ValueError(f"Ground truth missing for dataset {cfg.dataset}")
    x_d, x_q = bundle.base, bundle.query
    n_d, dim = x_d.shape
    n_bkt = cfg.n_bkt
    n_dev = mesh.devices.size
    fprint(
        f">> distributed pipeline: {n_dev} devices, data {x_d.shape}, "
        f"query {x_q.shape}, n_bkt {n_bkt}, k {cfg.k}, metric {cfg.dis_metric}",
        fw,
    )

    # (1) self-kNN labels on the mesh; query labels from ground truth
    with stage_timer("sharded self-kNN", fw):
        knn_data = sharded_self_knn(x_d, cfg.k, mesh, metric=cfg.dis_metric, axis=axis)
    knn_query = bundle.groundtruth[:, : cfg.k]

    # (2) partitioning: psum'ed Lloyd + sharded assignment
    with stage_timer("sharded kmeans", fw):
        km = sharded_kmeans_fit(
            x_d, n_bkt, mesh, niter=cfg.kmeans_niter, seed=cfg.seed, axis=axis
        )
        assign = sharded_kmeans_assign(x_d, km.centroids, mesh, axis=axis)
    data_2_bkt = np.full((n_d, cfg.n_mul), -1, dtype=np.int32)
    data_2_bkt[:, 0] = assign
    layout = build_bucket_layout(data_2_bkt, n_bkt)

    # (3) targets + standardized centroid-distance features
    with stage_timer("label construction", fw):
        labels_data = knn_bucket_labels(knn_data, data_2_bkt, n_bkt)
        labels_query = knn_bucket_labels(knn_query, data_2_bkt, n_bkt)
        gt_buckets = gt_bucket_map(knn_query, data_2_bkt)
    with stage_timer("scaled distances", fw):
        dist_d, dist_q, scaler = scaled_centroid_distances(x_d, x_q, km.centroids)
        if cfg.pth_log and cfg.file_name:
            scaler.save(cfg.pth_log, cfg.file_name)

    # (4) data-parallel training: batches sharded over the mesh, grads psum'ed
    state = make_train_state(cfg.seed, n_bkt, dim, lr=cfg.lr)
    epoch_rows = []
    headers = ["Epoch", "Loss", "Accuracy", "Hit Rate", "nprobe predict",
               "nprobe target", "KNN Recall", "KNN Computations"]

    def eval_epoch(epoch):
        _, predicts, loss_test, outputs = evaluate(
            state, dist_q, x_q, labels_query, sigma=cfg.sigma,
            batch_size=cfg.batch_size,
        )
        m = probing_metrics(
            predicts, labels_query, gt_buckets, layout.sizes, cfg.k,
            epoch=epoch, loss=round(loss_test, 4),
        )
        epoch_rows.append(m)
        fprint(ascii_table(headers, [[m[h] for h in headers]]), fw)
        return outputs

    outputs = eval_epoch(-1)
    for epoch in range(cfg.n_epoch):
        t0 = time.perf_counter()
        state, loss_train = dp_train_epoch(
            state, mesh, dist_d, x_d, labels_data,
            global_batch=cfg.batch_size, axis=axis,
        )
        fprint(
            f"Epoch {epoch}, DP Train Loss: {loss_train:.5f}, "
            f"time_train: {time.perf_counter() - t0:.2f}s",
            fw,
        )
        outputs = eval_epoch(epoch)

    results: dict = {"epoch_rows": epoch_rows, "state": state, "kmeans": km,
                     "scaler": scaler}

    # (5) learning-based redundancy (device-reduced counts + subset re-score;
    # model state is replicated, so the single-device fused path applies)
    thresholds = np.arange(cfg.t_min, cfg.t_max + cfg.t_step / 2, cfg.t_step)
    if cfg.duplicate_type == "model":
        counts = predict_counts(state, dist_d, x_d, sigma=cfg.sigma)
        selected = select_top_ratio(counts, cfg.redundancy_ratio)
        fprint(f">> redundancy: duplicating top {len(selected)}/{n_d} boundary vectors", fw)
        with stage_timer("redundancy assignment", fw):
            sel_idx = np.sort(selected)
            sel_predicts, sel_scores = infer(
                state, dist_d[sel_idx], x_d[sel_idx], sigma=cfg.sigma
            )
            data_2_bkt = apply_redundancy_subset(
                data_2_bkt, sel_scores, sel_predicts, sel_idx
            )
            layout = build_bucket_layout(data_2_bkt, n_bkt)
            gt_buckets = gt_bucket_map(knn_query, data_2_bkt)

    # (6) measured serving sweep on the sharded engine — the pipeline's
    # sweep IS the measured one: the analytic sweep (engine/sweep.py) needs
    # a per-(query, bucket) single-chip scan tensor, which is exactly the
    # corpus-sized materialization this pipeline exists to avoid
    if serve_sweep:
        with stage_timer("sharded engine build + measured sweep", fw):
            engine = ShardedQueryEngine(
                x_d, layout, km.centroids, scaler, state.params, mesh,
                metric=cfg.dis_metric, n_mul=cfg.n_mul, axis=axis,
            )
            serve_rows = engine.sweep(x_q, knn_query, cfg.k, thresholds)
        for r in serve_rows:
            fprint(
                f"threshold {r['threshold']:.3f}  recall {r['avg_recall']:.4f}  "
                f"nprobe {r['avg_nprobe']:.2f}  cmp {r['avg_cmp']:.0f}  "
                f"QPS {r['qps']:.0f}",
                fw,
            )
        results["serve_rows"] = serve_rows
        results["engine"] = engine

    results.update(
        {
            "data_2_bkt": data_2_bkt,
            "layout": layout,
            "outputs": outputs,
        }
    )
    return results


def main(argv=None):
    """CLI: `python -m lira_tpu.pipelines.distributed --n_shards 8 ...`
    (same Config flags as the smallscale pipeline + the mesh size)."""
    import os
    import sys

    from ..config import parse_config
    from ..parallel.mesh import make_mesh

    argv = list(sys.argv[1:] if argv is None else argv)
    n_shards = 8
    if "--n_shards" in argv:
        i = argv.index("--n_shards")
        n_shards = int(argv[i + 1])
        del argv[i : i + 2]
    cfg = parse_config(argv)
    os.makedirs(cfg.pth_log, exist_ok=True)
    with open(os.path.join(cfg.pth_log, cfg.log_name), "a", encoding="utf-8") as fw:
        run_distributed(cfg, make_mesh(n_shards), log_file=fw)


if __name__ == "__main__":
    main()
