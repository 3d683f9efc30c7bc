"""Large-scale pipeline: train on a sampled subset, redundancy over the full corpus.

The TPU re-design of the reference's large-scale path
(reference: LIRA_largescale.py:184-354):

  1. uniform subset (default 1%) of the corpus
  2. subset self-kNN + query-kNN-on-subset (both cached)
  3. K-Means trained on the subset; probing MLP trained on subset labels
  4. full corpus assigned to the trained centroids in streaming chunks
  5. learning-based redundancy applied to *every* point, scored in
     `redundancy_batch`-row batches on device
  6. threshold sweeps before/after redundancy (default range 0.1–1.0)

Deviation from the reference, by design: batch features reuse the
subset-fitted scaler (the reference re-fits a fresh scaler on every 1M-row
batch — get_scaled_dist_data — which silently changes the feature
distribution between training and redundancy scoring).
"""

from __future__ import annotations

import os
import time

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from ..config import Config
from ..engine.scan import BucketCorpus, bucket_topk
from ..engine.sweep import gt_hit_tensor, sweep_to_csv, threshold_sweep
from ..io.datasets import DatasetBundle, load_data
from ..labels.distr import gt_bucket_map, knn_bucket_labels
from ..labels.scaler import scaled_centroid_distances
from ..logging_utils import ascii_table, fprint, stage_timer
from ..models.metrics import probing_metrics
from ..models.train import evaluate, make_train_state, train_epoch
from ..ops.knn import exact_knn
from ..models.probing_mlp import forward as _mlp_forward
from ..ops.distance import l2_to_centroids as _l2c
from ..partition.assign import build_bucket_layout
from ..partition.kmeans import kmeans_assign, kmeans_fit
from ..redundancy.assign import _redundancy_rows_jit
from .smallscale import _epochs_to_csv, get_self_knn


class PipelineCheckpoint:
    """Stage/array checkpoint store for restartable pipelines.

    The reference restarts its long-running large-scale path from zero on
    any failure (SURVEY.md §5: resilience = caches only).  This store makes
    `run_largescale` restartable at stage granularity (kmeans, assignment,
    part-0/1 scans) and batch granularity (redundancy cursor), plus epoch
    granularity for training via models/checkpoint.py.  All writes are
    atomic (tmp + rename)."""

    def __init__(self, root: str, fresh: bool = False):
        self.root = root
        if fresh and os.path.isdir(root):
            import shutil

            shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root, exist_ok=True)

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def has(self, name: str) -> bool:
        return os.path.exists(self.path(name))

    def save(self, name: str, **arrays) -> None:
        tmp = self.path(name + ".tmp.npz")
        np.savez(tmp, **arrays)
        os.replace(tmp, self.path(name))

    def load(self, name: str):
        return np.load(self.path(name))


def query_knn_on_subset(
    x_sub: np.ndarray, x_q: np.ndarray, cfg: Config, use_cache: bool = True,
    cache_tag: str = "",
) -> np.ndarray:
    """Query ground truth restricted to the training subset, cached
    (reference: LIRA_largescale.py:217-234).  `cache_tag` identifies the
    subset membership — (k, nsub) alone would collide across seeds."""
    cache_file = None
    if use_cache and cfg.dataset:
        cache_dir = os.path.join(cfg.data_path, cfg.dataset, "knn_cache")
        tag = f"-{cache_tag}" if cache_tag else ""
        cache_file = os.path.join(
            cache_dir, f"{cfg.dataset}-query_on_subset_knn{cfg.k}-nsub{len(x_sub)}{tag}.npy"
        )
        if os.path.exists(cache_file):
            return np.load(cache_file).astype(np.int32)
    _, knn = exact_knn(x_sub, x_q, cfg.k, metric=cfg.dis_metric)
    if cache_file:
        try:
            os.makedirs(os.path.dirname(cache_file), exist_ok=True)
            np.save(cache_file, knn)
        except OSError:
            pass
    return knn


@partial(jax.jit, static_argnames=("n_mul",))
def _fused_redundancy_batch(params, centroids, mean, scale, batch, cur, sigma, n_mul):
    """probe → σ-threshold → redundancy rule, one device program.

    Only the (rows, n_mul) int32 assignment leaves the device — the old
    per-batch flow pulled the full (rows, n_bkt) score matrix to the host
    (8 GB per 1M-row batch at n_bkt=2048)."""
    d = _l2c(batch, centroids)
    outputs = _mlp_forward(params, (d - mean) / scale, batch)
    predicts = outputs > sigma
    return _redundancy_rows_jit(outputs, predicts, cur, n_mul)


def full_corpus_redundancy(
    x_d: np.ndarray,
    data_2_bkt: np.ndarray,
    centroids: np.ndarray,
    scaler,
    state,
    cfg: Config,
    ckpt: PipelineCheckpoint | None = None,
) -> np.ndarray:
    """Score and re-assign every corpus point in device-sized batches
    (reference: LIRA_largescale.py:320-329 + the offset-aware
    mul_partition_by_model at :51-72).

    With `ckpt`, the batch cursor + completed rows are checkpointed after
    every batch, so a killed run resumes at the first unfinished batch."""
    n_d = len(x_d)
    out = np.array(data_2_bkt, copy=True)
    cj = jnp.asarray(centroids, jnp.float32)
    mean = jnp.asarray(scaler.mean_)
    scale = jnp.asarray(scaler.scale_)
    params = getattr(state, "params", state)
    n_bkt = centroids.shape[0]
    # keep the (rows, n_bkt) f32 score + s32 rank tensors within a fixed HBM
    # budget: 1M rows x 2048 buckets is 16 GB and OOMs a 16 GB chip
    budget_rows = max(1 << 14, (1 << 32) // (max(n_bkt, 1) * 8))
    batch_rows = min(cfg.redundancy_batch, budget_rows)
    cursor = 0
    if ckpt is not None and ckpt.has("redundancy_cursor.npz"):
        f = ckpt.load("redundancy_cursor.npz")
        # the saved cursor is only valid at this run's batch boundaries:
        # a completed batch overwrites slot 0, so re-running a *partially*
        # restored batch would feed modified native buckets back into the rule
        if int(f["batch_rows"]) == batch_rows:
            cursor = int(f["cursor"])
            # completed batches live in per-batch slice files: checkpoint
            # write volume is O(n) total, not O(n_batches * n) — at the
            # 100M+ scales this pipeline targets, rewriting the full rows
            # array every batch would dominate the stage it protects
            for s in range(0, cursor, batch_rows):
                out[s : min(s + batch_rows, n_d)] = ckpt.load(
                    f"redundancy_rows_{s}.npz"
                )["rows"]
    for s in range(0, n_d, batch_rows):
        e = min(s + batch_rows, n_d)
        if e <= cursor:  # batch finished by the run we resumed from
            continue
        out[s:e] = np.asarray(
            _fused_redundancy_batch(
                params, cj, mean, scale,
                jnp.asarray(x_d[s:e], jnp.float32),
                jnp.asarray(out[s:e, 0], jnp.int32),
                jnp.float32(cfg.sigma), cfg.n_mul,
            )
        )
        if ckpt is not None:
            ckpt.save(f"redundancy_rows_{s}.npz", rows=out[s:e])
            ckpt.save(
                "redundancy_cursor.npz",
                cursor=np.int64(e), batch_rows=np.int64(batch_rows),
            )
    return out


def run_largescale(
    cfg: Config,
    bundle: DatasetBundle | None = None,
    log_file=None,
    use_cache: bool = True,
) -> dict:
    fw = log_file
    if bundle is None:
        bundle = load_data(cfg.dataset, data_path=cfg.data_path)
    if bundle.groundtruth is None:
        raise ValueError(f"Ground truth missing for dataset {cfg.dataset}")
    x_d, x_q = bundle.base, bundle.query
    n_d, dim = x_d.shape
    n_bkt = cfg.n_bkt

    # checkpoint store: fresh unless --resume (stale stages from a different
    # config would otherwise be silently reused)
    ckpt = None
    if cfg.checkpoint and cfg.pth_log and cfg.file_name:
        ckpt = PipelineCheckpoint(
            os.path.join(cfg.pth_log, cfg.file_name + "_ckpt"), fresh=not cfg.resume
        )
        if cfg.resume:
            fprint(f">> resume: checkpoint dir {ckpt.root}", fw)

    # (1) training subset
    nd_sub = max(1, int(n_d * cfg.subset_fraction))
    rng = np.random.default_rng(cfg.seed)
    sub_idx = rng.choice(n_d, size=nd_sub, replace=False)
    x_sub = np.ascontiguousarray(x_d[sub_idx])
    fprint(f">> subset: {nd_sub}/{n_d} rows for training", fw)

    # (2) labels on the subset — caches keyed by subset membership, not just
    # size: a different seed yields different rows at the same nd_sub
    sub_tag = f"seed{cfg.seed}"
    knn_sub = get_self_knn(x_sub, cfg, use_cache=use_cache, cache_tag=sub_tag)
    knn_query_sub = query_knn_on_subset(x_sub, x_q, cfg, use_cache=use_cache, cache_tag=sub_tag)

    # (3) subset partitioning + model training
    with stage_timer("build kmeans (subset)", fw):
        if ckpt is not None and cfg.resume and ckpt.has("kmeans.npz"):
            f = ckpt.load("kmeans.npz")
            from ..partition.kmeans import KMeans

            km = KMeans(centroids=f["centroids"], objective=f["objective"])
            assign_sub = f["assign_sub"]
        else:
            km = kmeans_fit(x_sub, n_bkt, niter=cfg.kmeans_niter, seed=cfg.seed,
                        init=cfg.kmeans_init)
            assign_sub = kmeans_assign(x_sub, km.centroids)
            if ckpt is not None:
                ckpt.save(
                    "kmeans.npz", centroids=km.centroids,
                    objective=km.objective, assign_sub=assign_sub,
                )
    d2b_sub = np.full((nd_sub, cfg.n_mul), -1, dtype=np.int32)
    d2b_sub[:, 0] = assign_sub
    layout_sub = build_bucket_layout(d2b_sub, n_bkt)

    labels_sub = knn_bucket_labels(knn_sub, d2b_sub, n_bkt)
    labels_query_sub = knn_bucket_labels(knn_query_sub, d2b_sub, n_bkt)
    gtb_sub = gt_bucket_map(knn_query_sub, d2b_sub)

    with stage_timer("scaled distances (subset)", fw):
        dist_sub, dist_q, scaler = scaled_centroid_distances(x_sub, x_q, km.centroids)
        if cfg.pth_log and cfg.file_name:
            scaler.save(cfg.pth_log, cfg.file_name)

    state = make_train_state(cfg.seed, n_bkt, dim, lr=cfg.lr)
    start_epoch = 0
    if ckpt is not None and cfg.resume and ckpt.has("train_state.npz"):
        from ..models.checkpoint import load_train_state

        state, start_epoch = load_train_state(ckpt.path("train_state.npz"), state)
        fprint(f">> resume: training restored at epoch {start_epoch}", fw)
    # stage the subset epoch inputs in HBM once — numpy inputs would be
    # re-uploaded every epoch (train_epoch promotes per call, not across)
    if isinstance(dist_sub, jax.Array):
        x_sub_dev = jnp.asarray(x_sub, jnp.float32)
        labels_sub_dev = jnp.asarray(labels_sub, jnp.float32)
    else:
        x_sub_dev, labels_sub_dev = x_sub, labels_sub
    headers = ["Epoch", "Loss", "Accuracy", "Hit Rate", "nprobe predict",
               "nprobe target", "KNN Recall", "KNN Computations"]
    epoch_rows = []

    def eval_epoch(epoch):
        _, predicts, loss_test, outputs = evaluate(
            state, dist_q, x_q, labels_query_sub, sigma=cfg.sigma, batch_size=cfg.batch_size
        )
        m = probing_metrics(
            predicts, labels_query_sub, gtb_sub, layout_sub.sizes, cfg.k,
            epoch=epoch, loss=round(loss_test, 4),
        )
        epoch_rows.append(m)
        fprint(ascii_table(headers, [[m[h] for h in headers]]), fw)
        return outputs

    outputs = eval_epoch(start_epoch - 1)
    for epoch in range(start_epoch, cfg.n_epoch):
        state, loss_train = train_epoch(
            state, dist_sub, x_sub_dev, labels_sub_dev, batch_size=cfg.batch_size
        )
        if ckpt is not None:
            from ..models.checkpoint import save_train_state

            save_train_state(state, ckpt.path("train_state.npz"), step=epoch + 1)
        outputs = eval_epoch(epoch)

    # (4) full-corpus assignment with the trained quantizer
    with stage_timer("full corpus assignment", fw):
        if ckpt is not None and cfg.resume and ckpt.has("assign_full.npz"):
            assign_full = ckpt.load("assign_full.npz")["assign"]
        else:
            assign_full = kmeans_assign(x_d, km.centroids)
            if ckpt is not None:
                ckpt.save("assign_full.npz", assign=assign_full)
    data_2_bkt = np.full((n_d, cfg.n_mul), -1, dtype=np.int32)
    data_2_bkt[:, 0] = assign_full
    layout = build_bucket_layout(data_2_bkt, n_bkt)

    knn_query = bundle.groundtruth[:, : cfg.k]
    gt_buckets = gt_bucket_map(knn_query, data_2_bkt)

    # honor the configured grid (main() re-defaults to the reference's
    # coarse large-scale sweep 0.1..0.95 step 0.05 when flags are absent)
    thresholds = np.arange(cfg.t_min, cfg.t_max + 1e-9, cfg.t_step)
    sweep_parts = []
    with stage_timer("baseline scan + sweep (part 0)", fw):
        if ckpt is not None and cfg.resume and ckpt.has("part0_found.npz"):
            found = ckpt.load("part0_found.npz")["found"]
        else:
            corpus = BucketCorpus.build(x_d, layout)
            found = bucket_topk(x_q, corpus, cfg.k, metric=cfg.dis_metric)
            del corpus  # free the padded device corpus before part 1 rebuilds it
            if ckpt is not None:
                ckpt.save("part0_found.npz", found=found)
        hit = gt_hit_tensor(found, knn_query, gt_buckets)
        sweep_parts.append(
            threshold_sweep(outputs, gt_buckets, hit, layout.sizes, cfg.k, thresholds)
        )

    # (5) full-corpus learning-based redundancy (batch-cursor checkpointed)
    with stage_timer("full-corpus redundancy", fw):
        if ckpt is not None and cfg.resume and ckpt.has("d2b_final.npz"):
            data_2_bkt = ckpt.load("d2b_final.npz")["d2b"]
        else:
            data_2_bkt = full_corpus_redundancy(
                x_d, data_2_bkt, km.centroids, scaler, state, cfg, ckpt=ckpt
            )
            if ckpt is not None:
                ckpt.save("d2b_final.npz", d2b=data_2_bkt)
        layout = build_bucket_layout(data_2_bkt, n_bkt)
        gt_buckets = gt_bucket_map(knn_query, data_2_bkt)

    with stage_timer("redundant scan + sweep (part 1)", fw):
        if ckpt is not None and cfg.resume and ckpt.has("part1_found.npz"):
            found = ckpt.load("part1_found.npz")["found"]
        else:
            corpus = BucketCorpus.build(x_d, layout)
            found = bucket_topk(x_q, corpus, cfg.k, metric=cfg.dis_metric)
            del corpus  # release before the caller builds a serving engine
            if ckpt is not None:
                ckpt.save("part1_found.npz", found=found)
        hit = gt_hit_tensor(found, knn_query, gt_buckets)
        sweep_parts.append(
            threshold_sweep(outputs, gt_buckets, hit, layout.sizes, cfg.k, thresholds)
        )

    if cfg.pth_log and cfg.file_name:
        os.makedirs(cfg.pth_log, exist_ok=True)
        for part, rows in enumerate(sweep_parts):
            sweep_to_csv(
                rows,
                os.path.join(
                    cfg.pth_log, cfg.file_name + "_tuning_threshold", f"{cfg.duplicate_type}_{part}.csv"
                ),
            )
        _epochs_to_csv(epoch_rows, os.path.join(cfg.pth_log, cfg.df_name))

    return {
        "epoch_rows": epoch_rows,
        "state": state,
        "kmeans": km,
        "scaler": scaler,
        "data_2_bkt": data_2_bkt,
        "layout": layout,
        "sweep_parts": sweep_parts,
        "outputs": outputs,
        "sub_idx": sub_idx,
    }


def main(argv=None):
    from ..config import parse_config

    cfg = parse_config(argv)
    # large-scale defaults (reference: n_epoch=30, batch 512, coarse sweep
    # 0.1..0.95 step 0.05) — applied only when the flag was NOT passed, so
    # an explicit `--n_epoch 10` is honored instead of silently tripled
    explicit = getattr(cfg, "_explicit", frozenset())
    if "n_epoch" not in explicit:
        cfg.n_epoch = 30
    if "batch_size" not in explicit:
        cfg.batch_size = 512
    if "t_min" not in explicit:
        cfg.t_min = 0.1
    if "t_max" not in explicit:
        cfg.t_max = 0.95
    if "t_step" not in explicit:
        cfg.t_step = 0.05
    os.makedirs(cfg.pth_log, exist_ok=True)
    with open(os.path.join(cfg.pth_log, cfg.log_name), "a", encoding="utf-8") as fw:
        run_largescale(cfg, log_file=fw)
        fprint("finish!", fw)


if __name__ == "__main__":
    main()
