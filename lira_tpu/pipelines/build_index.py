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

    extra_meta = {"k": cfg.k, "redundancy_ratio": cfg.redundancy_ratio}
    if cfg.calibrate_margin:
        # measured zero-miss selection margins for the approximate screens
        # on THIS dataset's queries (ADVICE r3: the shipped bf16 default sits
        # at the measured zero-miss point with no drift headroom — builds
        # that opt in persist their own measured margin instead)
        with stage_timer("calibrate screen margins", fw):
            extra_meta["calibrated_margins"] = calibrate_screen_margins(
                x_d, data_2_bkt, km.centroids, scaler, state.params,
                x_q, n_bkt, cfg.k, log_file=fw,
            )

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
        extra_meta=extra_meta,
    )
    fprint(f">> artifacts saved under prefix {prefix}", fw)
    return prefix


def calibrate_screen_margins(
    x_d, data_2_bkt, centroids, scaler, params, x_q, n_bkt, k,
    n_cal: int = 4096, log_file=None,
) -> dict:
    """Measured zero-miss selection margin per screen dtype on this index.

    Runs engine/calibrate.calibrate_block_margin for the bfloat16 and int8
    screens at a wide operating point (mean nprobe ≈ min(32, n_bkt/4) —
    more probed tiles per query = more chances for a rounding miss, so the
    wide point upper-bounds the narrow ones) and returns
    {dtype: {"margin", "zero_miss_margin", "miss_rates"}} for the manifest.
    A dtype whose engine fails to build (e.g. int8 Mosaic lowering off-TPU
    variants) is skipped rather than failing the build.
    """
    from ..engine.calibrate import calibrate_block_margin
    from ..engine.serve import QueryEngine

    layout = build_bucket_layout(data_2_bkt, n_bkt)
    q = np.asarray(x_q[:n_cal], np.float32)
    out: dict = {}
    for dtype in ("bfloat16", "int8"):
        try:
            eng = QueryEngine(
                x_d, layout, centroids, scaler, params,
                scan_impl="blocked", scan_dtype=dtype,
            )
            probe_out = eng.probe(q[: min(512, len(q))])
            target = min(32.0, n_bkt / 4.0)
            thr = float(np.quantile(probe_out, 1.0 - target / n_bkt))
            cal = calibrate_block_margin(eng, q, thr, k)
            out[dtype] = {
                "margin": int(cal.margin),
                "zero_miss_margin": (
                    None if cal.zero_miss_margin is None
                    else int(cal.zero_miss_margin)
                ),
                "miss_rates": {str(m): r for m, r in cal.miss_rates.items()},
                "sel_rows": int(eng.block_sel_rows),
            }
            fprint(
                f">> calibrated {dtype} screen margin: {cal.margin} groups "
                f"(zero-miss at {cal.zero_miss_margin}, sel_rows="
                f"{eng.block_sel_rows}, {len(q)} queries)", log_file,
            )
            del eng
        except Exception as exc:  # pragma: no cover - env-specific
            # Only swallow known environment-specific lowering failures
            # (e.g. int8 Mosaic off-TPU); anything else is a real bug the
            # user opted in to see — --calibrate_margin must not silently
            # ship default margins over it.
            msg = f"{type(exc).__name__}: {exc}"
            env_markers = (
                "mosaic", "lowering", "unsupported", "unimplemented",
                "not implemented", "interpret", "tpu",
            )
            if not any(m in msg.lower() for m in env_markers):
                raise
            fprint(f">> margin calibration skipped for {dtype}: {msg}", log_file)
            out[dtype] = {"skipped": msg}
    return out


def main(argv=None):
    cfg = parse_config(argv)
    os.makedirs(cfg.pth_log, exist_ok=True)
    with open(os.path.join(cfg.pth_log, cfg.log_name), "a", encoding="utf-8") as fw:
        build_index(cfg, log_file=fw)


if __name__ == "__main__":
    main()
