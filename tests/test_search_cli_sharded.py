import jax
import numpy as np
import pytest

from lira_tpu.config import Config
from lira_tpu.io.datasets import synthetic_dataset, write_dataset

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


@needs_8
def test_search_cli_sharded_matches_single(tmp_path):
    from lira_tpu.pipelines.build_index import build_index
    from lira_tpu.pipelines.search_cli import run_search

    bundle = synthetic_dataset(n_base=1600, n_query=20, dim=12, n_clusters=8, k_gt=10, seed=4)
    write_dataset(bundle, str(tmp_path))
    cfg = Config(
        dataset="synthetic", k=5, n_bkt=8, n_epoch=1, batch_size=64, data_path=str(tmp_path)
    ).update()
    out_dir = str(tmp_path / "artifacts")
    build_index(cfg, bundle=bundle, out_dir=out_dir, use_cache=False)

    kwargs = dict(
        dataset="synthetic", data_path=str(tmp_path), k=5,
        t_min=0.2, t_max=0.4, t_step=0.2, bundle=bundle,
    )
    rows1 = run_search(out_dir, cfg.file_name, n_shards=1, **kwargs)
    rows8 = run_search(out_dir, cfg.file_name, n_shards=8, **kwargs)
    for r1, r8 in zip(rows1, rows8):
        assert r1["avg_nprobe"] == r8["avg_nprobe"]
        assert r1["avg_cmp"] == r8["avg_cmp"]
        assert abs(r1["avg_recall"] - r8["avg_recall"]) < 1e-9

    # --stream_batch: pipelined mode must reproduce the sweep metrics
    # exactly on both engines (uneven tail: 20 queries, batch 8)
    for n_shards, base in ((1, rows1), (8, rows8)):
        rows_s = run_search(out_dir, cfg.file_name, n_shards=n_shards,
                            stream_batch=8, **kwargs)
        for rb, rs in zip(base, rows_s):
            assert rb["avg_nprobe"] == rs["avg_nprobe"]
            assert rb["avg_cmp"] == rs["avg_cmp"]
            assert abs(rb["avg_recall"] - rs["avg_recall"]) < 1e-9
