"""Checkpoint/resume of the large-scale pipeline (round-3: VERDICT item 4).

A run killed mid-training or mid-redundancy must resume from its
checkpoint directory to a final state identical to an uninterrupted run,
without recomputing completed work.
"""

import numpy as np
import pytest

from lira_tpu.config import Config
from lira_tpu.io.datasets import synthetic_dataset


def _cfg(logdir, n_epoch=4, resume=False):
    cfg = Config(
        dataset="synthetic", k=5, n_bkt=10, n_epoch=n_epoch, batch_size=64,
        subset_fraction=0.25, redundancy_batch=1500, data_path=str(logdir),
        checkpoint=True, resume=resume,
    ).update()
    cfg.pth_log = str(logdir) + "/"
    return cfg


@pytest.fixture(scope="module")
def bundle():
    return synthetic_dataset(n_base=4000, n_query=30, dim=12, n_clusters=10,
                             k_gt=20, seed=43)


def _params_flat(state):
    return {
        f"{layer}/{name}": np.asarray(state.params[layer][name])
        for layer in state.params for name in state.params[layer]
    }


def test_resume_after_training_kill_matches_uninterrupted(bundle, tmp_path, monkeypatch):
    from lira_tpu.pipelines import largescale

    # reference: uninterrupted run
    ref = largescale.run_largescale(_cfg(tmp_path / "a"), bundle=bundle, use_cache=False)

    # interrupted run: die after 2 training epochs
    real_train = largescale.train_epoch
    calls = {"n": 0}

    def dying_train(*args, **kwargs):
        if calls["n"] == 2:
            raise RuntimeError("killed mid-training")
        calls["n"] += 1
        return real_train(*args, **kwargs)

    monkeypatch.setattr(largescale, "train_epoch", dying_train)
    with pytest.raises(RuntimeError, match="killed mid-training"):
        largescale.run_largescale(_cfg(tmp_path / "b"), bundle=bundle, use_cache=False)
    monkeypatch.setattr(largescale, "train_epoch", real_train)

    # resume must restore epoch 2 and run only epochs 2..3
    calls2 = {"n": 0}

    def counting_train(*args, **kwargs):
        calls2["n"] += 1
        return real_train(*args, **kwargs)

    monkeypatch.setattr(largescale, "train_epoch", counting_train)
    res = largescale.run_largescale(
        _cfg(tmp_path / "b", resume=True), bundle=bundle, use_cache=False
    )
    assert calls2["n"] == 2, "resume must not retrain completed epochs"

    # identical final state: params bit-equal, identical index + sweeps
    pa, pb = _params_flat(ref["state"]), _params_flat(res["state"])
    for key in pa:
        np.testing.assert_array_equal(pa[key], pb[key], err_msg=key)
    np.testing.assert_array_equal(ref["data_2_bkt"], res["data_2_bkt"])
    for part in range(2):
        for ra, rb in zip(ref["sweep_parts"][part], res["sweep_parts"][part]):
            assert ra == rb


def test_resume_mid_redundancy_skips_completed_batches(bundle, tmp_path, monkeypatch):
    from lira_tpu.pipelines import largescale

    ref = largescale.run_largescale(_cfg(tmp_path / "a"), bundle=bundle, use_cache=False)

    # die after the first redundancy batch (4000 rows / 1500 = 3 batches)
    real_batch = largescale._fused_redundancy_batch
    calls = {"n": 0}

    def dying_batch(*args, **kwargs):
        if calls["n"] == 1:
            raise RuntimeError("killed mid-redundancy")
        calls["n"] += 1
        return real_batch(*args, **kwargs)

    monkeypatch.setattr(largescale, "_fused_redundancy_batch", dying_batch)
    with pytest.raises(RuntimeError, match="killed mid-redundancy"):
        largescale.run_largescale(_cfg(tmp_path / "c"), bundle=bundle, use_cache=False)

    calls2 = {"n": 0}

    def counting_batch(*args, **kwargs):
        calls2["n"] += 1
        return real_batch(*args, **kwargs)

    monkeypatch.setattr(largescale, "_fused_redundancy_batch", counting_batch)
    res = largescale.run_largescale(
        _cfg(tmp_path / "c", resume=True), bundle=bundle, use_cache=False
    )
    assert calls2["n"] == 2, "resume must skip the completed redundancy batch"
    np.testing.assert_array_equal(ref["data_2_bkt"], res["data_2_bkt"])


def test_fresh_run_clears_stale_checkpoints(bundle, tmp_path):
    from lira_tpu.pipelines.largescale import PipelineCheckpoint, run_largescale

    cfg = _cfg(tmp_path / "d", n_epoch=1)
    run_largescale(cfg, bundle=bundle, use_cache=False)
    ckpt = PipelineCheckpoint(str(tmp_path / "d") + "/" + cfg.file_name + "_ckpt")
    assert ckpt.has("train_state.npz") and ckpt.has("d2b_final.npz")
    # a fresh (non-resume) run wipes the directory before writing anew
    ckpt.save("stale_marker.npz", x=np.zeros(1))
    run_largescale(cfg, bundle=bundle, use_cache=False)
    assert not ckpt.has("stale_marker.npz")
    assert ckpt.has("d2b_final.npz")
