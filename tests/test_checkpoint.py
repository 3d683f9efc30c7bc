import numpy as np

from lira_tpu.models.train import make_train_state, train_epoch, evaluate
from lira_tpu.models.checkpoint import save_train_state, load_train_state


def test_checkpoint_roundtrip(tmp_path, rng):
    n, n_bkt, dim = 128, 4, 8
    dist = rng.normal(size=(n, n_bkt)).astype(np.float32)
    vec = rng.normal(size=(n, dim)).astype(np.float32)
    targets = (rng.random((n, n_bkt)) < 0.3).astype(np.float32)

    state = make_train_state(seed=0, n_bkt=n_bkt, dim=dim)
    state, _ = train_epoch(state, dist, vec, targets, batch_size=32)
    path = str(tmp_path / "ckpt.npz")
    save_train_state(state, path, step=1)

    template = make_train_state(seed=99, n_bkt=n_bkt, dim=dim)
    restored, step = load_train_state(path, template)
    assert step == 1

    # identical eval outputs
    _, _, l1, o1 = evaluate(state, dist, vec, targets)
    _, _, l2, o2 = evaluate(restored, dist, vec, targets)
    np.testing.assert_allclose(o1, o2)
    assert l1 == l2

    # resuming training continues identically (Adam moments restored)
    s1, loss1 = train_epoch(state, dist, vec, targets, batch_size=32)
    s2, loss2 = train_epoch(restored, dist, vec, targets, batch_size=32)
    assert loss1 == loss2
    for layer in s1.params:
        for name in s1.params[layer]:
            np.testing.assert_array_equal(
                np.asarray(s1.params[layer][name]), np.asarray(s2.params[layer][name])
            )


def test_stage_stats():
    from lira_tpu.profiling import StageStats

    st = StageStats()
    with st.stage("a"):
        pass
    with st.stage("b"):
        pass
    rep = st.report()
    assert "a:" in rep and "b:" in rep


def test_save_load_extensionless_path(tmp_path):
    """load accepts the same path string save took ('.npz' appended)."""
    from lira_tpu.models.checkpoint import load_train_state, save_train_state
    from lira_tpu.models.train import make_train_state

    state = make_train_state(0, 4, 8)
    p = str(tmp_path / "train_state")  # no extension
    save_train_state(state, p, step=7)
    restored, step = load_train_state(p, make_train_state(1, 4, 8))
    assert step == 7
    for layer in state.params:
        for name in state.params[layer]:
            np.testing.assert_array_equal(
                np.asarray(restored.params[layer][name]),
                np.asarray(state.params[layer][name]),
            )
