"""Measured margin calibration (engine/calibrate.py)."""

import numpy as np
import pytest


def _engine(rng, scan_dtype, n=2000, dim=16, n_bkt=7):
    import jax
    import jax.numpy as jnp
    from lira_tpu.engine.serve import QueryEngine
    from lira_tpu.labels.scaler import StandardScaler
    from lira_tpu.models.probing_mlp import init_params
    from lira_tpu.ops.distance import l2_to_centroids
    from lira_tpu.partition.assign import build_bucket_layout
    from lira_tpu.partition.kmeans import kmeans_fit

    x_d = rng.normal(size=(n, dim)).astype(np.float32)
    x_q = rng.normal(size=(40, dim)).astype(np.float32)
    d2b = np.full((n, 1), -1, np.int32)
    d2b[:, 0] = rng.integers(0, n_bkt, size=n)
    layout = build_bucket_layout(d2b, n_bkt, tile=128)
    km = kmeans_fit(x_d, n_bkt, niter=3, seed=0)
    raw = np.asarray(l2_to_centroids(jnp.asarray(x_d), jnp.asarray(km.centroids)))
    scaler = StandardScaler().fit(raw)
    params = init_params(jax.random.PRNGKey(0), n_bkt, dim)
    eng = QueryEngine(x_d, layout, km.centroids, scaler, params,
                      scan_impl="blocked", scan_dtype=scan_dtype)
    return eng, x_q


@pytest.mark.parametrize("scan_dtype", ["float32", "bfloat16", "int8"])
def test_calibrate_block_margin(rng, scan_dtype):
    from lira_tpu.engine.calibrate import calibrate_block_margin
    from lira_tpu.engine.block_scan import blocked_search

    eng, x_q = _engine(rng, scan_dtype)
    cal = calibrate_block_margin(eng, x_q, threshold=0.4, k=5,
                                 ladder=(0, 2, 4, 8))
    assert cal.zero_miss_margin is not None  # tiny corpus: some rung exact
    assert cal.margin >= cal.zero_miss_margin
    assert cal.miss_rates[cal.zero_miss_margin] == 0.0
    # miss rate is monotone non-increasing along the ladder
    rates = [cal.miss_rates[m] for m in sorted(cal.miss_rates)]
    assert all(a >= b - 1e-12 for a, b in zip(rates, rates[1:]))

    # serving at the calibrated margin reproduces the exhaustive answer
    state = eng._block_state
    from lira_tpu.engine.block_scan import S_TILES

    n_groups = state.n_super * S_TILES * (128 // eng.block_sel_rows)
    _, ids_cal, _, _ = blocked_search(state, eng, x_q, 0.4, 5 * eng.n_mul, 5,
                                      margin=cal.margin,
                                      sel_rows=eng.block_sel_rows)
    _, ids_ref, _, _ = blocked_search(state, eng, x_q, 0.4, 5 * eng.n_mul, 5,
                                      margin=n_groups,
                                      sel_rows=eng.block_sel_rows)
    for i in range(len(x_q)):
        assert set(ids_cal[i][ids_cal[i] >= 0]) == set(ids_ref[i][ids_ref[i] >= 0]), i


def test_calibrate_rejects_unblocked(rng):
    from lira_tpu.engine.calibrate import calibrate_block_margin
    from lira_tpu.engine.serve import QueryEngine

    eng, x_q = _engine(rng, "float32")
    eng.scan_impl = "xla"
    with pytest.raises(ValueError, match="blocked"):
        calibrate_block_margin(eng, x_q, 0.4, 5)


def test_autotune_block_q(rng):
    from lira_tpu.engine.calibrate import autotune_block_q

    eng, x_q = _engine(rng, "float32")
    prev = eng.block_q

    # results are block_q-invariant (the contract that makes the autotune
    # a speed-only knob): each query's probed buckets — and therefore its
    # scanned rows — do not depend on which block it lands in
    base = eng.search(x_q, 0.4, 5)
    for qb in (64, 16, 8):
        eng.block_q = qb
        r = eng.search(x_q, 0.4, 5)
        assert np.array_equal(r.ndis, base.ndis)
        for i in range(len(x_q)):
            assert set(r.ids[i][r.ids[i] >= 0]) == set(
                base.ids[i][base.ids[i] >= 0]), (qb, i)
    eng.block_q = prev

    tune = autotune_block_q(eng, x_q, 0.4, 5, candidates=(64, 16), reps=1)
    assert tune.block_q in (64, 16)
    assert eng.block_q == prev  # autotune leaves the engine unchanged
    assert set(tune.medians) == {64, 16}
    assert all(v > 0 for v in tune.medians.values())
    assert tune.medians[tune.block_q] == min(tune.medians.values())


def test_autotune_rejects_unblocked(rng):
    from lira_tpu.engine.calibrate import autotune_block_q

    eng, x_q = _engine(rng, "float32")
    eng.scan_impl = "xla"
    with pytest.raises(ValueError, match="blocked"):
        autotune_block_q(eng, x_q, 0.4, 5)
