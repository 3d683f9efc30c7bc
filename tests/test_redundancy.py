import numpy as np
import pytest

from lira_tpu.redundancy.assign import redundancy_rows, apply_redundancy, select_top_ratio
from lira_tpu.partition.assign import build_bucket_layout


def _oracle_row(score, predict, cur, n_mul):
    """Per-point restatement of the reference branch logic
    (LIRA_smallscale.py:77-97) with stable descending tie order."""
    n_bkt = len(score)
    order = np.lexsort((np.arange(n_bkt), -score))  # desc by score, ties by index
    n_eff = int((predict != 0).sum())
    n_act = min(n_mul - 1, n_eff)
    loc = int(np.where(order == cur)[0][0])
    row = np.full(n_mul, -1, dtype=np.int32)
    if loc >= n_act:
        row[0] = cur
        row[1 : n_act + 1] = order[:n_act]
    elif n_eff == n_act:
        row[:n_act] = order[:n_act]
    else:
        row[: n_act + 1] = order[: n_act + 1]
    return row


@pytest.mark.parametrize("n_mul", [2, 3, 4])
def test_rows_match_oracle(rng, n_mul):
    n, n_bkt = 200, 16
    scores = rng.random((n, n_bkt)).astype(np.float32)
    predicts = scores > 0.5
    cur = rng.integers(0, n_bkt, size=n).astype(np.int32)
    got = redundancy_rows(scores, predicts, cur, n_mul)
    for i in range(n):
        np.testing.assert_array_equal(
            got[i], _oracle_row(scores[i], predicts[i], cur[i], n_mul), err_msg=f"row {i}"
        )


def test_rows_with_ties():
    # exact ties: stable descending order must match the oracle's lexsort
    scores = np.array([[0.7, 0.7, 0.7, 0.1]], dtype=np.float32)
    predicts = scores > 0.5
    for cur in range(4):
        got = redundancy_rows(scores, predicts, np.array([cur]), 3)
        np.testing.assert_array_equal(got[0], _oracle_row(scores[0], predicts[0], cur, 3))


def test_no_effective_partitions_is_noop():
    scores = np.array([[0.1, 0.2, 0.3, 0.4]], dtype=np.float32)
    predicts = np.zeros((1, 4), dtype=bool)  # n_eff = 0
    got = redundancy_rows(scores, predicts, np.array([2]), 2)
    np.testing.assert_array_equal(got[0], [2, -1])


def test_native_always_retained(rng):
    # in every branch the native partition must remain in the row
    n, n_bkt, n_mul = 500, 8, 2
    scores = rng.random((n, n_bkt)).astype(np.float32)
    predicts = scores > 0.4
    cur = rng.integers(0, n_bkt, size=n).astype(np.int32)
    rows = redundancy_rows(scores, predicts, cur, n_mul)
    assert all(cur[i] in rows[i] for i in range(n))


def test_select_top_ratio():
    predicts = np.array([[1, 1, 1], [0, 0, 0], [1, 1, 0], [1, 0, 0]], dtype=bool)
    sel = select_top_ratio(predicts, 0.5)
    np.testing.assert_array_equal(sel, [0, 2])  # nprobe 3 and 2


def test_apply_redundancy_and_layout(rng):
    n, n_bkt, n_mul = 100, 8, 2
    d2b = np.full((n, n_mul), -1, dtype=np.int32)
    d2b[:, 0] = rng.integers(0, n_bkt, size=n)
    scores = rng.random((n, n_bkt)).astype(np.float32)
    predicts = scores > 0.5
    sel = select_top_ratio(predicts, 0.1)
    out = apply_redundancy(d2b, scores, predicts, sel)
    # non-selected rows untouched
    untouched = np.setdiff1d(np.arange(n), sel)
    np.testing.assert_array_equal(out[untouched], d2b[untouched])
    # layout rebuild grows buckets only (dedup keeps total >= n)
    lay = build_bucket_layout(out, n_bkt)
    assert lay.total >= n
    # every point still belongs to its native bucket
    for i in range(n):
        assert d2b[i, 0] in out[i]


def test_subset_path_matches_full_apply(rng):
    """The device-reduced counts → subset-rescore path (pipelines) must be
    bit-identical to scoring the full corpus and calling apply_redundancy."""
    from lira_tpu.redundancy.assign import apply_redundancy_subset

    n, n_bkt, n_mul = 200, 8, 3
    d2b = np.full((n, n_mul), -1, dtype=np.int32)
    d2b[:, 0] = rng.integers(0, n_bkt, size=n)
    scores = rng.random((n, n_bkt)).astype(np.float32)
    predicts = scores > 0.5

    counts = predicts.sum(axis=1).astype(np.int32)
    sel_counts = np.sort(select_top_ratio(counts, 0.2))
    sel_full = select_top_ratio(predicts, 0.2)
    np.testing.assert_array_equal(np.sort(sel_full), sel_counts)

    full = apply_redundancy(d2b, scores, predicts, sel_full)
    sub = apply_redundancy_subset(d2b, scores[sel_counts], predicts[sel_counts], sel_counts)
    np.testing.assert_array_equal(full, sub)
