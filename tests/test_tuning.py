from lira_tpu.engine.sweep import SweepRow
from lira_tpu.engine.tuning import pick_threshold, compare_at_recall


def _rows(spec):
    return [SweepRow(threshold=t, nprobe=np_, recall=r, computations=c) for t, np_, r, c in spec]


def test_pick_threshold():
    rows = _rows([(0.1, 10, 0.99, 10000), (0.3, 5, 0.95, 5000), (0.5, 2, 0.80, 2000)])
    op = pick_threshold(rows, 0.9)
    assert op.threshold == 0.3 and op.computations == 5000
    assert pick_threshold(rows, 0.999) is None


def test_pick_threshold_dict_rows():
    rows = [
        {"threshold": 0.2, "avg_recall": 0.97, "avg_nprobe": 8, "avg_cmp": 8000},
        {"threshold": 0.4, "avg_recall": 0.92, "avg_nprobe": 4, "avg_cmp": 4000},
    ]
    op = pick_threshold(rows, 0.9)
    assert op.threshold == 0.4


def test_compare_at_recall():
    lira = _rows([(0.3, 5, 0.95, 5000)])
    ivf = _rows([(0.0, 8, 0.95, 9000)])
    cmp = compare_at_recall(lira, ivf, 0.9)
    assert cmp["ndis_ratio"] == 9000 / 5000
    assert cmp["nprobe_ratio"] == 8 / 5
