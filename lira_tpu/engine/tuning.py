"""Operating-point selection from sweep curves.

The reference leaves choosing a serving threshold to the user (read the
threshold-sweep CSV, pick a row).  These helpers close the loop: given
sweep rows (engine.sweep / serve.sweep output), pick the cheapest
threshold meeting a recall target, or compare two sweeps at matched cost.
"""

from __future__ import annotations

from dataclasses import dataclass

from .sweep import SweepRow


@dataclass
class OperatingPoint:
    threshold: float
    recall: float
    nprobe: float
    computations: float


def _as_tuple(row) -> OperatingPoint:
    if isinstance(row, SweepRow):
        return OperatingPoint(row.threshold, row.recall, row.nprobe, row.computations)
    return OperatingPoint(
        row["threshold"],
        row.get("avg_recall", row.get("Recall", 0.0)),
        row.get("avg_nprobe", row.get("nprobe", 0.0)),
        row.get("avg_cmp", row.get("Computations", 0.0)),
    )


def pick_threshold(rows, recall_target: float) -> OperatingPoint | None:
    """Cheapest (fewest computations) operating point with recall ≥ target."""
    candidates = [_as_tuple(r) for r in rows]
    feasible = [c for c in candidates if c.recall >= recall_target]
    if not feasible:
        return None
    return min(feasible, key=lambda c: (c.computations, -c.recall))


def compare_at_recall(rows_a, rows_b, recall_target: float) -> dict | None:
    """Cost ratio of two sweeps at the same recall target.

    Returns e.g. {'a': OperatingPoint, 'b': OperatingPoint,
    'ndis_ratio': b/a, 'nprobe_ratio': b/a} — the LIRA-vs-IVF /
    redundancy-gain comparison in one call (paper Figs. 7-8 style).
    """
    a = pick_threshold(rows_a, recall_target)
    b = pick_threshold(rows_b, recall_target)
    if a is None or b is None:
        return None
    return {
        "a": a,
        "b": b,
        "ndis_ratio": b.computations / a.computations if a.computations else float("inf"),
        "nprobe_ratio": b.nprobe / a.nprobe if a.nprobe else float("inf"),
    }
