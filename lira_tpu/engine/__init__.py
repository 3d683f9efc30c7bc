from .scan import bucket_topk, BucketCorpus
from .sweep import threshold_sweep, gt_hit_tensor, SweepRow
from .serve import QueryEngine
from .calibrate import calibrate_block_margin, MarginCalibration

__all__ = [
    "bucket_topk",
    "BucketCorpus",
    "threshold_sweep",
    "gt_hit_tensor",
    "SweepRow",
    "QueryEngine",
    "calibrate_block_margin",
    "MarginCalibration",
]
