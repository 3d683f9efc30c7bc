from .scaler import StandardScaler, scaled_centroid_distances
from .distr import knn_bucket_labels, knn_bucket_counts, gt_bucket_map

__all__ = [
    "StandardScaler",
    "scaled_centroid_distances",
    "knn_bucket_labels",
    "knn_bucket_counts",
    "gt_bucket_map",
]
