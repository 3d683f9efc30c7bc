from .distance import pairwise_scores, l2_to_centroids, scores_to_distances
from .knn import exact_knn, self_knn

__all__ = [
    "pairwise_scores",
    "l2_to_centroids",
    "scores_to_distances",
    "exact_knn",
    "self_knn",
]
