from .kmeans import KMeans, kmeans_fit, kmeans_assign
from .assign import BucketLayout, build_bucket_layout

__all__ = ["KMeans", "kmeans_fit", "kmeans_assign", "BucketLayout", "build_bucket_layout"]
