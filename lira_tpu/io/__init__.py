from .xvecs import read_xvecs, write_xvecs
from .datasets import load_data, synthetic_dataset, DatasetBundle
from .cache import knn_cache_dir, load_knn_cache, save_knn_cache

__all__ = [
    "read_xvecs",
    "write_xvecs",
    "load_data",
    "synthetic_dataset",
    "DatasetBundle",
    "knn_cache_dir",
    "load_knn_cache",
    "save_knn_cache",
]
