"""lira_tpu — TPU-native learning-based query-aware partitioning for ANN search.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the LIRA
reference implementation (qfshen23/LIRA-ANN-search): learned partition
probing over a K-Means coarse quantizer, learning-based redundancy for
boundary vectors, and an exact in-partition scan query engine — built
TPU-first (MXU matmul distance kernels, fused Pallas scan/top-k, pjit/mesh
sharding for multi-chip serving).

Layer map (mirrors SURVEY.md §1 capabilities, new architecture):

    io/         dataset formats (fvecs/ivecs/bvecs), caches, artifacts
    ops/        distance / top-k / brute-force kNN kernels (XLA + Pallas)
    partition/  K-Means partitioner + ragged (CSR) bucket layout
    labels/     kNN→bucket multi-label construction, distance standardizer
    models/     probing MLP (pure JAX) + train/eval/infer + metrics
    redundancy/ learning-based redundancy assignment
    engine/     query engine: probe → select → scan → top-k, threshold sweeps
    parallel/   mesh/sharding: sharded corpus scan, ICI top-k merge, DP train
    pipelines/  end-to-end entry points (small-scale, large-scale, index, search)
"""

__version__ = "0.1.0"

import os as _os


def enable_compilation_cache(path: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache.

    Remote-compile environments (and TPU compiles generally) cost seconds to
    minutes per program; the persistent cache makes every pipeline/benchmark
    program compile once per machine.
    """
    import jax

    path = path or _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), ".jax_cache")
    _os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
