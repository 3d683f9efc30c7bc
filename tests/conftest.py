"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic (parallel/) is exercised on host CPU devices via
--xla_force_host_platform_device_count, so collective top-k merge and DP
training are testable without a TPU pod.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(43)


@pytest.fixture(scope="session")
def tiny_dataset():
    from lira_tpu.io.datasets import synthetic_dataset

    return synthetic_dataset(n_base=2000, n_query=50, dim=16, n_clusters=8, k_gt=20, seed=43)
