"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic (parallel/) is exercised on host CPU devices, so
collective top-k merge and DP training are testable without a TPU pod.

Note: this environment's sitecustomize registers a remote 'axon' TPU
backend and forces jax_platforms='axon,cpu' via jax.config — env vars alone
don't override it, so we override the config here before any backend
initialization (compiles over the axon tunnel take ~30s each; the whole
suite must run on local CPU).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    # backends already initialized (e.g. single-test debugging); tests that
    # need 8 devices will skip via the n_devices fixture below.
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(43)


@pytest.fixture(scope="session")
def tiny_dataset():
    from lira_tpu.io.datasets import synthetic_dataset

    return synthetic_dataset(n_base=2000, n_query=50, dim=16, n_clusters=8, k_gt=20, seed=43)
