"""Device mesh construction.

The reference has no distributed layer at all (OpenMP threads + one GPU;
SURVEY.md §2.4) — this subsystem is new, TPU-idiomatic scaling: a 1-D
`data` mesh axis carries both corpus shards (query serving) and batch
shards (probing-MLP data parallelism); collectives ride ICI within a slice.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))
