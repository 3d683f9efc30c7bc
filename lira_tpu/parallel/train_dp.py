"""Data-parallel probing-MLP training: shard_map over the batch axis.

Each device computes grads on its batch shard; grads/loss are pmean-reduced
over ICI; the Adam update runs replicated.  This is the multi-chip form of
models/train.py's single-chip step (the reference trains on one GPU only,
LIRA_smallscale.py:263 — no DDP existed to port; SURVEY.md §2.4).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..models.probing_mlp import forward_logits
from ..models.train import TrainState


def make_dp_train_step(tx: optax.GradientTransformation, mesh: Mesh, axis: str = "data"):
    """Jitted DP step: (params, opt_state, dist, vec, targets, mask) → (params, opt_state, loss).

    Batch arrays must have leading dim divisible by mesh size; `mask` zeroes
    padding rows out of the loss.
    """

    def local_step(params, opt_state, dist, vec, targets, mask, denom):
        # no collectives inside the differentiated function: the local loss
        # is the shard's masked sum over the *global* row count, so
        # psum(local grads) is exactly the global-mean gradient
        def loss_fn(p):
            logits = forward_logits(p, dist, vec)
            per_elem = optax.sigmoid_binary_cross_entropy(logits, targets)
            per_row = jnp.mean(per_elem, axis=-1)
            return jnp.sum(per_row * mask) / denom[0]

        loss_local, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.lax.psum(grads, axis)
        loss = jax.lax.psum(loss_local, axis)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


# jit caches key on function identity: rebuilding the shard_map step per
# epoch would recompile the identical program every dp_train_epoch call
_STEP_CACHE: dict = {}


def _cached_dp_step(tx, mesh: Mesh, axis: str):
    key = (id(tx), mesh, axis)
    if key not in _STEP_CACHE:
        _STEP_CACHE[key] = make_dp_train_step(tx, mesh, axis)
    return _STEP_CACHE[key]


def dp_train_epoch(
    state: TrainState,
    mesh: Mesh,
    dist: np.ndarray,
    vec: np.ndarray,
    targets: np.ndarray,
    global_batch: int = 512,
    axis: str = "data",
) -> tuple[TrainState, float]:
    """One DP epoch over host arrays (pads the tail batch)."""
    step = _cached_dp_step(state.tx, mesh, axis)
    n = len(dist)
    n_dev = mesh.devices.size
    global_batch = max(n_dev, (global_batch // n_dev) * n_dev)
    params, opt_state = state.params, state.opt_state
    loss_sum, n_batches = 0.0, 0
    for s in range(0, n, global_batch):
        e = min(s + global_batch, n)
        bs = ((e - s + n_dev - 1) // n_dev) * n_dev
        bd = np.zeros((bs, dist.shape[1]), np.float32)
        bv = np.zeros((bs, vec.shape[1]), np.float32)
        bt = np.zeros((bs, targets.shape[1]), np.float32)
        mask = np.zeros(bs, np.float32)
        bd[: e - s], bv[: e - s], bt[: e - s] = dist[s:e], vec[s:e], targets[s:e]
        mask[: e - s] = 1.0
        denom = np.array([float(e - s)], np.float32)
        params, opt_state, loss = step(params, opt_state, bd, bv, bt, mask, denom)
        loss_sum += float(loss)
        n_batches += 1
    return TrainState(params, opt_state, state.tx), loss_sum / max(n_batches, 1)
