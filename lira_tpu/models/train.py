"""Training / evaluation / inference loops for the probing MLP.

Replaces the reference's torch loops (model_probing.py:41-156) with jitted
optax steps: an epoch is a lax.scan over device-resident superbatches, BCE
is computed from logits (numerically stable; identical value to sigmoid+BCE),
Adam lr 1e-4 matches the reference optimizer (LIRA_smallscale.py:310).
Large corpora stream host→device in superbatches so the (n, n_bkt+dim)
feature matrix never has to fit in HBM at once.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .probing_mlp import forward, forward_logits, init_params


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation


def make_train_state(seed: int, n_bkt: int, dim: int, lr: float = 1e-4) -> TrainState:
    params = init_params(jax.random.PRNGKey(seed), n_bkt, dim)
    tx = optax.adam(lr, eps=1e-8)
    return TrainState(params=params, opt_state=tx.init(params), tx=tx)


def _masked_bce_from_logits(logits, targets, row_mask):
    """Mean BCE over real rows (padding rows excluded from the mean)."""
    per_elem = optax.sigmoid_binary_cross_entropy(logits, targets)
    per_row = jnp.mean(per_elem, axis=-1)
    denom = jnp.maximum(jnp.sum(row_mask), 1.0)
    return jnp.sum(per_row * row_mask) / denom


@partial(jax.jit, static_argnames=("tx", "batch_size"))
def _train_superbatch(params, opt_state, tx, dist, vec, targets, row_mask, batch_size):
    """Sequential Adam steps over the batches inside one superbatch."""
    n_batches = dist.shape[0] // batch_size

    def reshape(x):
        return x.reshape(n_batches, batch_size, *x.shape[1:])

    def step(carry, batch):
        params, opt_state, loss_sum = carry
        b_dist, b_vec, b_tgt, b_mask = batch

        def loss_fn(p):
            logits = forward_logits(p, b_dist, b_vec)
            return _masked_bce_from_logits(logits, b_tgt, b_mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, loss_sum + loss), None

    init = (params, opt_state, jnp.float32(0.0))
    (params, opt_state, loss_sum), _ = jax.lax.scan(
        step, init, (reshape(dist), reshape(vec), reshape(targets), reshape(row_mask))
    )
    return params, opt_state, loss_sum


def _superbatches(n: int, batch_size: int, super_rows: int):
    """Yield (start, end, padded_len) windows; padded_len is a batch multiple."""
    super_rows = max(batch_size, (super_rows // batch_size) * batch_size)
    for s in range(0, n, super_rows):
        e = min(s + super_rows, n)
        padded = ((e - s + batch_size - 1) // batch_size) * batch_size
        yield s, e, padded


def train_epoch(
    state: TrainState,
    dist: np.ndarray,
    vec: np.ndarray,
    targets: np.ndarray,
    batch_size: int = 64,
    super_rows: int = 262144,
) -> tuple[TrainState, float]:
    """One pass over the data (no shuffling, like the reference loader).

    Returns (new_state, mean per-batch loss) — same loss accounting as the
    reference's total_loss/len(train_loader).
    """
    n = len(dist)
    params, opt_state = state.params, state.opt_state
    loss_sum, n_batches = 0.0, 0
    if isinstance(dist, jax.Array):
        # dist already lives in HBM (pipelines stage features on device) but
        # numpy targets/vec would re-upload EVERY superbatch of EVERY epoch
        # (~1 GB/epoch at 100k rows x 2048 buckets through a tunneled rig);
        # promote each independently, once — no bigger than the feature matrix
        if not isinstance(targets, jax.Array):
            targets = jnp.asarray(targets, jnp.float32)
        if not isinstance(vec, jax.Array):
            vec = jnp.asarray(vec, jnp.float32)
    device_resident = isinstance(dist, jax.Array)
    for s, e, padded in _superbatches(n, batch_size, super_rows):
        if device_resident:
            # features already in HBM (see pipelines): slice — and pad the
            # ragged tail — on device, no host→device re-upload per epoch
            bd, bv, bt = dist[s:e], vec[s:e], targets[s:e]
            mask = jnp.ones(padded, jnp.float32)
            if padded != e - s:
                rows = ((0, padded - (e - s)),)
                bd = jnp.pad(bd, rows + ((0, 0),))
                bv = jnp.pad(bv, rows + ((0, 0),))
                bt = jnp.pad(bt, rows + ((0, 0),))
                mask = mask.at[e - s :].set(0.0)
        else:
            bd = np.zeros((padded, dist.shape[1]), np.float32)
            bv = np.zeros((padded, vec.shape[1]), np.float32)
            bt = np.zeros((padded, targets.shape[1]), np.float32)
            mask_np = np.zeros(padded, np.float32)
            bd[: e - s] = np.asarray(dist[s:e])
            bv[: e - s] = np.asarray(vec[s:e])
            bt[: e - s] = np.asarray(targets[s:e])
            mask_np[: e - s] = 1.0
            bd, bv, bt, mask = map(jnp.asarray, (bd, bv, bt, mask_np))
        params, opt_state, ls = _train_superbatch(
            params, opt_state, state.tx, bd, bv, bt, mask, batch_size,
        )
        loss_sum += float(ls)
        n_batches += padded // batch_size
    return TrainState(params, opt_state, state.tx), loss_sum / max(n_batches, 1)


@jax.jit
def _forward_chunk(params, dist, vec):
    logits = forward_logits(params, dist, vec)
    return jax.nn.sigmoid(logits), logits


@jax.jit
def _forward_chunk_probs(params, dist, vec):
    return jax.nn.sigmoid(forward_logits(params, dist, vec))


def _batched_forward(params, dist, vec, chunk: int = 65536, want_logits: bool = True):
    """Chunked forward with host materialization.

    At corpus scale the (n, n_bkt) probs/logits are several GB each and the
    device→host transfer dominates on a tunneled rig — callers that only
    need scores (the redundancy pass) set want_logits=False and move half
    the bytes."""
    n = len(dist)
    outs, logits_all = [], []
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        d = jnp.asarray(dist[s:e], jnp.float32)
        v = jnp.asarray(vec[s:e], jnp.float32)
        if want_logits:
            probs, logits = _forward_chunk(params, d, v)
            logits_all.append(np.asarray(logits))
        else:
            probs = _forward_chunk_probs(params, d, v)
        outs.append(np.asarray(probs))
    return np.concatenate(outs), (np.concatenate(logits_all) if want_logits else None)


def evaluate(
    state_or_params,
    dist: np.ndarray,
    vec: np.ndarray,
    targets: np.ndarray,
    sigma: float = 0.5,
    batch_size: int = 64,
) -> tuple[np.ndarray, np.ndarray, float, np.ndarray]:
    """Returns (targets, predicts, avg_loss, outputs) like the reference
    model_evaluate (model_probing.py:86-132); avg_loss is the mean of
    per-batch mean BCE under the reference's batch partition."""
    params = getattr(state_or_params, "params", state_or_params)
    outputs, logits = _batched_forward(params, dist, vec)
    predicts = outputs > sigma

    t = np.asarray(targets, dtype=np.float32)
    per_elem = np.maximum(logits, 0) - logits * t + np.log1p(np.exp(-np.abs(logits)))
    per_row = per_elem.mean(axis=1)
    n = len(per_row)
    batch_means = [per_row[s : min(s + batch_size, n)].mean() for s in range(0, n, batch_size)]
    avg_loss = float(np.mean(batch_means))
    return t, predicts, avg_loss, outputs


@jax.jit
def _forward_counts_chunk(params, dist, vec, sigma):
    probs = jax.nn.sigmoid(forward_logits(params, dist, vec))
    return jnp.sum(probs > sigma, axis=1).astype(jnp.int32)


def predict_counts(
    state_or_params, dist, vec, sigma: float = 0.5, chunk: int = 65536
) -> np.ndarray:
    """Per-row predicted-nprobe counts Σ(score > σ), reduced ON DEVICE.

    The redundancy selector only ranks points by this count; transferring it
    instead of the (n, n_bkt) score matrix moves n×4 bytes (4 MB at 1M)
    rather than ~4 GB — the selected minority is then re-scored with
    `infer`.  Counts are identical to `infer(...)[0].sum(axis=1)`."""
    params = getattr(state_or_params, "params", state_or_params)
    out = np.empty(len(dist), np.int32)
    for s in range(0, len(dist), chunk):
        e = min(s + chunk, len(dist))
        out[s:e] = np.asarray(_forward_counts_chunk(
            params, jnp.asarray(dist[s:e], jnp.float32),
            jnp.asarray(vec[s:e], jnp.float32), jnp.float32(sigma),
        ))
    return out


def infer(
    state_or_params, dist: np.ndarray, vec: np.ndarray, sigma: float = 0.5
) -> tuple[np.ndarray, np.ndarray]:
    """(predicts, outputs) — scoring pass used by the redundancy engine
    (reference: model_probing.py:135-156).  Skips the logits transfer
    (half the device→host bytes of `evaluate` at corpus scale)."""
    params = getattr(state_or_params, "params", state_or_params)
    outputs, _ = _batched_forward(params, dist, vec, want_logits=False)
    return outputs > sigma, outputs
