"""The probing MLP ("meta index"): pure-JAX pytree parameters.

Same architecture as the reference's MLP_2_Input (model_probing.py:5-39):
a distance branch (n_bkt→128→64, ReLU), a vector branch (dim→128→64, ReLU),
and a joint head (128→128→n_bkt, ReLU then sigmoid) producing per-partition
probing probabilities.  Initialization matches torch.nn.Linear defaults
(uniform ±1/√fan_in for both weight and bias) so training dynamics are
comparable at the same seed quality.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _linear_init(key, fan_in: int, fan_out: int):
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def init_params(key: jax.Array, n_bkt: int, dim: int, hidden: int = 128, branch_out: int = 64):
    """Parameter pytree for the two-branch probing MLP."""
    keys = jax.random.split(key, 6)
    return {
        "dist1": _linear_init(keys[0], n_bkt, hidden),
        "dist2": _linear_init(keys[1], hidden, branch_out),
        "vec1": _linear_init(keys[2], dim, hidden),
        "vec2": _linear_init(keys[3], hidden, branch_out),
        "head1": _linear_init(keys[4], 2 * branch_out, hidden),
        "head2": _linear_init(keys[5], hidden, n_bkt),
    }


def _dense(p, x):
    return x @ p["w"] + p["b"]


def forward(params, x_dist: jax.Array, x_vec: jax.Array) -> jax.Array:
    """(B, n_bkt), per-partition probing probabilities in (0, 1)."""
    d = jax.nn.relu(_dense(params["dist1"], x_dist))
    d = jax.nn.relu(_dense(params["dist2"], d))
    v = jax.nn.relu(_dense(params["vec1"], x_vec))
    v = jax.nn.relu(_dense(params["vec2"], v))
    h = jnp.concatenate([d, v], axis=-1)
    h = jax.nn.relu(_dense(params["head1"], h))
    return jax.nn.sigmoid(_dense(params["head2"], h))


def forward_logits(params, x_dist: jax.Array, x_vec: jax.Array) -> jax.Array:
    """Pre-sigmoid logits (numerically stable BCE path)."""
    d = jax.nn.relu(_dense(params["dist1"], x_dist))
    d = jax.nn.relu(_dense(params["dist2"], d))
    v = jax.nn.relu(_dense(params["vec1"], x_vec))
    v = jax.nn.relu(_dense(params["vec2"], v))
    h = jnp.concatenate([d, v], axis=-1)
    h = jax.nn.relu(_dense(params["head1"], h))
    return _dense(params["head2"], h)


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
