"""Training-state checkpoint/resume.

The reference has no mid-training checkpoints at all (SURVEY.md §5 —
models are retrained every run); this adds save/resume for the probing
MLP's full TrainState (params + Adam moments) as a flat .npz, so long
large-scale training runs are restartable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .train import TrainState


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for key, val in tree.items():
            out.update(_flatten(val, f"{prefix}{key}/"))
    elif isinstance(tree, (list, tuple)):
        for i, val in enumerate(tree):
            out.update(_flatten(val, f"{prefix}{i}/"))
        if hasattr(tree, "_fields"):  # NamedTuple: remember the type by name
            out[f"{prefix}__namedtuple__"] = np.array(type(tree).__name__)
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def save_train_state(state: TrainState, path: str, step: int = 0) -> None:
    """Atomic (write-tmp + rename): a kill mid-save never corrupts the
    checkpoint a resume depends on."""
    import os

    flat = {"step": np.array(step)}
    flat.update({f"params/{k}": v for k, v in _flatten(state.params).items()})
    leaves, treedef = jax.tree_util.tree_flatten(state.opt_state)
    for i, leaf in enumerate(leaves):
        flat[f"opt/{i}"] = np.asarray(leaf)
    if not path.endswith(".npz"):
        path = path + ".npz"
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def load_train_state(path: str, template: TrainState) -> tuple[TrainState, int]:
    """Restore into the structure of `template` (same model/optimizer config).

    Accepts the same path string the save took: save appends '.npz' when
    missing, so load must too — otherwise a symmetric save/load pair with an
    extension-less path dies on FileNotFoundError."""
    import os

    if not path.endswith(".npz") and not os.path.exists(path):
        path = path + ".npz"
    flat = np.load(path)
    step = int(flat["step"])

    params = jax.tree_util.tree_map(lambda x: x, template.params)
    for layer in params:
        for name in params[layer]:
            params[layer][name] = jnp.asarray(flat[f"params/{layer}/{name}"])

    leaves, treedef = jax.tree_util.tree_flatten(template.opt_state)
    new_leaves = [jnp.asarray(flat[f"opt/{i}"]) for i in range(len(leaves))]
    opt_state = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return TrainState(params=params, opt_state=opt_state, tx=template.tx), step
