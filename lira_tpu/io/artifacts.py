"""Index artifact contract: build once, serve many.

The serving contract matches the reference's exporter/loader pair
(reference: index.py:144-192 writes, search.cpp:300-338 reads):

    {prefix}_centroids.npy        (n_bkt, dim) float32
    {prefix}_data_2_bkt.npy       (n, n_mul) int32, −1 = empty slot
    {prefix}_x_d.npy              (n, dim) float32
    {prefix}_redundant_flags.npy  (n,) uint8
    {prefix}_scaler_mean.npy      (n_bkt,) float32   (written by StandardScaler.save)
    {prefix}_scaler_scale.npy     (n_bkt,) float32
    {prefix}_model.npz            probing-MLP parameter pytree (replaces the
                                  reference's TorchScript *_mlp_2_input.pt)
    {prefix}_manifest.json        metric / shapes / version provenance
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from ..labels.scaler import StandardScaler


def save_params(params, path: str) -> None:
    """Flatten the parameter pytree into an .npz archive."""
    flat = {f"{layer}/{name}": np.asarray(v) for layer, sub in params.items() for name, v in sub.items()}
    np.savez(path, **flat)


def load_params(path: str):
    flat = np.load(path)
    params: dict = {}
    for key in flat.files:
        layer, name = key.split("/")
        params.setdefault(layer, {})[name] = jnp.asarray(flat[key])
    return params


def save_index_artifacts(
    out_dir: str,
    prefix: str,
    *,
    centroids: np.ndarray,
    data_2_bkt: np.ndarray,
    x_d: np.ndarray,
    scaler: StandardScaler,
    params,
    metric: str = "L2",
    extra_meta: dict | None = None,
) -> str:
    os.makedirs(out_dir, exist_ok=True)
    p = os.path.join(out_dir, prefix)
    np.save(p + "_centroids.npy", np.asarray(centroids, dtype=np.float32))
    np.save(p + "_data_2_bkt.npy", np.asarray(data_2_bkt, dtype=np.int32))
    np.save(p + "_x_d.npy", np.asarray(x_d, dtype=np.float32))
    d2b = np.asarray(data_2_bkt)
    redundant = (d2b[:, 1:] != -1).any(axis=1).astype(np.uint8) if d2b.ndim == 2 and d2b.shape[1] > 1 else np.zeros(len(d2b), np.uint8)
    np.save(p + "_redundant_flags.npy", redundant)
    scaler.save(out_dir, prefix)
    save_params(params, p + "_model.npz")
    try:
        # reference-engine interop: also emit the TorchScript model the
        # reference serving binary loads (search.cpp:333-338); skipped when
        # torch is unavailable
        from .torch_export import export_torchscript_mlp

        export_torchscript_mlp(params, p + "_mlp_2_input.pt")
    except ImportError:
        pass
    manifest = {
        "format_version": 1,
        "metric": metric,
        "n": int(x_d.shape[0]),
        "dim": int(x_d.shape[1]),
        "n_bkt": int(centroids.shape[0]),
        "n_mul": int(d2b.shape[1]) if d2b.ndim == 2 else 1,
    }
    manifest.update(extra_meta or {})
    with open(p + "_manifest.json", "w") as f:
        json.dump(manifest, f, indent=2)
    return p


def load_index_artifacts(out_dir: str, prefix: str) -> dict:
    p = os.path.join(out_dir, prefix)
    with open(p + "_manifest.json") as f:
        manifest = json.load(f)
    return {
        "centroids": np.load(p + "_centroids.npy"),
        "data_2_bkt": np.load(p + "_data_2_bkt.npy"),
        "x_d": np.load(p + "_x_d.npy"),
        "redundant_flags": np.load(p + "_redundant_flags.npy"),
        "scaler": StandardScaler.load(out_dir, prefix),
        "params": load_params(p + "_model.npz"),
        "manifest": manifest,
    }
