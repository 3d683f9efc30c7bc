"""Per-feature standardizer for the centroid-distance features.

Capability parity with the sklearn StandardScaler usage in the reference
(reference: utils.py:120-215): biased (ddof=0) variance, zero-variance
features get scale 1, streaming partial_fit for corpora ≥1M rows, and the
mean/scale vectors persist as `.npy` artifacts consumed by the serving
engine (reference: search.cpp:237-250 reads them back).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.distance import l2_to_centroids


# module-level jits: per-call lambdas would recompile on every
# scaled_centroid_distances invocation (pipelines call it several times)
@partial(jax.jit, donate_argnums=(0,))
def _place(buf, chunk, s):
    return jax.lax.dynamic_update_slice(buf, chunk, (s, 0))


@jax.jit
def _moments(d, shift):
    return jnp.sum(d - shift, axis=0), jnp.sum((d - shift) ** 2, axis=0)


@partial(jax.jit, donate_argnums=(0,))
def _standardize(d, mean, scale):
    return (d - mean) / scale


class StandardScaler:
    """(x - mean) / scale with scale = sqrt(biased var); zero-var → scale 1."""

    def __init__(self):
        self.mean_: np.ndarray | None = None
        self.scale_: np.ndarray | None = None
        self._count = 0
        self._sum: np.ndarray | None = None
        self._sumsq: np.ndarray | None = None

    def partial_fit(self, x: np.ndarray) -> "StandardScaler":
        x = np.asarray(x, dtype=np.float64)
        if self._sum is None:
            self._sum = x.sum(axis=0)
            self._sumsq = (x * x).sum(axis=0)
        else:
            self._sum += x.sum(axis=0)
            self._sumsq += (x * x).sum(axis=0)
        self._count += len(x)
        mean = self._sum / self._count
        var = np.maximum(self._sumsq / self._count - mean * mean, 0.0)
        scale = np.sqrt(var)
        scale[scale < 10 * np.finfo(np.float64).eps] = 1.0
        self.mean_ = mean.astype(np.float32)
        self.scale_ = scale.astype(np.float32)
        return self

    def fit(self, x: np.ndarray) -> "StandardScaler":
        self._count = 0
        self._sum = None
        self._sumsq = None
        return self.partial_fit(x)

    def transform(self, x: np.ndarray) -> np.ndarray:
        if self.mean_ is None:
            raise RuntimeError("Scaler not fitted")
        return ((np.asarray(x, dtype=np.float32) - self.mean_) / self.scale_).astype(np.float32)

    def fit_transform(self, x: np.ndarray) -> np.ndarray:
        return self.fit(x).transform(x)

    def save(self, out_dir: str, prefix: str) -> tuple[str, str]:
        """Persist the artifact contract: {prefix}_scaler_mean.npy / _scaler_scale.npy."""
        os.makedirs(out_dir, exist_ok=True)
        mean_path = os.path.join(out_dir, f"{prefix}_scaler_mean.npy")
        scale_path = os.path.join(out_dir, f"{prefix}_scaler_scale.npy")
        np.save(mean_path, self.mean_.astype(np.float32))
        np.save(scale_path, self.scale_.astype(np.float32))
        return mean_path, scale_path

    @classmethod
    def load(cls, out_dir: str, prefix: str) -> "StandardScaler":
        sc = cls()
        sc.mean_ = np.load(os.path.join(out_dir, f"{prefix}_scaler_mean.npy"))
        sc.scale_ = np.load(os.path.join(out_dir, f"{prefix}_scaler_scale.npy"))
        return sc


def scaled_centroid_distances(
    x_d: np.ndarray,
    x_q: np.ndarray | None,
    centroids: np.ndarray,
    chunk_rows: int = 65536,
    scaler: StandardScaler | None = None,
    device_resident: bool | None = None,
) -> tuple[np.ndarray, np.ndarray | None, StandardScaler]:
    """Sqrt-L2 distances to all centroids, standardized on the data distribution.

    Streams the corpus through the TPU distance kernel in chunks.  On TPU
    (`device_resident` auto-True) the (n, n_bkt) feature matrix stays in HBM
    end to end: scaler moments accumulate on device with a shifted-sum
    formulation (first-chunk mean as the shift, so f32 accumulation loses no
    variance precision) and only two (n_bkt,) vectors leave the chip —
    a 1M×1024 run otherwise pulls and re-pushes ~8 GB through the host.
    Off-TPU returns host arrays (unchanged semantics).
    """
    import jax

    if device_resident is None:
        device_resident = jax.default_backend() == "tpu" and scaler is None
    c = jnp.asarray(centroids, dtype=jnp.float32)
    n = len(x_d)

    if device_resident:
        fit_scaler = scaler is None
        dist_dev = jnp.zeros((n, centroids.shape[0]), jnp.float32)
        shift = None
        s1 = s2 = None
        cnt = 0
        for s in range(0, n, chunk_rows):
            e = min(s + chunk_rows, n)
            d_chunk = l2_to_centroids(jnp.asarray(x_d[s:e]), c)
            if fit_scaler:
                if shift is None:
                    shift = jnp.mean(d_chunk, axis=0)
                    s1 = jnp.zeros_like(shift)
                    s2 = jnp.zeros_like(shift)
                m1, m2 = _moments(d_chunk, shift)
                s1, s2 = s1 + m1, s2 + m2
                cnt += e - s
            dist_dev = _place(dist_dev, d_chunk, jnp.int32(s))
        if fit_scaler:
            sh = np.asarray(shift, np.float64)
            m1 = np.asarray(s1, np.float64) / cnt
            var = np.maximum(np.asarray(s2, np.float64) / cnt - m1 * m1, 0.0)
            scaler = StandardScaler()
            scaler.mean_ = (sh + m1).astype(np.float32)
            scale = np.sqrt(var)
            scale[scale < 1e-12] = 1.0
            scaler.scale_ = scale.astype(np.float32)
            scaler._count = cnt
        # a caller-provided scaler (two-pass / serve-time flows) must be the
        # one that standardizes — refitting here would silently feed the
        # model features on different moments than training
        dist_dev = _standardize(
            dist_dev, jnp.asarray(scaler.mean_), jnp.asarray(scaler.scale_)
        )
        dist_q = None
        if x_q is not None:
            dist_q = scaler.transform(np.asarray(l2_to_centroids(jnp.asarray(x_q), c)))
        return dist_dev, dist_q, scaler

    dist_d = np.empty((n, centroids.shape[0]), dtype=np.float32)
    for s in range(0, n, chunk_rows):
        e = min(s + chunk_rows, n)
        dist_d[s:e] = np.asarray(l2_to_centroids(jnp.asarray(x_d[s:e]), c))

    if scaler is None:
        scaler = StandardScaler()
        for s in range(0, n, chunk_rows):
            scaler.partial_fit(dist_d[s : min(s + chunk_rows, n)])
    for s in range(0, n, chunk_rows):
        e = min(s + chunk_rows, n)
        dist_d[s:e] = scaler.transform(dist_d[s:e])

    dist_q = None
    if x_q is not None:
        dist_q = scaler.transform(np.asarray(l2_to_centroids(jnp.asarray(x_q), c)))
    return dist_d, dist_q, scaler
