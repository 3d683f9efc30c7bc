"""Exact in-partition scan: per-(query, bucket) top-k for every bucket.

The evaluation harness behind the recall/ndis curves.  The reference does
this with a serial (bucket × query) Faiss loop (reference:
LIRA_smallscale.py:145-174); here buckets are grouped into size classes
(equal padded row counts), each class is one batched einsum on the MXU —
(Q, d) × (C, S, d) → (Q, C, S) — followed by a per-bucket top-k.  The whole
corpus is scanned once for all queries; every threshold's metrics are then
pure masking (see sweep.py).

Ties break toward the lower member id (bucket member lists are sorted
ascending).  Buckets smaller than k yield −1 padding ids, like an
undersized Faiss result.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..partition.assign import BucketLayout


@dataclass
class BucketCorpus:
    """Bucket vectors grouped by padded-size class, device-resident."""

    classes: list[dict]  # per class: {size, buckets (C,), vecs (C,S,d), ids (C,S)}
    n_bkt: int
    dim: int

    @classmethod
    def build(cls, x_d: np.ndarray, layout: BucketLayout) -> "BucketCorpus":
        x_d = np.asarray(x_d, dtype=np.float32)
        psizes = layout.padded_sizes
        classes = []
        for size in np.unique(psizes):
            if size == 0:
                continue
            buckets = np.where(psizes == size)[0]
            ids = np.empty((len(buckets), size), dtype=np.int32)
            for i, b in enumerate(buckets):
                ids[i] = layout.padded_ids[layout.padded_offsets[b] : layout.padded_offsets[b + 1]]
            vecs = np.zeros((len(buckets), size, x_d.shape[1]), dtype=np.float32)
            valid = ids >= 0
            vecs[valid] = x_d[ids[valid]]
            classes.append(
                {
                    "size": int(size),
                    "buckets": buckets,
                    "vecs": jnp.asarray(vecs),
                    "ids": jnp.asarray(ids),
                }
            )
        return cls(classes=classes, n_bkt=layout.n_bkt, dim=x_d.shape[1])


@partial(jax.jit, static_argnames=("k", "metric"))
def _class_topk(q: jax.Array, vecs: jax.Array, ids: jax.Array, k: int, metric: str):
    """(Q, d) × (C, S, d) → per-bucket top-k scores and global ids."""
    dot = jnp.einsum("qd,csd->qcs", q, vecs, precision="highest", preferred_element_type=jnp.float32)
    invalid = ids < 0  # (C, S)
    if metric == "inner_product":
        score = -dot
    else:
        v_sq = jnp.sum(vecs * vecs, axis=-1)  # (C, S)
        score = v_sq[None] - 2.0 * dot
    score = jnp.where(invalid[None], jnp.inf, score)
    kk = min(k, score.shape[-1])
    neg, local = jax.lax.top_k(-score, kk)  # (Q, C, kk)
    gid = jnp.take_along_axis(jnp.broadcast_to(ids[None], score.shape), local, axis=-1)
    gid = jnp.where(jnp.isfinite(neg), gid, -1)
    if kk < k:
        pad = ((0, 0), (0, 0), (0, k - kk))
        neg = jnp.pad(neg, pad, constant_values=-jnp.inf)
        gid = jnp.pad(gid, pad, constant_values=-1)
    return -neg, gid


def bucket_topk(
    x_q: np.ndarray,
    corpus: BucketCorpus,
    k: int,
    metric: str = "L2",
    q_chunk: int = 512,
    score_budget: int = 1 << 27,
) -> np.ndarray:
    """(n_q, n_bkt, k) int32 — top-k member ids of every bucket for every query.

    −1 marks missing results (bucket smaller than k / empty bucket).
    """
    x_q = np.asarray(x_q, dtype=np.float32)
    n_q = len(x_q)
    found = np.full((n_q, corpus.n_bkt, k), -1, dtype=np.int32)
    for cl in corpus.classes:
        c, s = cl["vecs"].shape[0], cl["size"]
        # keep the (Q, C, S) score tensor under the budget
        qc = max(8, min(q_chunk, score_budget // max(c * s, 1)))
        for start in range(0, n_q, qc):
            end = min(start + qc, n_q)
            _, gid = _class_topk(jnp.asarray(x_q[start:end]), cl["vecs"], cl["ids"], k, metric)
            found[start:end, cl["buckets"]] = np.asarray(gid)
    return found
