"""Multi-chip query serving: corpus sharded over the mesh, top-k merged over ICI.

Buckets are distributed across devices with a greedy balanced partition
(largest bucket → least-loaded device).  Queries are replicated; each
device scans only its local probed tiles; per-device top-k results are
all_gather'ed over the mesh axis (k is tiny — one (n_dev, B, k) gather) and
re-merged.  This is the scaling axis the reference lacks entirely
(SURVEY.md §2.4: OpenMP-only) and the BIGANN-100M configuration of
BASELINE.json.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..labels.scaler import StandardScaler
from ..engine.serve import SearchResult, _dedup_topk, _probe
from ..partition.assign import BucketLayout


def balanced_bucket_split(padded_sizes: np.ndarray, n_dev: int) -> list[np.ndarray]:
    """Greedy balanced assignment of buckets to devices by padded size."""
    order = np.argsort(-padded_sizes, kind="stable")
    loads = np.zeros(n_dev, dtype=np.int64)
    groups: list[list[int]] = [[] for _ in range(n_dev)]
    for b in order:
        d = int(np.argmin(loads))
        groups[d].append(int(b))
        loads[d] += int(padded_sizes[b])
    return [np.array(sorted(g), dtype=np.int64) for g in groups]


def _local_scan(q, tile_idx, corpus, corpus_ids, corpus_sq, k: int, metric: str, axis: str):
    """Per-device scan + cross-device merge; runs inside shard_map."""
    # leading device axis of the stacked inputs is squeezed inside the shard
    tile_idx, corpus = tile_idx[0], corpus[0]
    corpus_ids, corpus_sq = corpus_ids[0], corpus_sq[0]
    B, T = tile_idx.shape

    def step(carry, t):
        best_neg, best_id = carry
        idx = tile_idx[:, t]
        safe = jnp.maximum(idx, 0)
        vec = corpus[safe]
        ids = corpus_ids[safe]
        dot = jnp.einsum("bd,brd->br", q, vec, precision="highest", preferred_element_type=jnp.float32)
        score = -dot if metric == "inner_product" else corpus_sq[safe] - 2.0 * dot
        dead = (idx[:, None] < 0) | (ids < 0)
        neg = jnp.where(dead, -jnp.inf, -score)
        m_neg = jnp.concatenate([best_neg, neg], axis=1)
        m_id = jnp.concatenate([best_id, ids], axis=1)
        new_neg, sel = jax.lax.top_k(m_neg, k)
        return (new_neg, jnp.take_along_axis(m_id, sel, axis=1)), None

    init = (jnp.full((B, k), -jnp.inf, jnp.float32), jnp.full((B, k), -1, jnp.int32))
    (neg, ids), _ = jax.lax.scan(step, init, jnp.arange(T))

    # ICI merge: gather every shard's top-k and re-rank
    all_neg = jax.lax.all_gather(neg, axis)  # (n_dev, B, k)
    all_ids = jax.lax.all_gather(ids, axis)
    n_dev = all_neg.shape[0]
    flat_neg = jnp.moveaxis(all_neg, 0, 1).reshape(B, n_dev * k)
    flat_ids = jnp.moveaxis(all_ids, 0, 1).reshape(B, n_dev * k)
    best_neg, sel = jax.lax.top_k(flat_neg, k)
    best_ids = jnp.take_along_axis(flat_ids, sel, axis=1)
    return -best_neg, best_ids


class ShardedQueryEngine:
    """QueryEngine with the bucket corpus sharded across a device mesh."""

    def __init__(
        self,
        x_d: np.ndarray,
        layout: BucketLayout,
        centroids: np.ndarray,
        scaler: StandardScaler,
        params,
        mesh: Mesh,
        metric: str = "L2",
        axis: str = "data",
        n_mul: int = 2,
    ):
        self.mesh = mesh
        self.axis = axis
        self.metric = metric
        self.n_mul = max(1, n_mul)
        self.layout = layout
        self.tile = layout.tile
        n_dev = mesh.devices.size
        x_d = np.asarray(x_d, dtype=np.float32)
        dim = x_d.shape[1]

        groups = balanced_bucket_split(layout.padded_sizes, n_dev)
        self.groups = groups
        tiles_per_bucket = (layout.padded_sizes // self.tile).astype(np.int64)
        tile_start_global = (layout.padded_offsets[:-1] // self.tile).astype(np.int64)

        # per-device local tile tables (padded to the max local tile count)
        local_tiles = [int(tiles_per_bucket[g].sum()) for g in groups]
        t_local = max(max(local_tiles), 1)
        corpus = np.zeros((n_dev, t_local, self.tile, dim), np.float32)
        corpus_ids = np.full((n_dev, t_local, self.tile), -1, np.int32)
        # local tile ranges per bucket, per device
        self.local_tile_start = np.full((n_dev, layout.n_bkt), -1, np.int64)
        padded = layout.gather_vectors(x_d).reshape(-1, self.tile, dim)
        pad_ids = layout.padded_ids.reshape(-1, self.tile)
        for d, g in enumerate(groups):
            pos = 0
            for b in g:
                nt = int(tiles_per_bucket[b])
                if nt == 0:
                    continue
                src = tile_start_global[b]
                corpus[d, pos : pos + nt] = padded[src : src + nt]
                corpus_ids[d, pos : pos + nt] = pad_ids[src : src + nt]
                self.local_tile_start[d, b] = pos
                pos += nt
        sq = (corpus * corpus).sum(axis=-1)
        corpus_sq = np.where(corpus_ids >= 0, sq, np.inf).astype(np.float32)

        shard = NamedSharding(mesh, P(axis))
        self.corpus = jax.device_put(jnp.asarray(corpus), shard)
        self.corpus_ids = jax.device_put(jnp.asarray(corpus_ids), shard)
        self.corpus_sq = jax.device_put(jnp.asarray(corpus_sq), shard)
        self.tiles_per_bucket = tiles_per_bucket
        self.sizes = layout.sizes

        self.centroids = jnp.asarray(centroids, dtype=jnp.float32)
        self.scaler_mean = jnp.asarray(scaler.mean_)
        self.scaler_scale = jnp.asarray(scaler.scale_)
        self.params = params

        self._scan_cache: dict[int, object] = {}

    def _scan_fn(self, k: int):
        if k not in self._scan_cache:
            fn = jax.shard_map(
                partial(_local_scan, k=k, metric=self.metric, axis=self.axis),
                mesh=self.mesh,
                in_specs=(P(), P(self.axis), P(self.axis), P(self.axis), P(self.axis)),
                out_specs=(P(), P()),
                check_vma=False,
            )
            self._scan_cache[k] = jax.jit(fn)
        return self._scan_cache[k]

    def probe(self, queries: np.ndarray) -> np.ndarray:
        return np.asarray(
            _probe(self.params, self.centroids, self.scaler_mean, self.scaler_scale,
                   jnp.asarray(queries, jnp.float32))
        )

    def select_buckets(self, outputs: np.ndarray, threshold: float) -> np.ndarray:
        probed = outputs >= threshold
        empty = ~probed.any(axis=1)
        if empty.any():
            probed[empty, outputs[empty].argmax(axis=1)] = True
        return probed

    def _probe_tiles_local(self, probed: np.ndarray) -> np.ndarray:
        """(n_dev, B, T) per-device local tile lists for each query."""
        n_dev = len(self.groups)
        B = probed.shape[0]
        per_dev = []
        t_max = 1
        for d in range(n_dev):
            rows, bs = np.nonzero(probed[:, :] & (self.local_tile_start[d] >= 0)[None, :])
            reps = self.tiles_per_bucket[bs]
            keep = reps > 0
            rows, bs, reps = rows[keep], bs[keep], reps[keep]
            total = int(reps.sum())
            if total == 0:
                per_dev.append((np.zeros(0, np.int64), np.zeros(0, np.int32)))
                continue
            starts = np.repeat(self.local_tile_start[d, bs], reps)
            cum = np.cumsum(reps) - reps
            within = np.arange(total, dtype=np.int64) - np.repeat(cum, reps)
            tiles_flat = (starts + within).astype(np.int32)
            rows_flat = np.repeat(rows, reps)
            per_dev.append((rows_flat, tiles_flat))
            cnt = np.bincount(rows_flat, minlength=B)
            t_max = max(t_max, int(cnt.max()))
        T = 1 << int(np.ceil(np.log2(t_max)))
        out = np.full((n_dev, B, T), -1, np.int32)
        for d, (rows_flat, tiles_flat) in enumerate(per_dev):
            if len(rows_flat) == 0:
                continue
            cnt = np.bincount(rows_flat, minlength=B)
            start = np.cumsum(cnt) - cnt
            pos = np.arange(len(rows_flat), dtype=np.int64) - start[rows_flat]
            out[d, rows_flat, pos] = tiles_flat
        return out

    def search(self, queries: np.ndarray, threshold: float, k: int) -> SearchResult:
        t0 = time.perf_counter()
        q = jnp.asarray(queries, jnp.float32)
        outputs = self.probe(queries)
        probed = self.select_buckets(outputs, threshold)
        tiles = self._probe_tiles_local(probed)
        shard = NamedSharding(self.mesh, P(self.axis))
        tiles_dev = jax.device_put(jnp.asarray(tiles), shard)
        scores, ids = self._scan_fn(k * self.n_mul)(
            q, tiles_dev, self.corpus, self.corpus_ids, self.corpus_sq
        )
        ids, scores = _dedup_topk(np.asarray(ids), np.asarray(scores), k)
        elapsed = time.perf_counter() - t0
        return SearchResult(
            ids=ids,
            scores=scores,
            nprobe=probed.sum(axis=1),
            ndis=probed @ self.sizes.astype(np.int64),
            elapsed=elapsed,
        )

    def recall_against(self, result_ids: np.ndarray, gt_ids: np.ndarray, k: int) -> np.ndarray:
        hits = (result_ids[:, :, None] == gt_ids[:, None, :k]).any(axis=1)
        return hits.sum(axis=1) / float(k)

    def sweep(self, queries, gt_ids, k, thresholds, warmup: bool = True) -> list[dict]:
        """Measured end-to-end threshold sweep (QueryEngine.sweep parity)."""
        n_q = len(queries)
        if warmup:
            self.search(queries[: min(64, n_q)], float(thresholds[0]), k)
        rows = []
        for thr in thresholds:
            res = self.search(queries, float(thr), k)
            recall = self.recall_against(res.ids, gt_ids, k)
            rows.append(
                {
                    "threshold": float(thr),
                    "avg_recall": float(recall.mean()),
                    "avg_nprobe": float(res.nprobe.mean()),
                    "avg_cmp": float(res.ndis.mean()),
                    "avg_time": res.elapsed / n_q,
                    "qps": n_q / res.elapsed,
                }
            )
        return rows
