"""Phase profile of the capacity serving mode (store_f32=False).

Round 3 measured the capacity mode at 1.2k-11k QPS on 1M x 128 vs 72k for
the normal bf16 engine, with time DECREASING as nprobe grows
(logs/tpu_serve_bench_stream.log) — a pattern no single phase obviously
explains.  This script splits one batch's cost into:

  - the blocked-scan device phases (LIRA_BLOCKED_TIMING=1 marks:
    q_upload / probe+union sync / host unions / scan+result sync), and
  - the host f32 re-rank (timed separately on the returned ids),

for the capacity engine and the normal bf16 engine side by side at three
operating points, so the slow phase is attributed by measurement instead
of guesswork.  Run AFTER the r3 fixes (chunked screen, f32 matmul
re-rank) to see what remains.

Usage: python scripts/capacity_profile.py [n_base] [batch]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import lira_tpu

lira_tpu.enable_compilation_cache()

import jax

try:
    jax.devices()
except RuntimeError as exc:
    print(f"device not ready: {exc}", flush=True)
    raise SystemExit(42)

import jax.numpy as jnp

from lira_tpu.engine.serve import QueryEngine, rerank_exact_host
from lira_tpu.labels.scaler import StandardScaler
from lira_tpu.models.probing_mlp import init_params
from lira_tpu.ops.distance import l2_to_centroids
from lira_tpu.partition.assign import build_bucket_layout
from lira_tpu.partition.kmeans import kmeans_assign, kmeans_fit


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    n_bkt, d = 1024, 128

    rng = np.random.default_rng(43)
    centers = rng.standard_normal((n_bkt, d), dtype=np.float32) * 30.0
    assign_c = rng.integers(0, n_bkt, size=n)
    x_d = centers[assign_c] + rng.standard_normal((n, d), dtype=np.float32) * 14.0
    x_q = x_d[rng.integers(0, n, size=batch)] + rng.standard_normal(
        (batch, d), dtype=np.float32
    ) * 10.0

    from lira_tpu.ops.knn import exact_knn

    n_oracle = min(512, batch)
    gt_sc, gt_ids = exact_knn(x_d, x_q[:n_oracle], 10)

    from lira_tpu.engine.ivf_baseline import ivf_probe_matrix

    km = kmeans_fit(x_d, n_bkt, niter=10, seed=43)
    layout = build_bucket_layout(kmeans_assign(x_d, km.centroids), n_bkt)
    raw = np.empty((100_000, n_bkt), np.float32)
    cj = jnp.asarray(km.centroids)
    for s in range(0, len(raw), 16384):
        e = min(s + 16384, len(raw))
        raw[s:e] = np.asarray(l2_to_centroids(jnp.asarray(x_d[s:e]), cj))
    scaler = StandardScaler().fit(raw)
    params = init_params(jax.random.PRNGKey(0), n_bkt, d)
    print("index ready", flush=True)

    engines = [
        ("bf16", dict(scan_dtype="bfloat16")),
        ("bf16-cap", dict(scan_dtype="bfloat16", store_f32=False)),
        ("int8-cap", dict(scan_dtype="int8", store_f32=False)),
    ]
    # IVF-style prober (probe the M nearest centroids): every engine probes
    # the SAME buckets — so equal recall pins that the capacity re-rank
    # loses nothing — and, unlike the untrained-MLP prober of the first
    # profile run (logs/capacity_profile_r4.log: recall ~= nprobe/n_bkt by
    # construction), the absolute recall column is meaningful.
    prober = lambda q: ivf_probe_matrix(q, np.asarray(km.centroids))  # noqa: E731
    for name, kw in engines:
        eng = QueryEngine(x_d, layout, km.centroids, scaler, params,
                          probe_cap=128, block_q=1024, scan_impl="blocked",
                          prober=prober, **kw)
        outputs = eng.probe(x_q[:512])
        for target_nprobe in (8, 32, 96):
            thr = float(np.quantile(outputs, 1.0 - target_nprobe / n_bkt))
            eng.search(x_q, thr, 10)  # warmup at the measured shape
            os.environ["LIRA_BLOCKED_TIMING"] = "1"
            t0 = time.perf_counter()
            r = eng.search(x_q, thr, 10)
            total = time.perf_counter() - t0
            os.environ.pop("LIRA_BLOCKED_TIMING", None)
            # host re-rank share, re-measured on the same candidates
            t0 = time.perf_counter()
            if not eng.store_f32:
                # r.ids unmodified: rerank_exact_host masks ids < 0 itself
                # (clamping here would score -1 pad slots as id 0)
                eng._rerank_f32(x_q, r.ids, r.scores)
            rr = time.perf_counter() - t0
            rec = (r.ids[:n_oracle, :, None] == gt_ids[:, None, :]).any(1).mean()
            print(
                f"[{name}] nprobe~{r.nprobe.mean():.1f} ndis={r.ndis.mean():.0f}"
                f" total={total:.3f}s rerank~{rr:.3f}s qps={batch / total:.0f}"
                f" recall@10={rec:.4f}",
                flush=True,
            )
        del eng


if __name__ == "__main__":
    main()
