"""Measured disk-bvecs → index → serve, end to end (BIGANN-style u8 data).

The reference's 10M grids include bigann bvecs (reference
compute_knn.cpp:113-140 reads uint8 bvecs; index_batch.sh:27-36 runs
bigann10m).  Round 3 had the readers, the native widener and streaming
ingest unit-tested but no measured pipeline run from DISK bvecs.  This
script closes that: it writes a BIGANN-style uint8 corpus to disk in the
reference's directory layout, then drives the REAL CLIs against it —
nothing is handed over in memory:

  1. {data}/bigann{N}m/bigann{N}m_base.bvecs   (u8, hard-regime derived)
     + _query.fvecs + _groundtruth.ivecs (exact, computed on-chip)
  2. `compute_knn_cli --streaming` — the offline self-kNN tool (N1) reads
     the bvecs from disk in chunks and writes the .bin+.meta cache
  3. `pipelines.largescale` — subset training + full redundancy from the
     loaded dataset (the reference's 10M recipe)
  4. `search_cli --scan_dtype int8` — the serving sweep on the exported
     artifacts (recall / nprobe / ndis / QPS vs the disk groundtruth)

Usage: python scripts/bvecs_e2e_demo.py [n] [n_bkt] [n_q] [n_epoch] [data_dir]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import lira_tpu

lira_tpu.enable_compilation_cache()

from lira_tpu.io.datasets import HARD_REGIME, synthetic_dataset  # noqa: E402
from lira_tpu.io.xvecs import write_xvecs  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_bkt = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    n_q = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    n_epoch = int(sys.argv[4]) if len(sys.argv) > 4 else 40
    data_dir = sys.argv[5] if len(sys.argv) > 5 else "/tmp/bvecs_demo"
    d, k = 128, 10
    name = f"bigann{n // 1_000_000}m"
    ddir = os.path.join(data_dir, name)
    os.makedirs(ddir, exist_ok=True)

    # ---- 1. write the u8 dataset in the reference layout ----
    base_path = os.path.join(ddir, f"{name}_base.bvecs")
    query_path = os.path.join(ddir, f"{name}_query.fvecs")
    gt_path = os.path.join(ddir, f"{name}_groundtruth.ivecs")
    if not (os.path.exists(base_path) and os.path.exists(query_path)
            and os.path.exists(gt_path)):
        t0 = time.time()
        b = synthetic_dataset(
            n_base=n, n_query=n_q, dim=d, k_gt=k, compute_gt=False,
            name=name, **HARD_REGIME,
        )
        # BIGANN-style u8: affine-map the hard-regime floats into [0, 255]
        # (SIFT descriptors are u8 counts); the SERVED corpus is the
        # quantized one, so GT is computed against the widened u8 values
        lo, hi = np.percentile(b.base, [0.1, 99.9])
        scale = 255.0 / max(hi - lo, 1e-9)
        to_u8 = lambda x: np.clip(np.round((x - lo) * scale), 0, 255).astype(np.uint8)  # noqa: E731
        base_u8 = to_u8(b.base)
        query_f = to_u8(b.query).astype(np.float32)  # queries quantized alike
        print(f"[gen] {n:,}x{d} u8 corpus derived ({time.time() - t0:.1f}s)",
              flush=True)

        t0 = time.time()
        from lira_tpu.ops.knn import exact_knn_stream

        # exact_knn widens each u8 chunk through its own f32 upload path
        _, gt = exact_knn_stream(base_u8, query_f, k, base_chunk=2_097_152)
        print(f"[gt] exact {k}-NN on-chip ({time.time() - t0:.1f}s)", flush=True)

        t0 = time.time()
        write_xvecs(base_path, base_u8)
        write_xvecs(query_path, query_f)
        write_xvecs(gt_path, gt.astype(np.int32))
        print(f"[disk] wrote {base_path} "
              f"({os.path.getsize(base_path) / 2**30:.2f} GB) + query + gt "
              f"({time.time() - t0:.1f}s)", flush=True)
        del b, base_u8
    else:
        print(f"[disk] dataset already present under {ddir}", flush=True)

    # ---- 2. offline self-kNN tool from DISK (streamed bvecs ingest) ----
    t0 = time.time()
    from lira_tpu.pipelines.compute_knn_cli import main as knn_main

    knn_main([name, data_dir, str(k), "0", "--streaming"])
    print(f"[knn-tool] streamed disk self-kNN ({time.time() - t0:.1f}s)",
          flush=True)

    # ---- 3. large-scale pipeline on the loaded dataset ----
    t0 = time.time()
    from lira_tpu.config import Config
    from lira_tpu.pipelines.largescale import run_largescale

    cfg = Config(dataset=name, data_path=data_dir, k=k, n_bkt=n_bkt,
                 n_epoch=n_epoch, batch_size=512, lr=1e-3,
                 t_min=0.05, t_max=0.9, t_step=0.1).update()
    cfg.pth_log = os.path.join(data_dir, "logs") + "/"
    os.makedirs(cfg.pth_log, exist_ok=True)
    res = run_largescale(cfg, use_cache=True)
    print(f"[pipeline] large-scale build from disk ({time.time() - t0:.1f}s)",
          flush=True)

    # ---- 4. measured serving sweep on the final layout ----
    import jax.numpy as jnp  # noqa: F401

    from lira_tpu.engine.serve import QueryEngine
    from lira_tpu.io.datasets import load_data

    bundle = load_data(name, data_path=data_dir)
    eng = QueryEngine(
        bundle.base, res["layout"], res["kmeans"].centroids, res["scaler"],
        res["state"].params, n_mul=cfg.n_mul, scan_impl="blocked",
        probe_cap=256, scan_dtype="int8",
    )
    outputs = eng.probe(bundle.query[:512])
    gt = bundle.groundtruth
    for target_nprobe in (8, 16, 32, 64):
        if target_nprobe >= n_bkt:
            break
        thr = float(np.quantile(outputs, 1.0 - target_nprobe / n_bkt))
        eng.search(bundle.query, thr, k)  # warmup
        t0 = time.time()
        r = eng.search(bundle.query, thr, k)
        dt = time.time() - t0
        recall = (r.ids[:, :, None] == gt[:, None, :k]).any(axis=1).mean()
        print(f"[serve] nprobe~{r.nprobe.mean():.1f} ndis={r.ndis.mean():.0f} "
              f"({100 * r.ndis.mean() / n:.3f}% corpus) recall@{k}={recall:.4f} "
              f"QPS={len(bundle.query) / dt:.0f}", flush=True)


if __name__ == "__main__":
    main()
