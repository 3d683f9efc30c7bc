"""Head-to-head: the REFERENCE C++ serving engine vs the TPU blocked engine,
on identical artifacts.

Builds one LIRA index with the lira_tpu pipeline (1M×128 clustered corpus,
trained probing MLP, learning-based redundancy), exports the reference
artifact contract (incl. the TorchScript model), then:

  * runs the reference `search.cpp` engine — compiled from the read-only
    reference sources against pip LibTorch via
    scripts/reference_baseline/build_reference_search.sh — over a threshold
    sweep (serial per-query CPU, its native execution model;
    reference: search.cpp:413-549);
  * runs the lira_tpu blocked engine over the same thresholds on one TPU
    chip, same queries, same index.

Recall and ndis must agree (same index, same probing semantics — MLP
forwards differ only in float rounding); QPS is the measured headline.

Usage: python scripts/head_to_head.py [n] [n_bkt] [n_q] [n_epoch] [regime]
regime 'hard' (default): the calibrated fan-out corpus (nprobe ≈ 10-17 at
recall 0.90-0.95, scripts/hard_regime_calibrate.py); 'easy': the round-2
separable corpus.  Writes logs/head_to_head.json.
"""

import json
import os
import re
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import lira_tpu

lira_tpu.enable_compilation_cache()

from lira_tpu.config import Config
from lira_tpu.engine.serve import QueryEngine
from lira_tpu.io.artifacts import save_index_artifacts
from lira_tpu.io.datasets import DatasetBundle
from lira_tpu.io.xvecs import write_xvecs
from lira_tpu.ops.knn import exact_knn
from lira_tpu.pipelines.smallscale import run_smallscale

WORK = "/tmp/h2h"
REF_BIN = "/tmp/refbuild/search_ref"


def parse_ref_output(text: str) -> list[dict]:
    rows = []
    cur = {}
    keys = {
        "Threshold": "threshold", "avg_recall": "avg_recall",
        "avg_nprobe": "avg_nprobe", "avg_cmp": "avg_cmp", "QPS": "qps",
    }
    for line in text.splitlines():
        m = re.match(r"\s*(\w+)\s*(?:\(q\))?\s*:\s*([\d.eE+-]+)", line)
        if not m:
            continue
        k, v = m.group(1), m.group(2)
        if k in keys:
            cur[keys[k]] = float(v)
            if k == "QPS":
                rows.append(cur)
                cur = {}
    return rows


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_bkt = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    n_q = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    n_epoch = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    d, k = 128, 10

    if not os.path.exists(REF_BIN):
        raise SystemExit(
            f"{REF_BIN} missing — run scripts/reference_baseline/build_reference_search.sh"
        )

    from lira_tpu.io.datasets import synthetic_dataset

    regime = sys.argv[5] if len(sys.argv) > 5 else "hard"
    if regime == "hard":
        # the calibrated fan-out regime — ONE definition shared with
        # bench.py and every comparison script (io/datasets.HARD_REGIME)
        from lira_tpu.io.datasets import HARD_REGIME

        gen = dict(HARD_REGIME)
    else:
        gen = dict(n_clusters=n_bkt, center_scale=30.0, noise_scale=14.0,
                   query_noise=10.0, seed=43)
    bsyn = synthetic_dataset(n_base=n, n_query=n_q, dim=d, k_gt=k,
                             compute_gt=False, name="h2h", **gen)
    x_d, x_q = bsyn.base, bsyn.query
    _, gt = exact_knn(x_d, x_q, k)
    print("dataset + gt ready", flush=True)

    bundle = DatasetBundle(name="h2h", base=x_d, query=x_q, groundtruth=gt)
    cfg = Config(dataset="h2h", data_path=os.path.join(WORK, "data"), k=k,
                 n_bkt=n_bkt, n_epoch=n_epoch).update()
    cfg.pth_log = None
    res = run_smallscale(cfg, bundle=bundle, serve_sweep=False, use_cache=False)
    print("pipeline trained", flush=True)

    # export the full artifact contract (incl. TorchScript model)
    art_dir = os.path.join(WORK, "artifacts")
    prefix = save_index_artifacts(
        art_dir, cfg.file_name,
        centroids=res["kmeans"].centroids, data_2_bkt=res["data_2_bkt"],
        x_d=x_d, scaler=res["scaler"], params=res["state"].params,
        metric="L2",
    )
    ds_dir = os.path.join(WORK, "data", "h2h")
    os.makedirs(ds_dir, exist_ok=True)
    write_xvecs(os.path.join(ds_dir, "h2h_query.fvecs"), x_q)
    write_xvecs(os.path.join(ds_dir, "h2h_groundtruth.ivecs"), gt)
    print(f"artifacts exported under {prefix}", flush=True)

    t_min, t_max, t_step = 0.05, 0.80, 0.15
    cmd = [
        REF_BIN, "--dataset", "h2h", "--data_path", os.path.join(WORK, "data"),
        "--artifacts_dir", art_dir, "--prefix", cfg.file_name, "--k", str(k),
        "--metric", "L2", "--num_threads", "32",
        "--t_min", str(t_min), "--t_max", str(t_max), "--t_step", str(t_step),
    ]
    print("running reference engine:", " ".join(cmd), flush=True)
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=7200)
    if proc.returncode != 0:
        print(proc.stdout[-3000:])
        print(proc.stderr[-3000:])
        raise SystemExit("reference engine failed")
    ref_rows = parse_ref_output(proc.stdout)
    print(f"reference engine done ({time.time() - t0:.1f}s)", flush=True)
    for r in ref_rows:
        print(f"[ref-cpu ] thr={r['threshold']:.2f} recall={r['avg_recall']:.4f} "
              f"nprobe={r['avg_nprobe']:.1f} ndis={r['avg_cmp']:.0f} QPS={r['qps']:.0f}",
              flush=True)

    eng = QueryEngine(
        x_d, res["layout"], res["kmeans"].centroids, res["scaler"],
        res["state"].params, n_mul=cfg.n_mul, scan_impl="blocked",
    )
    # include t_max: the reference loop is `thr <= t_max + 1e-6`
    # (search.cpp:413) — both engines must run the SAME thresholds
    thresholds = np.arange(t_min, t_max + t_step / 2, t_step)
    ours = eng.sweep(x_q, gt, k, thresholds)
    for r in ours:
        print(f"[tpu-blk ] thr={r['threshold']:.2f} recall={r['avg_recall']:.4f} "
              f"nprobe={r['avg_nprobe']:.1f} ndis={r['avg_cmp']:.0f} QPS={r['qps']:.0f}",
              flush=True)

    # large-batch throughput at the middle threshold (tiled query stream)
    reps = max(1, 65536 // n_q)
    big_q = np.tile(x_q, (reps, 1))
    thr_mid = float(thresholds[len(thresholds) // 2])
    eng.search(big_q, thr_mid, k)  # warmup at shape
    t0 = time.time()
    r_big = eng.search(big_q, thr_mid, k)
    big_qps = len(big_q) / (time.time() - t0)
    print(f"[tpu-blk ] thr={thr_mid:.2f} batch={len(big_q)}: {big_qps:.0f} QPS", flush=True)

    out = {
        "n": n, "n_bkt": n_bkt, "n_q": n_q, "k": k,
        "reference_cpu": ref_rows,
        "tpu_blocked": ours,
        "tpu_blocked_big_batch": {"threshold": thr_mid, "batch": len(big_q), "qps": big_qps},
    }
    os.makedirs("logs", exist_ok=True)
    with open("logs/head_to_head.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote logs/head_to_head.json", flush=True)


if __name__ == "__main__":
    main()
