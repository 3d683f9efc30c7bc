"""Measured serving sweep at GIST dimensionality (1M×960) on one chip.

The reference's two canonical corpora are sift1m (128d) and gist1m (960d)
(reference run_smallscale_simple.sh:14-15, search.sh:17-22); every repo
measurement so far runs at 128d.  960d changes the hardware balance — the
screen's matmul arithmetic intensity rises 7.5×, HBM bytes per ndis rise
7.5×, and the probing MLP's query branch widens to 960 inputs — so this
runs the full small-scale pipeline on a 1M×960 hard-regime corpus and
measures the blocked engine's recall/nprobe/ndis/QPS sweep.

Usage: python scripts/gist_dim_bench.py [n] [dim] [n_bkt] [n_q] [n_epoch]
Writes logs/gist_dim_sweep.csv.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import lira_tpu

lira_tpu.enable_compilation_cache()

from lira_tpu.config import Config  # noqa: E402
from lira_tpu.engine.serve import QueryEngine  # noqa: E402
from lira_tpu.io.datasets import HARD_REGIME, synthetic_dataset  # noqa: E402
from lira_tpu.ops.knn import exact_knn  # noqa: E402
from lira_tpu.pipelines.smallscale import run_smallscale  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 960
    n_bkt = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    n_q = int(sys.argv[4]) if len(sys.argv) > 4 else 8192
    n_epoch = int(sys.argv[5]) if len(sys.argv) > 5 else 10
    k = 10

    t0 = time.time()
    cache = f"/tmp/gist_corpus_{n}_{dim}_{n_q}.npz"
    if os.path.exists(cache):
        f = np.load(cache)
        x_d, x_q, gt = f["x_d"], f["x_q"], f["gt"]
        print(f"corpus+gt from cache ({time.time() - t0:.1f}s)", flush=True)
        # dummy shell bundle (k_gt=1, n_base tiny: must satisfy k_gt <= n_base);
        # real arrays are swapped in from the cache on the next line
        b = synthetic_dataset(n_base=8, n_query=4, dim=dim, k_gt=1, name="gistbench")
        b.base, b.query, b.groundtruth = x_d, x_q, gt
    else:
        b = synthetic_dataset(
            n_base=n, n_query=n_q, dim=dim, k_gt=k, compute_gt=False,
            name="gistbench", **HARD_REGIME,
        )
        print(f"corpus generated ({time.time() - t0:.1f}s); computing gt", flush=True)
        _, gt = exact_knn(b.base, b.query, k, verbose=True)
        b.groundtruth = gt
        try:
            np.savez(cache + ".tmp.npz", x_d=b.base, x_q=b.query, gt=gt)
            os.replace(cache + ".tmp.npz", cache)
        except OSError:
            pass
        print(f"gt ready ({time.time() - t0:.1f}s)", flush=True)

    # the trained index (not the corpus) is cached so engine-config sweeps
    # can rerun without the ~35-min pipeline: centroids + d2b + scaler +
    # flattened MLP params are ~25 MB next to the 3.8 GB corpus cache
    from lira_tpu.io.artifacts import load_params, save_params
    from lira_tpu.labels.scaler import StandardScaler
    from lira_tpu.partition.assign import build_bucket_layout

    art = f"/tmp/gist_artifacts_{n}_{dim}_{n_bkt}_{n_epoch}"
    if os.path.exists(art + "_index.npz"):
        f = np.load(art + "_index.npz")
        centroids, d2b = f["centroids"], f["d2b"]
        scaler = StandardScaler()
        scaler.mean_, scaler.scale_ = f["mean"], f["scale"]
        params = load_params(art + "_model.npz")
        n_mul = d2b.shape[1]
        layout = build_bucket_layout(d2b, n_bkt)
        print(f"index artifacts from cache ({time.time() - t0:.1f}s)", flush=True)
    else:
        cfg = Config(dataset="gistbench", data_path="/tmp/gistbench", k=k,
                     n_bkt=n_bkt, n_epoch=n_epoch, pth_log=None).update()
        cfg.pth_log = None
        res = run_smallscale(cfg, bundle=b, serve_sweep=False, use_cache=False)
        print(f"pipeline trained ({time.time() - t0:.1f}s)", flush=True)
        centroids = np.asarray(res["kmeans"].centroids)
        d2b = np.asarray(res["data_2_bkt"], np.int32)
        scaler, params = res["scaler"], res["state"].params
        n_mul, layout = cfg.n_mul, res["layout"]
        np.savez(art + "_index.tmp.npz", centroids=centroids, d2b=d2b,
                 mean=scaler.mean_, scale=scaler.scale_)
        os.replace(art + "_index.tmp.npz", art + "_index.npz")
        save_params(params, art + "_model.npz")

    configs = [("bf16", dict(scan_dtype="bfloat16"))]
    for name in sys.argv[6:] or ["int8", "int8-cap"]:
        configs.append((name, {
            "int8": dict(scan_dtype="int8"),
            "int8-cap": dict(scan_dtype="int8", store_f32=False),
            "bf16-cap": dict(scan_dtype="bfloat16", store_f32=False),
        }[name]))
    os.makedirs("logs", exist_ok=True)
    with open("logs/gist_dim_sweep.csv", "w") as f:
        f.write("config,threshold,nprobe,Recall,Computations,QPS\n")
        for cname, kw in configs:
            eng = QueryEngine(b.base, layout, centroids, scaler, params,
                              n_mul=n_mul, scan_impl="blocked", **kw)
            rows = eng.sweep(b.query, b.groundtruth, k,
                             np.arange(0.05, 0.95, 0.05))
            for r in rows:
                print(
                    f"[gist/{cname}] thr={r['threshold']:.2f} "
                    f"recall={r['avg_recall']:.4f} "
                    f"nprobe={r['avg_nprobe']:.1f} ndis={r['avg_cmp']:.0f} "
                    f"QPS={r['qps']:.0f}", flush=True,
                )
                f.write(
                    f"{cname},{r['threshold']},{r['avg_nprobe']},"
                    f"{r['avg_recall']},{r['avg_cmp']},{r['qps']}\n"
                )
            del eng
    print("wrote logs/gist_dim_sweep.csv", flush=True)


if __name__ == "__main__":
    main()
