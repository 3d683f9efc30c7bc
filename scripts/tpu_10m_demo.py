"""10M×128 single-chip demonstration: large-scale pipeline + measured serving.

The reference treats 10M-row datasets as routine (reference:
run_batch_smallscale.sh:12-30, index_batch.sh:15-36, LIRA_largescale.py);
this runs the TPU large-scale pipeline end-to-end at that scale on one chip
— subset training, full-corpus assignment, full learning-based redundancy,
analytic sweeps — then a measured blocked-scan serving sweep on the final
layout.  Prints wall times per stage and the recall-vs-ndis curve.

Usage: python scripts/tpu_10m_demo.py [n] [n_bkt] [n_q] [n_epoch] [regime]
regime 'hard' (default): the calibrated low-intrinsic-dim fan-out corpus
(scripts/hard_regime_calibrate.py — recall 0.95 needs nprobe >> 1, the
reference's sift/gist regime); 'easy': separable clusters (saturates at
nprobe ~1, the round-2 demo corpus).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import lira_tpu

lira_tpu.enable_compilation_cache()

import jax

from lira_tpu.config import Config
from lira_tpu.engine.serve import QueryEngine
from lira_tpu.io.datasets import DatasetBundle
from lira_tpu.ops.knn import exact_knn
from lira_tpu.pipelines.largescale import run_largescale


def gen_clustered(n, d, n_centers, rng, scale=30.0, noise=14.0, batch=2_000_000):
    centers = rng.standard_normal((n_centers, d), dtype=np.float32) * scale
    x = np.empty((n, d), np.float32)
    for s in range(0, n, batch):
        e = min(s + batch, n)
        x[s:e] = centers[rng.integers(0, n_centers, size=e - s)]
        x[s:e] += rng.standard_normal((e - s, d), dtype=np.float32) * noise
    return x


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_bkt = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    n_q = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    n_epoch = int(sys.argv[4]) if len(sys.argv) > 4 else 40
    regime = sys.argv[5] if len(sys.argv) > 5 else "hard"
    # serving screen dtype: float32 | bfloat16 | int8 | capacity
    # (f32 fits one chip at 10M since the shared-table aliasing +
    # in-kernel-norms fixes: table 9.3 GB + ~2.2 GB temps < 15.75 GB)
    mode = sys.argv[6] if len(sys.argv) > 6 else "float32"
    d, k = 128, 10

    rng = np.random.default_rng(43)
    t0 = time.time()
    # host-side Gaussian gen at 10M×128 costs ~45 min on this rig's single
    # (slow) vCPU — cache corpus+queries+gt across runs, keyed by the shape
    cache = f"/tmp/syn10m_corpus_{regime}_{n}_{d}_{n_q}.npz"
    gt_cache = f"/tmp/syn10m_gt_{regime}_{n}_{d}_{n_q}_{k}.npy"
    # generator parameters: stored in the corpus cache and as sidecars on
    # the gt/pipeline caches, verified on load — a retune must regenerate
    # ALL of them, never pair a fresh corpus with the old distribution's
    # ground truth or trained state (legacy caches without the field were
    # written with exactly these values).  The easy regime's generator is
    # parameterized by n_bkt, so its signature carries it.
    if regime == "hard":
        from lira_tpu.io.datasets import hard_regime_sig

        gen_sig = hard_regime_sig()
    else:
        gen_sig = f"easy_nbkt={n_bkt}"
    from lira_tpu.io.datasets import check_sig_sidecar, write_sig_sidecar

    # signatures these params were previously stored under (identical
    # distributions — do not throw away a 45-min 10M corpus over a rename)
    legacy_sigs = {"nc64_s43_id16_cs1.0_ns1.0_qn0.35_an0.02"} if regime == "hard" else {"easy"}
    x_d = None
    if os.path.exists(cache):
        f = np.load(cache)
        if "gen_sig" in f and str(f["gen_sig"]) not in {gen_sig} | legacy_sigs:
            print(f"[gen] cache {cache} is for gen_sig={f['gen_sig']}, "
                  f"want {gen_sig} — regenerating", flush=True)
        else:
            x_d, x_q = f["x_d"], f["x_q"]
            print(f"[gen] corpus from cache {cache} ({time.time() - t0:.1f}s)", flush=True)
    corpus_fresh = x_d is None
    if x_d is None:
        if regime == "hard":
            from lira_tpu.io.datasets import HARD_REGIME, synthetic_dataset

            b = synthetic_dataset(
                n_base=n, n_query=n_q, dim=d, k_gt=k, compute_gt=False,
                name=f"syn{n // 1_000_000}m-hard", **HARD_REGIME,
            )
            x_d, x_q = b.base, b.query
        else:
            x_d = gen_clustered(n, d, n_bkt, rng)
            x_q = x_d[rng.integers(0, n, size=n_q)] + rng.standard_normal(
                (n_q, d), dtype=np.float32
            ) * 10.0
        print(f"[gen] {n:,}×{d} corpus + {n_q} queries, regime={regime} "
              f"({time.time() - t0:.1f}s)", flush=True)
        try:
            # save BEFORE the gt pass: a TPU failure there must not cost the
            # ~25-45 min of host RNG again.  tmp+rename: a kill mid-save (the
            # rig's 3 h ceiling) must not leave a truncated .npz that every
            # later run crashes loading.
            np.savez(cache + ".tmp.npz", x_d=x_d, x_q=x_q, gen_sig=gen_sig)
            os.replace(cache + ".tmp.npz", cache)
        except OSError:
            pass  # disk-full: run uncached

    # a gt cache is only valid for the corpus we actually hold: if the
    # corpus was regenerated this run (cache miss OR signature mismatch)
    # the old gt describes a different distribution
    if (not corpus_fresh and os.path.exists(gt_cache)
            and check_sig_sidecar(gt_cache, gen_sig)):
        gt = np.load(gt_cache)
        print(f"[gt] from cache {gt_cache}", flush=True)
    else:
        t0 = time.time()
        _, gt = exact_knn(x_d, x_q, k)
        print(f"[gt] exact {k}-NN of {n_q} queries vs {n:,} rows ({time.time() - t0:.1f}s)",
              flush=True)
        try:
            np.save(gt_cache + ".tmp.npy", gt)
            os.replace(gt_cache + ".tmp.npy", gt_cache)
            write_sig_sidecar(gt_cache, gen_sig)
        except OSError:
            pass

    bundle = DatasetBundle(name=f"syn{n // 1_000_000}m", base=x_d, query=x_q, groundtruth=gt)
    # lr 1e-3: in the 1%-subset / 2048-bucket regime the reference's 1e-4
    # needs ~60 epochs to exit the all-negative basin; 1e-3 reaches hit-rate
    # 0.92 by epoch 40 (scripts/train_scale_probe.py measurements)
    t_min = 0.05 if regime == "hard" else 0.1
    cfg = Config(dataset=bundle.name, data_path="/tmp/syn10m", k=k, n_bkt=n_bkt,
                 n_epoch=n_epoch, batch_size=512, lr=1e-3, t_min=t_min, t_max=0.9,
                 t_step=0.1).update()
    cfg.pth_log = None

    # cache the pipeline's serving inputs so a killed run's serving sweep is
    # repeatable without the ~80-min pipeline (this rig's 3 h ceiling bit once)
    pcache = f"/tmp/syn10m_pipeline_{regime}_{n}_{n_bkt}_{n_epoch}.npz"
    if corpus_fresh and os.path.exists(pcache):
        # trained state from a previous corpus must not serve a fresh one
        os.remove(pcache)
    if os.path.exists(pcache) and not check_sig_sidecar(pcache, gen_sig):
        print(f"[pipeline] cache {pcache} is for different generator params "
              "— rebuilding", flush=True)
        os.remove(pcache)
    if os.path.exists(pcache):
        import pickle

        from lira_tpu.labels.scaler import StandardScaler
        from lira_tpu.partition.assign import build_bucket_layout

        f = np.load(pcache, allow_pickle=False)
        t0 = time.time()
        layout = build_bucket_layout(f["data_2_bkt"], n_bkt)
        centroids, params = f["centroids"], pickle.loads(f["params"].tobytes())
        scaler = StandardScaler()
        scaler.mean_, scaler.scale_ = f["scaler_mean"], f["scaler_scale"]
        print(f"[pipeline] serving inputs from cache {pcache} "
              f"({time.time() - t0:.1f}s)", flush=True)
    else:
        t0 = time.time()
        res = run_largescale(cfg, bundle=bundle, use_cache=False)
        print(f"[pipeline] large-scale build+train+redundancy+sweeps ({time.time() - t0:.1f}s)",
              flush=True)
        layout = res["layout"]
        for part, rows in enumerate(res["sweep_parts"]):
            for r in rows[:: max(1, len(rows) // 6)]:
                print(f"[analytic part{part}] thr={r.threshold:.2f} recall={r.recall:.4f} "
                      f"nprobe={r.nprobe:.1f} ndis={r.computations:.0f}", flush=True)
        centroids = res["kmeans"].centroids
        scaler = res["scaler"]
        params = res["state"].params
        try:
            import pickle

            params_np = jax.tree_util.tree_map(np.asarray, params)
            np.savez(
                pcache + ".tmp.npz",
                data_2_bkt=res["data_2_bkt"], centroids=np.asarray(centroids),
                scaler_mean=np.asarray(scaler.mean_),
                scaler_scale=np.asarray(scaler.scale_),
                params=np.frombuffer(pickle.dumps(params_np), dtype=np.uint8),
            )
            os.replace(pcache + ".tmp.npz", pcache)
            write_sig_sidecar(pcache, gen_sig)
        except OSError:
            pass
    print(f"[layout] total rows {layout.total:,} (redundancy ×{layout.total / n:.3f})",
          flush=True)

    t0 = time.time()
    eng = QueryEngine(
        x_d, layout, centroids, scaler, params,
        n_mul=cfg.n_mul, scan_impl="blocked", probe_cap=256,
        scan_dtype="bfloat16" if mode == "capacity" else mode,
        store_f32=mode != "capacity",
    )
    print(f"[engine] blocked engine built, mode={mode} ({time.time() - t0:.1f}s)",
          flush=True)
    # hard regime needs low thresholds for the high-recall tail (the 1M
    # LVI sweep reaches recall 0.955 at thr 0.05)
    thr = (np.array([0.01, 0.03, 0.05, 0.1, 0.2, 0.35, 0.5, 0.7])
           if regime == "hard" else np.arange(0.15, 0.9, 0.15))
    serve_rows = eng.sweep(x_q, gt, k, thr)
    for r in serve_rows:
        print(f"[serve] thr={r['threshold']:.2f} recall={r['avg_recall']:.4f} "
              f"nprobe={r['avg_nprobe']:.1f} ndis={r['avg_cmp']:.0f} "
              f"({100 * r['avg_cmp'] / n:.2f}% corpus) QPS={r['qps']:.0f}", flush=True)

    # throughput at a production batch: the sweep above serves batch=n_q
    # (sync-bound on a tunneled rig); tile the queries to 16k and measure
    # the pipelined stream path at one mid-sweep operating point
    big = np.tile(x_q, (max(1, 16384 // len(x_q)), 1))
    thr_tp = 0.1 if regime == "hard" else 0.45
    eng.search_stream(big[:4096], thr_tp, k, batch_size=4096)  # warmup/compile
    t0 = time.time()
    res = eng.search_stream(big, thr_tp, k, batch_size=4096)  # 4 batches in flight
    dt = time.time() - t0
    print(f"[serve-stream] thr={thr_tp} batch={len(big)} "
          f"ndis={res.ndis.mean():.0f} QPS={len(big) / dt:.0f} "
          f"({1e6 * dt / len(big):.0f} us/q sustained)", flush=True)


if __name__ == "__main__":
    main()
