"""Headline benchmark: end-to-end serving QPS at 1M-corpus scale, one chip.

Measures the blocked union-scan serving engine (probe → select → scan →
top-k, exact ndis accounting) on a 1M×128 **hard-regime** corpus
(low-intrinsic-dim manifold, scripts/hard_regime_calibrate.py: IVF needs
nprobe ≈ 10/17 for recall 0.90/0.95 at 1024 partitions — the fan-out
regime of the reference's sift/gist configs) with a **learned** K-Means
layout and a **trained** probing MLP, at the nprobe ≈ 8 operating point
(ndis ≈ 0.8% of corpus), batch 65536.

vs_baseline: ratio against the REFERENCE serving engine's measured CPU QPS
on this machine — search.cpp compiled from the reference sources against
pip LibTorch (scripts/reference_baseline/) and run on an identical
lira_tpu-built index (scripts/head_to_head.py); the recorded number lives
in logs/head_to_head.json.  Recall/ndis parity between the two engines was
verified on that shared index.  The host has ONE CPU core; per-core
scaling context is recorded by scripts/parallel_cpu_baseline.py.

Correctness is asserted in-run: for 64 sampled queries the engine's
neighbors must exactly match a numpy oracle restricted to the probed
buckets, and recall@10 against exact ground truth is reported.

Falls back to the round-1 exact-kNN benchmark if the serving path fails
(remote-compile flakes happen on this rig).

Prints exactly one JSON line:
    {"metric": ..., "value": QPS, "unit": "qps", "vs_baseline": ratio}
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# Measured on this machine by scripts/head_to_head.py (1M×128, n_bkt=1024,
# k=10, shared index, threshold with ndis closest to the 0.8% operating
# point).  Refreshed whenever head_to_head.py is re-run.
REF_CPU_QPS_FALLBACK = 780.0


def ref_cpu_qps(target_ndis: float = 8000.0) -> float:
    """Reference-engine QPS at the sweep row whose ndis is closest to the
    bench's ~0.8%-of-1M operating point — comparing QPS at matched work."""
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "logs", "head_to_head.json")) as f:
            rows = json.load(f)["reference_cpu"]
        return float(min(rows, key=lambda r: abs(r["avg_cmp"] - target_ndis))["qps"])
    except Exception:
        return REF_CPU_QPS_FALLBACK


def build_trained_index(n, d, n_bkt, k, batch, n_epoch):
    """The bench's real-pipeline setup, reusable by the measurement scripts
    (scripts/latency_bench.py): hard-regime corpus (cached under /tmp) →
    learned K-Means layout → trained probing MLP.

    Returns dict(x_d, x_q, layout, km, scaler, params, assign)."""
    import jax.numpy as jnp

    from lira_tpu.io.datasets import synthetic_dataset
    from lira_tpu.labels.distr import knn_bucket_labels
    from lira_tpu.labels.scaler import scaled_centroid_distances
    from lira_tpu.models.train import make_train_state, train_epoch
    from lira_tpu.ops.knn import self_knn
    from lira_tpu.partition.assign import build_bucket_layout
    from lira_tpu.partition.kmeans import kmeans_assign, kmeans_fit

    t0 = time.perf_counter()
    # this rig's vCPU generates Gaussians at ~1 M/s — cache the corpus
    # across runs.  The generator parameters are part of the cache key so a
    # future regime retune can never silently reuse a stale corpus; writes
    # are tmp+rename so a mid-save kill can't leave a truncated .npz that
    # bricks the os.path.exists branch of every later run.
    from lira_tpu.io.datasets import HARD_REGIME, hard_regime_sig

    gen = dict(HARD_REGIME, n_base=n, n_query=batch, dim=d, k_gt=k,
               compute_gt=False, intrinsic_dim=min(HARD_REGIME["intrinsic_dim"], d))
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")
    os.makedirs(cache_dir, exist_ok=True)
    cache = os.path.join(cache_dir,
                         f"bench_corpus_{n}_{d}_{batch}_{hard_regime_sig()}.npz")
    legacy = f"/tmp/bench_corpus_{n}_{d}_{batch}_{hard_regime_sig()}.npz"
    if not os.path.exists(cache) and os.path.exists(legacy):
        cache = legacy
    if os.path.exists(cache):
        f = np.load(cache)
        x_d, x_q = f["x_d"], f["x_q"]
        log(f"hard-regime corpus from cache ({time.perf_counter() - t0:.1f}s)")
    else:
        b = synthetic_dataset(**gen, name="bench")
        x_d, x_q = b.base, b.query
        try:
            np.savez(cache + ".tmp.npz", x_d=x_d, x_q=x_q)
            os.replace(cache + ".tmp.npz", cache)
        except OSError:
            pass
        log(f"hard-regime corpus ready ({time.perf_counter() - t0:.1f}s)")

    # The learned layout + trained model are deterministic given the corpus
    # signature and the hyperparameters below, and cost 15-25 min of the one
    # host vCPU to rebuild — cache them on the repo disk (survives the /tmp
    # wipe of a VM restart) so the measurement chain's steps share one build.
    repo = os.path.dirname(os.path.abspath(__file__))
    ix_dir = os.path.join(repo, ".cache")
    os.makedirs(ix_dir, exist_ok=True)
    ix_cache = os.path.join(
        ix_dir, f"bench_index_{n}_{d}_{n_bkt}_{k}_{batch}_{n_epoch}_{hard_regime_sig()}.npz")
    from lira_tpu.labels.scaler import StandardScaler
    from lira_tpu.partition.kmeans import KMeans

    if os.path.exists(ix_cache):
        t0 = time.perf_counter()
        f = np.load(ix_cache)
        km = KMeans(centroids=f["centroids"], objective=f["objective"])
        assign = f["assign"]
        layout = build_bucket_layout(assign, n_bkt)
        scaler = StandardScaler()
        scaler.mean_, scaler.scale_ = f["sc_mean"], f["sc_scale"]
        params = {}
        for key in f.files:
            if key.startswith("p__"):
                _, layer, leaf = key.split("__")
                params.setdefault(layer, {})[leaf] = jnp.asarray(f[key])
        log(f"trained index from cache ({time.perf_counter() - t0:.1f}s)")
        return dict(x_d=x_d, x_q=x_q, layout=layout, km=km, scaler=scaler,
                    params=params, assign=assign)

    # real pipeline: learned partitions, trained probing model
    t0 = time.perf_counter()
    km = kmeans_fit(x_d, n_bkt, niter=20, seed=43)
    assign = kmeans_assign(x_d, km.centroids)
    layout = build_bucket_layout(assign, n_bkt)
    log(f"kmeans layout ready ({time.perf_counter() - t0:.1f}s)")

    t0 = time.perf_counter()
    knn_ids = self_knn(x_d, k)
    d2b = assign.reshape(-1, 1).astype(np.int32)
    labels = knn_bucket_labels(knn_ids, d2b, n_bkt)
    dist, _, scaler = scaled_centroid_distances(x_d, x_q[:8], km.centroids)
    state = make_train_state(43, n_bkt, d)
    x_dev = jnp.asarray(x_d, jnp.float32)
    lab_dev = jnp.asarray(labels, jnp.float32)
    for _ in range(n_epoch):
        state, _ = train_epoch(state, dist, x_dev, lab_dev, batch_size=256)
    del dist, lab_dev
    params = state.params
    log(f"probing model trained {n_epoch} epochs ({time.perf_counter() - t0:.1f}s)")
    try:
        flat = {f"p__{layer}__{leaf}": np.asarray(v)
                for layer, leaves in params.items() for leaf, v in leaves.items()}
        np.savez(ix_cache + ".tmp.npz", centroids=km.centroids,
                 objective=km.objective, assign=np.asarray(assign),
                 sc_mean=scaler.mean_, sc_scale=scaler.scale_, **flat)
        os.replace(ix_cache + ".tmp.npz", ix_cache)
    except OSError:
        pass
    return dict(x_d=x_d, x_q=x_q, layout=layout, km=km, scaler=scaler,
                params=params, assign=assign)


def serving_bench():
    import lira_tpu

    lira_tpu.enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from lira_tpu.engine.serve import QueryEngine
    from lira_tpu.ops.knn import exact_knn

    if os.environ.get("LIRA_BENCH_SMALL") == "1":  # CPU smoke mode
        n, d, n_bkt, k, batch, n_gt, n_epoch = 20_000, 16, 32, 10, 512, 128, 2
    else:
        n, d, n_bkt, k, batch, n_gt, n_epoch = 1_000_000, 128, 1024, 10, 65536, 4096, 6
    ix = build_trained_index(n, d, n_bkt, k, batch, n_epoch)
    x_d, x_q, layout, km, scaler, params = (
        ix["x_d"], ix["x_q"], ix["layout"], ix["km"], ix["scaler"], ix["params"]
    )

    # GT is deterministic given the cached corpus (and independent of the
    # trained index), so cache it beside the corpus: recomputing it on-chip
    # costs ~4 min of the round-end bench budget for zero information.
    from lira_tpu.io.datasets import hard_regime_sig
    gt_cache = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".cache",
        f"bench_gt_{n}_{d}_{batch}_{n_gt}_{k}_{hard_regime_sig()}.npy")
    t0 = time.perf_counter()
    if os.path.exists(gt_cache):
        gt = np.load(gt_cache)
        log(f"gt for {n_gt} queries from cache ({time.perf_counter() - t0:.1f}s)")
    else:
        _, gt = exact_knn(x_d, x_q[:n_gt], k)
        gt = np.asarray(gt)
        try:
            np.save(gt_cache + ".tmp.npy", gt)
            os.replace(gt_cache + ".tmp.npy", gt_cache)
        except OSError:
            pass
        log(f"gt for {n_gt} queries ({time.perf_counter() - t0:.1f}s)")

    from lira_tpu.engine.calibrate import calibrate_block_margin

    sidecar = {"per_dtype": {}}

    def measure(scan_dtype):
        """Measured QPS for one engine mode, oracle-asserted in-run.

        The selection margin is CALIBRATED in-run (engine/calibrate.py,
        VERDICT r3 item 2): the zero-miss floor is measured on 2048 queries
        at the operating threshold, then the fastest margin ≥ floor×safety
        is picked from a measured candidate set — so the headline ships the
        measured margin, not the conservative default, while the 64-query
        exact-neighbor oracle below still asserts correctness at the margin
        actually served."""
        t0 = time.perf_counter()
        eng = QueryEngine(x_d, layout, km.centroids, scaler, params,
                          probe_cap=128, scan_impl="blocked", block_q=1024,
                          scan_dtype=scan_dtype)
        outputs = eng.probe(x_q[:512])
        thr = float(np.quantile(outputs, 1.0 - 8 / n_bkt))  # ~8 probes/query
        log(f"engine[{scan_dtype}] built ({time.perf_counter() - t0:.1f}s)")

        t0 = time.perf_counter()
        cal = calibrate_block_margin(eng, x_q[:2048], thr, k,
                                     ladder=(0, 2, 4, 8), safety=2.0)
        log(f"calibrate[{scan_dtype}]: zero-miss at {cal.zero_miss_margin} "
            f"groups, floor {cal.margin} (miss rates {cal.miss_rates}; "
            f"{time.perf_counter() - t0:.1f}s)")

        candidates = sorted({m for m in (cal.margin, 8, 16) if m >= cal.margin})
        best = None  # (qps, margin, result, elapsed)
        for m in candidates:
            eng.block_margin = int(m)
            t0 = time.perf_counter()
            eng.search(x_q, thr, k)  # warmup/compile at the measured shape
            log(f"warmup[{scan_dtype} m={m}] ({time.perf_counter() - t0:.1f}s)")
            t0 = time.perf_counter()
            r_m = eng.search(x_q, thr, k)
            el = time.perf_counter() - t0
            log(f"margin {m}: {batch / el:.0f} QPS")
            if best is None or batch / el > best[0]:
                best = (batch / el, int(m), r_m, el)
        qps, margin, r, elapsed = best
        eng.block_margin = margin
        ndis_pct = 100 * r.ndis.mean() / n
        hits = (r.ids[:n_gt, :, None] == gt[:, None, :]).any(axis=1)
        recall = hits.mean()
        log(f"serve[{scan_dtype}]: margin={margin} nprobe≈{r.nprobe.mean():.1f} "
            f"ndis={r.ndis.mean():.0f} ({ndis_pct:.2f}% corpus) "
            f"recall@{k}={recall:.4f}: {qps:.0f} QPS ({1e6 * elapsed / batch:.0f} us/q)")
        sidecar["per_dtype"][scan_dtype] = {
            "qps": round(qps, 1), "margin": margin,
            "zero_miss_margin": cal.zero_miss_margin,
            "miss_rates": {str(m): v for m, v in cal.miss_rates.items()},
            "ndis_pct": round(float(ndis_pct), 4),
            "recall": round(float(recall), 4),
            "nprobe": round(float(r.nprobe.mean()), 2),
        }

        # correctness: 64 sampled queries vs a numpy oracle over the probed
        # buckets — exact neighbor-set match required (the bf16 mode's
        # screen must not have missed a single tile)
        n_chk = 256
        # _select_probed applies the engine's probe_cap=128: the raw
        # probe+select path has no cap, so a heavy-tail query would give
        # the oracle MORE buckets than the engine legitimately scanned
        probed = eng._select_probed(jnp.asarray(x_q[:n_chk], jnp.float32), thr)
        for i in np.random.default_rng(0).choice(n_chk, size=64, replace=False):
            members = np.unique(np.concatenate(
                [layout.bucket_members(bb) for bb in np.nonzero(probed[i])[0]]
            ))
            dd = ((x_d[members] - x_q[i]) ** 2).sum(axis=1)
            expect = set(members[np.argsort(dd, kind="stable")][: min(k, len(members))])
            got = set(int(v) for v in r.ids[i] if v >= 0)
            assert got == expect, f"query {i}: engine != oracle"
        log(f"oracle check[{scan_dtype}]: neighbor sets exact on 64 sampled queries")
        return qps, eng, outputs

    # headline: fastest oracle-exact screen wins.  int8 (¼ the screen's HBM
    # bytes, int32 MXU) and bf16 (½, zero measured misses at this margin,
    # docs/bf16_screen.md) are within ~10% of each other and round 4's
    # single-pass ordering FLIPPED between same-day sessions (VERDICT r4
    # weak 2) — so the headline is decided by an INTERLEAVED A/B within
    # this session: both engines warm, then alternating timed passes,
    # median of 3 reps per dtype.  f32 only runs if both fail the oracle.
    engines = {}
    for dtype in ("int8", "bfloat16"):
        try:
            engines[dtype] = measure(dtype)  # (first_qps, engine, outputs)
        except Exception as exc:
            # oracle miss OR a per-dtype compile failure (e.g. the int8
            # Mosaic lowering on an older chip) — never let one dtype's
            # failure demote the whole serving bench to the kNN fallback
            log(f"{dtype} engine failed ({type(exc).__name__}: {exc}); "
                "trying the next screen dtype")
    if not engines:
        engines["float32"] = measure("float32")  # raises if it too fails

    if len(engines) >= 2:
        reps = {d: [] for d in engines}
        for rep in range(3):
            for dtype, (_, e_d, o_d) in engines.items():
                thr_d = float(np.quantile(o_d, 1.0 - 8 / n_bkt))
                t0 = time.perf_counter()
                e_d.search(x_q, thr_d, k)
                reps[dtype].append(batch / (time.perf_counter() - t0))
        medians = {d: float(np.median(v)) for d, v in reps.items()}
        order = sorted(medians, key=medians.get, reverse=True)
        spread = {d: f"{min(v):.0f}-{max(v):.0f}" for d, v in reps.items()}
        log(f"interleaved A/B medians: "
            + ", ".join(f"{d}={medians[d]:.0f}" for d in order)
            + f" (rep spread {spread}) -> headline {order[0]}")
        sidecar["ab_interleaved"] = {
            d: {"reps": [round(v, 1) for v in reps[d]],
                "median": round(medians[d], 1)} for d in reps
        }
        qps = medians[order[0]]
        best = (order[0], engines[order[0]][1], engines[order[0]][2])
        for d in order[1:]:
            del engines[d]
    else:
        (dtype, (cand, eng_c, outputs_c)), = engines.items()
        qps, best = cand, (dtype, eng_c, outputs_c)

    # recall-targeted operating point (VERDICT r3 item 7): QPS at the
    # cheapest threshold whose recall@k >= 0.95 on the gt sample, so the
    # headline cannot drift toward low-recall operating points.  BASELINE's
    # metric is the recall-vs-QPS curve; this is its >=0.95 row.
    best_dtype, eng, outputs = best
    r095 = None
    for target_nprobe in (12, 16, 20, 24, 32, 48, 64, 96):
        thr_t = float(np.quantile(outputs, 1.0 - target_nprobe / n_bkt))
        t0 = time.perf_counter()
        eng.search(x_q, thr_t, k)  # warmup at this union size
        t_warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        r_t = eng.search(x_q, thr_t, k)
        el = time.perf_counter() - t0
        hits_t = (r_t.ids[:n_gt, :, None] == gt[:, None, :]).any(axis=1)
        rec_t = float(hits_t.mean())
        log(f"recall-sweep[{best_dtype}] nprobe~{target_nprobe}: "
            f"recall@{k}={rec_t:.4f} ndis={r_t.ndis.mean():.0f} "
            f"{batch / el:.0f} QPS (warm {t_warm:.1f}s)")
        if rec_t >= 0.95:
            r095 = {
                "qps": round(batch / el, 1), "recall": round(rec_t, 4),
                "ndis_pct": round(float(100 * r_t.ndis.mean() / n), 4),
                "nprobe": round(float(r_t.nprobe.mean()), 2),
                "dtype": best_dtype,
            }
            # the block-size optimum moves with probe fan-out (the ~20-probe
            # point measured 25% faster at block_q=512 than the headline's
            # 1024 — logs/qb_sweep_r5.log); autotune IN-RUN at this
            # operating point, like the margin calibration above.  The
            # headline stays fixed at block_q=1024 for cross-round
            # comparability; results are block_q-invariant.
            try:
                from lira_tpu.engine.calibrate import autotune_block_q

                tune = autotune_block_q(eng, x_q, thr_t, k,
                                        candidates=(1024, 512, 256), reps=3)
                log(f"block_q autotune at recall095 point: "
                    + ", ".join(f"qb={q}: {batch / s:.0f} QPS"
                                for q, s in sorted(tune.medians.items(),
                                                   reverse=True))
                    + f" -> qb={tune.block_q}")
                r095["qps"] = round(batch / tune.medians[tune.block_q], 1)
                r095["block_q"] = tune.block_q
            except Exception as exc:  # autotune must not kill the bench
                log(f"block_q autotune failed ({type(exc).__name__}: {exc}); "
                    "recall095 stays at the default block_q")
            log(f"recall>=0.95 point[{best_dtype}]: {r095}")
            break
    if r095 is None:
        log("recall-sweep: no rung reached recall 0.95 (recorded as null)")

    # sustained pipelined throughput at the headline operating point:
    # search_stream overlaps batch i+1's probe + host union build with
    # batch i's scan (bit-identical results — engine/serve.py), hiding the
    # ~0.1-0.2 s/batch of host round trips the phase profile attributes to
    # probe+union sync.  Reported as a sidecar metric, NOT the headline
    # (the headline stays single-batch `search` for cross-round
    # comparability).
    qps_stream = None
    try:
        thr_h = float(np.quantile(outputs, 1.0 - 8 / n_bkt))
        # 8 pipelined batches: with 2 the fixed pipeline drain (last
        # batch's scan with nothing left to overlap) is half the wall
        # time and the "sustained" number is drain-dominated; at 8 the
        # steady-state rate dominates (each batch still pays a fresh
        # cold H2D upload — that is what the stream is hiding)
        n_rep = 8 if os.environ.get("LIRA_BENCH_SMALL") != "1" else 2
        big = np.tile(x_q, (n_rep, 1))
        eng.search_stream(x_q, thr_h, k, batch_size=batch)  # warm the shape
        t0 = time.perf_counter()
        r_s = eng.search_stream(big, thr_h, k, batch_size=batch)
        el = time.perf_counter() - t0
        qps_stream = round(len(big) / el, 1)
        log(f"stream[{best_dtype}] {len(big)} queries in {n_rep} pipelined "
            f"batches: {qps_stream:.0f} QPS sustained "
            f"(ndis={r_s.ndis.mean():.0f})")
    except Exception as exc:  # never let the sidecar stream kill the headline
        log(f"stream measurement failed ({type(exc).__name__}: {exc})")

    from lira_tpu.io.datasets import hard_regime_sig

    baseline = ref_cpu_qps()
    result = {
        "metric": "serve_1M_128d_k10_qps_at_0.8pct_ndis",
        "value": round(qps, 1),
        "unit": "qps",
        # vs the reference engine on this host's ONE CPU core at matched
        # ndis; search.cpp's query loop is serial (SURVEY §2.4) — per-core
        # scaling context: logs/parallel_cpu_baseline.json
        "vs_baseline": round(qps / baseline, 3),
        # regime versioning: corpus generator signature (VERDICT r3 item 7)
        "corpus_sig": hard_regime_sig(),
        "qps_at_recall095": None if r095 is None else r095["qps"],
        "qps_stream_sustained": qps_stream,
    }
    sidecar.update(corpus_sig=hard_regime_sig(), recall095=r095,
                   headline_dtype=best_dtype, ref_cpu_qps=baseline,
                   qps_stream_sustained=qps_stream)
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "logs", "bench_sidecar.json"), "w") as f:
            json.dump(sidecar, f, indent=2)
    except OSError:
        pass
    print(json.dumps(result), flush=True)


def knn_fallback():
    """Round-1 headline: exact 1M self-kNN vs the reference's ~8 s AVX-512."""
    import lira_tpu

    lira_tpu.enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from lira_tpu.ops.knn_pallas import _round1_select, _round2_rescan

    n, d, k = 1_000_000, 128, 10
    n_pad = ((n + 2047) // 2048) * 2048
    q_tile, kg = 8192, 19
    rng = np.random.default_rng(43)
    base_h = rng.standard_normal((n_pad, d), dtype=np.float32) * 20.0
    base_h[n:] = 0.0
    base = jnp.asarray(base_h)
    penalty = jnp.where(jnp.arange(n_pad) < n, 0.0, 1e30).astype(jnp.float32)
    bsq = (jnp.sum(base * base, axis=1) + penalty).astype(jnp.float32)
    bsq_g = bsq.reshape(n_pad // 128, 128)
    interp = jax.default_backend() != "tpu"

    def one_tile(start):
        qs = jax.lax.dynamic_slice_in_dim(base, start, q_tile)
        gsel = _round1_select(qs, base, bsq_g, "L2", kg, precision="default", interpret=interp)
        return _round2_rescan(qs, gsel, base, bsq_g, "L2", k + 1, sub=512)

    jax.block_until_ready(one_tile(0))
    t0 = time.perf_counter()
    # n_pad need not divide q_tile: clamp the last start explicitly so the
    # final tile is not silently re-scanning rows via dynamic_slice clamping
    starts = list(range(0, n_pad - q_tile + 1, q_tile))
    if starts[-1] + q_tile < n_pad:
        starts.append(n_pad - q_tile)
    outs = [one_tile(s)[1] for s in starts]
    jax.block_until_ready(outs[-1])
    elapsed = time.perf_counter() - t0
    log(f"fallback exact self-kNN 1M: {elapsed:.2f}s")
    print(json.dumps({
        "metric": "exact_self_knn_1M_128d_k10_seconds",
        "value": round(elapsed, 3),
        "unit": "s",
        "vs_baseline": round(8.0 / elapsed, 3),
    }), flush=True)


if __name__ == "__main__":
    if os.environ.get("LIRA_BENCH_SMALL") == "1":
        # smoke mode must stay off the TPU (this rig's sitecustomize forces
        # the axon backend; env vars alone don't override it)
        import jax

        jax.config.update("jax_platforms", "cpu")
    try:
        serving_bench()
    except Exception as exc:
        log(f"serving bench failed ({type(exc).__name__}: {exc}); falling back to kNN bench")
        knn_fallback()
