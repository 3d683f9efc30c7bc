"""≥50M-row single-chip serving demonstration (int8 capacity mode).

BASELINE.json's config 5 is BIGANN-100M on a pod; the reference's own
scale ceiling is 10M rows (reference index_batch.sh:27-36).  This runs a
50M×128 hard-regime corpus END TO END on ONE 16 GB chip — possible only
because the int8 capacity engine stores the corpus as ONE quantized table
(0.25× the f32 bytes ≈ 6.6 GB at 50M with 3% redundancy) serving both
scan rounds, with exact final ordering restored by a host f32 re-rank
(engine/block_scan.py BlockScanState, store_f32=False + int8).

Pipeline (subset-trained, the reference's large-scale recipe):
  1. hard-regime corpus on host (cached; ~30 min first run on this vCPU)
  2. ONE streamed pass over f32 chunks — each chunk is uploaded once and
     reused for three things: exact-GT partial top-k for the query set,
     K-Means assignment, and probing-MLP predicted-nprobe counts (for
     redundancy selection)
  3. K-Means + scaler + MLP trained on a 1% subset (LIRA_largescale.py's
     regime: lr 1e-3, 40 epochs — scripts/train_scale_probe.py)
  4. learning-based redundancy on the top-3% boundary minority
  5. int8-capacity blocked engine; measured threshold sweep (recall vs
     exact GT, nprobe, ndis, QPS) + pipelined stream throughput

Usage: python scripts/tpu_50m_demo.py [n] [n_bkt] [n_q] [n_epoch]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import lira_tpu

lira_tpu.enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from functools import partial  # noqa: E402

from lira_tpu.engine.serve import QueryEngine  # noqa: E402
from lira_tpu.io.datasets import (  # noqa: E402
    HARD_REGIME,
    check_sig_sidecar,
    hard_regime_sig,
    synthetic_dataset,
    write_sig_sidecar,
)
from lira_tpu.labels.distr import knn_bucket_labels  # noqa: E402
from lira_tpu.labels.scaler import scaled_centroid_distances  # noqa: E402
from lira_tpu.models.probing_mlp import forward as mlp_forward  # noqa: E402
from lira_tpu.models.train import make_train_state, train_epoch  # noqa: E402
from lira_tpu.ops.knn import exact_knn, self_knn  # noqa: E402
from lira_tpu.partition.assign import build_bucket_layout  # noqa: E402
from lira_tpu.partition.kmeans import kmeans_assign, kmeans_fit  # noqa: E402
from lira_tpu.redundancy.assign import select_top_ratio  # noqa: E402

CHUNK = int(os.environ.get("LIRA_DEMO_CHUNK", 2_097_152))  # f32 chunk = 1 GB
BLOCK = min(65_536, CHUNK)  # assignment sub-slice inside the chunk program
assert CHUNK % BLOCK == 0


@partial(jax.jit, static_argnames=("sigma", "block"))
def _chunk_assign_counts(chunk, centroids, mean, scale, params, sigma=0.5,
                         block=BLOCK):
    """One fused device program per streamed chunk: sqrt-L2 to centroids →
    (argmin assignment, standardized features → MLP → predicted-nprobe
    counts).  Only (m,) i32 + (m,) i32 leave the device.

    The (m, n_bkt) distance/feature/score matrices are NEVER materialized
    for the whole chunk — at n_bkt=4096 that is 32 GB f32 per 2M-row chunk
    (the OOM in logs/tpu_50m_demo3.log).  lax.map walks `block`-row
    sub-slices sequentially, bounding workspace to ~3×(block·n_bkt) f32
    (≈3 GB at block=65536) while keeping ONE dispatch per chunk."""
    from lira_tpu.ops.distance import l2_to_centroids

    m = chunk.shape[0]
    assert m % block == 0, (m, block)

    def body(xb):
        d = l2_to_centroids(xb, centroids)  # sqrt-L2, (block, n_bkt)
        assign = jnp.argmin(d, axis=1).astype(jnp.int32)
        feat = (d - mean) / scale
        out = mlp_forward(params, feat, xb)
        counts = (out > sigma).sum(axis=1).astype(jnp.int32)
        return assign, counts

    a, c = jax.lax.map(body, chunk.reshape(m // block, block, -1))
    return a.reshape(m), c.reshape(m)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    n_bkt = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    n_q = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    n_epoch = int(sys.argv[4]) if len(sys.argv) > 4 else 40
    d, k = 128, 10
    subset_frac, re_ratio = 0.01, 0.03
    gen_sig = hard_regime_sig()
    rng = np.random.default_rng(43)

    # ---- 1. corpus (host, cached) ----
    t0 = time.time()
    cache = f"/tmp/syn50m_corpus_{n}_{d}_{n_q}.npz"
    if os.path.exists(cache) and check_sig_sidecar(cache, gen_sig):
        f = np.load(cache, mmap_mode=None)
        x_d, x_q = f["x_d"], f["x_q"]
        print(f"[gen] corpus from cache ({time.time() - t0:.1f}s)", flush=True)
    else:
        b = synthetic_dataset(
            n_base=n, n_query=n_q, dim=d, k_gt=k, compute_gt=False,
            name=f"syn{n // 1_000_000}m-hard", **HARD_REGIME,
        )
        x_d, x_q = b.base, b.query
        print(f"[gen] {n:,}×{d} hard-regime corpus ({time.time() - t0:.1f}s)",
              flush=True)
        try:
            np.savez(cache + ".tmp.npz", x_d=x_d, x_q=x_q)
            os.replace(cache + ".tmp.npz", cache)
            write_sig_sidecar(cache, gen_sig)
        except OSError:
            pass

    # phase checkpoints: the axon rig's remote-compile service fails
    # transiently (HTTP 500, logs/tpu_50m_demo3.log), and a blip mid-run
    # otherwise costs the full ~20-min prefix.  Each phase's outputs are
    # tiny next to the corpus; save and skip on rerun.
    ck_train = f"/tmp/syn50m_train_{n}_{n_bkt}_{n_epoch}.npz"
    ck_pass = f"/tmp/syn50m_pass_{n}_{n_bkt}_{n_epoch}.npz"

    # ---- 2. subset training (K-Means, scaler, probing MLP) ----
    from lira_tpu.labels.scaler import StandardScaler
    from lira_tpu.models.checkpoint import load_train_state, save_train_state

    if os.path.exists(ck_train) and os.path.exists(ck_train + ".state.npz"):
        f = np.load(ck_train)
        km_centroids = f["centroids"]
        scaler = StandardScaler()
        scaler.mean_ = f["scaler_mean"]
        scaler.scale_ = f["scaler_scale"]
        state, _ = load_train_state(ck_train + ".state.npz",
                                    make_train_state(43, n_bkt, d, lr=1e-3))
        print("[train] restored from phase checkpoint", flush=True)
    else:
        t0 = time.time()
        n_sub = int(n * subset_frac)
        sub_idx = np.sort(rng.choice(n, size=n_sub, replace=False))
        subset = np.ascontiguousarray(x_d[sub_idx])
        km = kmeans_fit(subset, n_bkt, niter=20, seed=43)
        km_centroids = km.centroids
        assign_sub = kmeans_assign(subset, km.centroids)
        print(f"[train] subset {n_sub:,} K-Means({n_bkt}) "
              f"({time.time() - t0:.1f}s)", flush=True)

        t0 = time.time()
        # MLP training uses a 131072-row sub-subset of the K-Means subset: at
        # n_bkt=4096 the 500k-row dist and label matrices are 8.2 GB EACH, so
        # device staging OOMs a 16 GB chip (first run of this demo died there;
        # 262k rows = 8.7 GB staged ALSO died next to the superbatch program's
        # workspace), and host staging re-uploads ~17 GB/epoch through the
        # tunnel.  131k rows stage once in HBM (2.15 + 2.15 + 0.07 GB) and
        # every epoch runs device-resident; the 10M demo's MLP trained on a
        # comparable 100k subset.  The quantizer and scaler keep the full 1%.
        n_tr = min(n_sub, 131_072)
        knn_sub = self_knn(subset[:n_tr], k)
        d2b_sub = assign_sub[:n_tr].reshape(-1, 1).astype(np.int32)
        labels = knn_bucket_labels(knn_sub, d2b_sub, n_bkt)
        dist_sub, _, scaler = scaled_centroid_distances(subset, None,
                                                        km.centroids)
        state = make_train_state(43, n_bkt, d, lr=1e-3)
        dist_tr = jnp.asarray(dist_sub[:n_tr], jnp.float32)
        lab_tr = jnp.asarray(labels, jnp.float32)
        vec_tr = jnp.asarray(subset[:n_tr], jnp.float32)
        del dist_sub, labels
        for ep in range(n_epoch):
            state, loss = train_epoch(state, dist_tr, vec_tr, lab_tr,
                                      batch_size=512)
            if ep % 10 == 0 or ep == n_epoch - 1:
                print(f"[train] epoch {ep} loss {float(loss):.5f}", flush=True)
        del dist_tr, lab_tr, vec_tr, subset
        print(f"[train] self-kNN + {n_epoch} epochs ({time.time() - t0:.1f}s)",
              flush=True)
        try:
            save_train_state(state, ck_train + ".state.npz")
            np.savez(ck_train + ".tmp.npz", centroids=km_centroids,
                     scaler_mean=scaler.mean_, scaler_scale=scaler.scale_)
            os.replace(ck_train + ".tmp.npz", ck_train)
        except OSError:
            pass

    # ---- 3. ONE streamed full pass: GT partials + assignment + counts ----
    if os.path.exists(ck_pass):
        f = np.load(ck_pass)
        assign, counts, gt = f["assign"], f["counts"], f["gt"]
        print("[pass] restored from phase checkpoint", flush=True)
    else:
        t0 = time.time()
        mean = jnp.asarray(scaler.mean_)
        scale = jnp.asarray(scaler.scale_)
        cents = jnp.asarray(km_centroids, jnp.float32)
        q_dev = jnp.asarray(x_q, jnp.float32)
        assign = np.empty(n, np.int32)
        counts = np.empty(n, np.int32)
        best_s = best_i = None
        for s in range(0, n, CHUNK):
            e = min(s + CHUNK, n)
            m = e - s
            if m < CHUNK:
                # pad the tail to the one compiled shape; padded rows are
                # excluded below (assignment slice + kNN id mask)
                pad = np.zeros((CHUNK, d), np.float32)
                pad[:m] = x_d[s:e]
                chunk_dev = jnp.asarray(pad)
                del pad
            else:
                chunk_dev = jnp.asarray(x_d[s:e])
            a_c, c_c = _chunk_assign_counts(chunk_dev, cents, mean, scale,
                                            state.params)
            if m < CHUNK:
                # GT must NOT see the zero-padded tail: pad rows rank at
                # score 0 (||0||² − 2·0·q) and can displace real rows from
                # the per-chunk top-k BEFORE the id mask below.  exact_knn
                # pads internally with a 1e30 penalty applied before top-k
                # (ops/knn.py:_prepare_corpus), so feed it the raw slice.
                sc, ids = exact_knn(x_d[s:e], q_dev, k)
            else:
                sc, ids = exact_knn(chunk_dev, q_dev, k)  # GT partial, on device
            assign[s:e] = np.asarray(a_c)[:m]
            counts[s:e] = np.asarray(c_c)[:m]
            sc = np.where(ids < m, sc, np.inf)  # belt-and-braces pad-id mask
            ids = ids.astype(np.int64) + s
            if best_s is None:
                best_s, best_i = sc, ids
            else:
                cs = np.concatenate([best_s, sc], axis=1)
                ci = np.concatenate([best_i, ids], axis=1)
                sel = np.argsort(cs, axis=1, kind="stable")[:, :k]
                best_s = np.take_along_axis(cs, sel, axis=1)
                best_i = np.take_along_axis(ci, sel, axis=1)
            del chunk_dev
            if (s // CHUNK) % 5 == 0:
                print(f"[pass] {e:,}/{n:,} rows ({time.time() - t0:.1f}s)",
                      flush=True)
        gt = best_i
        print(f"[pass] full streamed pass: GT + assignment + counts "
              f"({time.time() - t0:.1f}s)", flush=True)
        try:
            np.savez(ck_pass + ".tmp.npz", assign=assign, counts=counts, gt=gt)
            os.replace(ck_pass + ".tmp.npz", ck_pass)
        except OSError:
            pass

    # ---- 4. learning-based redundancy on the top-3% boundary minority ----
    # Fused device scoring in HBM-budgeted batches (largescale.py's
    # _fused_redundancy_batch): the (rows, n_bkt) feature/score/rank
    # workspaces exist ONLY on device and only the (rows, 2) assignment
    # returns to host.  The first run of this demo scored the full 1.5M-row
    # minority through host-side `infer` — the (1.5M, 4096) dist/score/
    # predict matrices plus their argsort temporaries next to the 25.6 GB
    # corpus were OOM-killed at 131 GB anon RSS (logs/tpu_50m_demo4.log +
    # dmesg; the host has 125 GB).
    ck_red = f"/tmp/syn50m_red_{n}_{n_bkt}_{n_epoch}.npz"
    if os.path.exists(ck_red):
        f = np.load(ck_red)
        d2b, selected = f["d2b"], f["selected"]
        print("[redundancy] restored from phase checkpoint", flush=True)
    else:
        t0 = time.time()
        from lira_tpu.pipelines.largescale import _fused_redundancy_batch

        d2b = np.full((n, 2), -1, np.int32)
        d2b[:, 0] = assign
        selected = np.sort(select_top_ratio(counts, re_ratio))
        cj = jnp.asarray(km_centroids, jnp.float32)
        mean = jnp.asarray(scaler.mean_)
        scale = jnp.asarray(scaler.scale_)
        budget_rows = max(1 << 14, (1 << 32) // (n_bkt * 8))
        for s in range(0, len(selected), budget_rows):
            sl = selected[s : s + budget_rows]
            d2b[sl] = np.asarray(_fused_redundancy_batch(
                state.params, cj, mean, scale,
                jnp.asarray(x_d[sl], jnp.float32),
                jnp.asarray(d2b[sl, 0], jnp.int32),
                jnp.float32(0.5), 2,
            ))
        print(f"[redundancy] {len(selected):,} boundary rows scored on device "
              f"({time.time() - t0:.1f}s)", flush=True)
        try:
            np.savez(ck_red + ".tmp.npz", d2b=d2b, selected=selected)
            os.replace(ck_red + ".tmp.npz", ck_red)
        except OSError:
            pass
    t0 = time.time()
    layout = build_bucket_layout(d2b, n_bkt)
    print(f"[redundancy] {len(selected):,} boundary rows duplicated; table "
          f"{layout.total:,} rows (×{layout.total / n:.3f}) "
          f"({time.time() - t0:.1f}s)", flush=True)

    # ---- 5. int8-capacity engine + measured sweep ----
    t0 = time.time()
    eng = QueryEngine(
        x_d, layout, km_centroids, scaler, state.params,
        n_mul=2, scan_impl="blocked", probe_cap=256,
        scan_dtype="int8", store_f32=False,
    )
    int8_gb = layout.total * d / 2**30
    print(f"[engine] int8-capacity engine built: table ≈{int8_gb:.1f} GB int8 "
          f"(0.25× the {4 * int8_gb:.1f} GB f32 corpus) "
          f"({time.time() - t0:.1f}s)", flush=True)

    outputs = eng.probe(x_q[:512])
    hits = (lambda ids: (ids[:, :, None] == gt[:, None, :]).any(axis=1).mean())
    for target_nprobe in (8, 16, 32, 64):
        thr = float(np.quantile(outputs, 1.0 - target_nprobe / n_bkt))
        eng.search(x_q, thr, k)  # warmup at the measured shape
        t0 = time.time()
        r = eng.search(x_q, thr, k)
        dt = time.time() - t0
        print(f"[serve] nprobe~{r.nprobe.mean():.1f} ndis={r.ndis.mean():.0f} "
              f"({100 * r.ndis.mean() / n:.3f}% corpus) "
              f"recall@{k}={hits(r.ids):.4f} QPS={n_q / dt:.0f} "
              f"({1e6 * dt / n_q:.0f} us/q)", flush=True)

    # sustained stream throughput at a mid-sweep point, 4 batches in flight
    big = np.tile(x_q, (max(1, 16384 // n_q), 1))
    thr = float(np.quantile(outputs, 1.0 - 16 / n_bkt))
    eng.search_stream(big[:4096], thr, k, batch_size=4096)
    t0 = time.time()
    r = eng.search_stream(big, thr, k, batch_size=4096)
    dt = time.time() - t0
    print(f"[serve-stream] batch={len(big)} ndis={r.ndis.mean():.0f} "
          f"QPS={len(big) / dt:.0f} ({1e6 * dt / len(big):.0f} us/q sustained)",
          flush=True)

    if os.environ.get("LIRA_STREAM_DIAG") == "1":
        # VERDICT r4 weak 5: at 50M the stream measured ~15% SLOWER than
        # batch-sync (an inversion new at this scale).  Same query set,
        # same batch size, three interleaved A/B reps, then one phase-marked
        # stream pass to localize where the pipelined path loses.
        def sync_pass():
            for s in range(0, len(big), 4096):
                eng.search(big[s : s + 4096], thr, k)

        sync_pass()  # warm the per-batch 4096 shape
        t_sync, t_stream = [], []
        for rep in range(3):
            t0 = time.time()
            sync_pass()
            t_sync.append(time.time() - t0)
            t0 = time.time()
            eng.search_stream(big, thr, k, batch_size=4096)
            t_stream.append(time.time() - t0)
        print(f"[diag] sync   QPS per rep: "
              f"{[f'{len(big) / t:.0f}' for t in t_sync]} "
              f"(median {len(big) / np.median(t_sync):.0f})", flush=True)
        print(f"[diag] stream QPS per rep: "
              f"{[f'{len(big) / t:.0f}' for t in t_stream]} "
              f"(median {len(big) / np.median(t_stream):.0f})", flush=True)
        os.environ["LIRA_BLOCKED_TIMING"] = "1"
        eng.search_stream(big, thr, k, batch_size=4096)
        os.environ["LIRA_BLOCKED_TIMING"] = "0"


if __name__ == "__main__":
    main()
