"""The paper's headline comparison, reproduced end-to-end on synthetic data:
at matched recall, learned probing must beat classic
probe-by-centroid-distance IVF on computations (ndis) — the reference
README claims up to 30% reduction.  The corpus is the HARD fan-out regime
(low-intrinsic-dim manifold, like the measured 1M comparison in
scripts/lira_vs_ivf.py and logs/lira_vs_ivf/): in the separable regime
both probe ~1 bucket and the comparison is vacuous.

Measured 1M×128/1024 counterpart (one TPU chip, logs/lira_vs_ivf/): LIRA
ndis ×0.72 of IVF at recall 0.95 — the paper's claimed reduction,
reproduced end to end."""

import numpy as np
import pytest

from lira_tpu.config import Config
from lira_tpu.engine.ivf_baseline import ivf_sweep
from lira_tpu.engine.scan import BucketCorpus, bucket_topk
from lira_tpu.engine.sweep import gt_hit_tensor
from lira_tpu.engine.tuning import compare_at_recall, pick_threshold
from lira_tpu.io.datasets import synthetic_dataset
from lira_tpu.labels.distr import gt_bucket_map
from lira_tpu.pipelines.smallscale import run_smallscale


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    bundle = synthetic_dataset(
        n_base=20000, n_query=100, dim=32, n_clusters=8, k_gt=20, seed=43,
        intrinsic_dim=8, center_scale=1.0, noise_scale=1.0, query_noise=0.35,
        ambient_noise=0.02,
    )
    cfg = Config(
        dataset="synthetic", k=10, n_bkt=32, n_epoch=8, batch_size=64,
        redundancy_ratio=0.03, data_path=str(tmp_path_factory.mktemp("d")),
    ).update()
    cfg.pth_log = None
    cfg.file_name = None
    res = run_smallscale(cfg, bundle=bundle, use_cache=False)
    return cfg, res, bundle


def test_lira_beats_ivf_at_matched_recall(trained):
    cfg, res, bundle = trained
    # IVF sweep on the SAME final (redundant) layout for apples-to-apples ndis
    layout = res["layout"]
    knn_query = bundle.groundtruth[:, : cfg.k]
    gtb = gt_bucket_map(knn_query, res["data_2_bkt"])
    corpus = BucketCorpus.build(bundle.base, layout)
    found = bucket_topk(bundle.query, corpus, cfg.k)
    hit = gt_hit_tensor(found, knn_query, gtb)
    ivf_rows = [
        {"threshold": 0.0, "avg_recall": r["recall"], "avg_nprobe": r["nprobe"],
         "avg_cmp": r["computations"]}
        for r in ivf_sweep(
            bundle.query, res["kmeans"].centroids, gtb, hit, layout.sizes, cfg.k,
            nprobes=list(range(1, 33)),
        )
    ]
    lira_rows = res["sweep_parts"][1]  # post-redundancy sweep

    ratios = {}
    for target in (0.85, 0.9, 0.95):
        cmp_res = compare_at_recall(lira_rows, ivf_rows, target)
        assert cmp_res is not None, f"target {target} infeasible"
        ratios[target] = cmp_res["ndis_ratio"]  # ivf/lira: ≥1 → LIRA cheaper
        assert cmp_res["ndis_ratio"] >= 1.0, (
            f"target {target}: LIRA ndis {cmp_res['a'].computations:.0f} vs "
            f"IVF {cmp_res['b'].computations:.0f}"
        )
    # the reduction must be material at least once (measured here: 1.39 at
    # 0.85, 1.19 at 0.90, 1.11 at 0.95 — comfortably above the bound)
    assert max(ratios.values()) >= 1.05, ratios


def test_lira_reaches_high_recall(trained):
    cfg, res, bundle = trained
    op = pick_threshold(res["sweep_parts"][1], 0.9)
    assert op is not None, "LIRA sweep never reached recall 0.9"


def test_measured_engine_with_ivf_prober(rng):
    """QueryEngine(prober=ivf_probe_matrix) probes exactly the M nearest
    centroids at the rank-mapped threshold — the measured half of the
    LIRA-vs-IVF comparison (scripts/lira_vs_ivf.py)."""
    import jax
    import jax.numpy as jnp
    from lira_tpu.engine.ivf_baseline import ivf_probe_matrix
    from lira_tpu.engine.serve import QueryEngine
    from lira_tpu.labels.scaler import StandardScaler
    from lira_tpu.models.probing_mlp import init_params
    from lira_tpu.ops.distance import l2_to_centroids, pairwise_scores
    from lira_tpu.partition.assign import build_bucket_layout
    from lira_tpu.partition.kmeans import kmeans_fit

    n, dim, n_bkt = 1200, 8, 10
    x_d = rng.normal(size=(n, dim)).astype(np.float32)
    x_q = rng.normal(size=(17, dim)).astype(np.float32)
    d2b = np.full((n, 1), -1, np.int32)
    d2b[:, 0] = rng.integers(0, n_bkt, size=n)
    layout = build_bucket_layout(d2b, n_bkt, tile=128)
    km = kmeans_fit(x_d, n_bkt, niter=3, seed=0)
    raw = np.asarray(l2_to_centroids(jnp.asarray(x_d), jnp.asarray(km.centroids)))
    scaler = StandardScaler().fit(raw)
    params = init_params(jax.random.PRNGKey(0), n_bkt, dim)

    for impl in ("xla", "blocked"):
        eng = QueryEngine(
            x_d, layout, km.centroids, scaler, params, n_mul=1, scan_impl=impl,
            prober=lambda q: ivf_probe_matrix(q, np.asarray(km.centroids)),
        )
        for m in (1, 3, 5):
            thr = 1.0 - (m - 0.5) / n_bkt
            res = eng.search(x_q, thr, k=5)
            assert (res.nprobe == m).all(), (impl, m)
            # probed buckets are exactly the M nearest centroids → the
            # returned neighbors match a brute-force scan of those buckets
            cd = np.asarray(pairwise_scores(jnp.asarray(x_q), jnp.asarray(km.centroids)))
            nearest = np.argsort(cd, axis=1, kind="stable")[:, :m]
            for i in range(len(x_q)):
                members = np.concatenate([layout.bucket_members(b) for b in nearest[i]])
                d = ((x_d[members] - x_q[i]) ** 2).sum(1)
                expect = set(members[np.argsort(d, kind="stable")][: min(5, len(members))])
                got = set(res.ids[i][res.ids[i] >= 0])
                assert got == expect, (impl, m, i)
