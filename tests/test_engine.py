import numpy as np
import pytest

from lira_tpu.partition.assign import build_bucket_layout
from lira_tpu.engine.scan import BucketCorpus, bucket_topk
from lira_tpu.engine.sweep import gt_hit_tensor, threshold_sweep, sweep_to_csv
from lira_tpu.engine.serve import QueryEngine
from lira_tpu.labels.scaler import StandardScaler
from lira_tpu.labels.distr import gt_bucket_map
from lira_tpu.models.probing_mlp import init_params
import jax


@pytest.fixture(scope="module")
def small_index(rng=None):
    rng = np.random.default_rng(11)
    n, dim, n_bkt, k = 600, 8, 6, 4
    x_d = rng.normal(size=(n, dim)).astype(np.float32)
    x_q = rng.normal(size=(25, dim)).astype(np.float32)
    assign = rng.integers(0, n_bkt, size=n)
    d2b = np.full((n, 2), -1, dtype=np.int32)
    d2b[:, 0] = assign
    # some redundancy
    sel = rng.random(n) < 0.2
    d2b[sel, 1] = rng.integers(0, n_bkt, size=sel.sum())
    layout = build_bucket_layout(d2b, n_bkt, tile=16)
    return x_d, x_q, d2b, layout, n_bkt, k


def _oracle_bucket_topk(x_q, x_d, layout, k, metric="L2"):
    n_q, n_bkt = len(x_q), layout.n_bkt
    found = np.full((n_q, n_bkt, k), -1, dtype=np.int64)
    for b in range(n_bkt):
        members = layout.bucket_members(b)
        if len(members) == 0:
            continue
        vec = x_d[members]
        if metric == "inner_product":
            s = -(x_q @ vec.T)
        else:
            s = ((x_q[:, None, :] - vec[None, :, :]) ** 2).sum(-1)
        order = np.argsort(s, axis=1, kind="stable")[:, :k]
        got = members[order]
        found[:, b, : got.shape[1]] = got
    return found


def test_bucket_topk_matches_oracle(small_index):
    x_d, x_q, d2b, layout, n_bkt, k = small_index
    corpus = BucketCorpus.build(x_d, layout)
    found = bucket_topk(x_q, corpus, k)
    expected = _oracle_bucket_topk(x_q, x_d, layout, k)
    np.testing.assert_array_equal(found, expected)


def test_bucket_topk_ip(small_index):
    x_d, x_q, d2b, layout, n_bkt, k = small_index
    corpus = BucketCorpus.build(x_d, layout)
    found = bucket_topk(x_q, corpus, k, metric="inner_product")
    expected = _oracle_bucket_topk(x_q, x_d, layout, k, metric="inner_product")
    np.testing.assert_array_equal(found, expected)


def test_bucket_topk_small_bucket():
    # bucket smaller than k -> -1 padding
    x_d = np.arange(6, dtype=np.float32).reshape(3, 2)
    layout = build_bucket_layout(np.array([[0], [0], [1]]), 2, tile=4)
    corpus = BucketCorpus.build(x_d, layout)
    found = bucket_topk(np.zeros((1, 2), np.float32), corpus, k=3)
    assert set(found[0, 0]) == {0, 1, -1}
    assert list(found[0, 1]).count(-1) == 2


def _oracle_sweep(outputs, gt_ids, found, d2b, sizes, k, thresholds):
    """Direct restatement of the reference query_tuning accounting
    (LIRA_smallscale.py:199-220): per-bucket gt-id lists intersected with
    per-bucket found ids, unioned across probed buckets."""
    n_q, n_bkt = outputs.shape
    rows = []
    for thr in thresholds:
        recs, cmps, nps = [], [], []
        for i in range(n_q):
            probed = np.where(outputs[i] > thr)[0]
            nps.append(len(probed))
            cmps.append(sizes[probed].sum())
            found_set = set()
            for b in probed:
                gt_in_b = {g for g in gt_ids[i] if b in d2b[g]}
                found_set |= gt_in_b & set(found[i, b])
            recs.append(len(found_set) / k)
        rows.append((np.mean(nps), np.mean(recs), np.mean(cmps)))
    return rows


def test_sweep_matches_oracle(small_index):
    x_d, x_q, d2b, layout, n_bkt, k = small_index
    rng = np.random.default_rng(5)
    corpus = BucketCorpus.build(x_d, layout)
    found = bucket_topk(x_q, corpus, k)
    # fake gt + outputs
    gt_ids = rng.integers(0, len(x_d), size=(len(x_q), k)).astype(np.int32)
    outputs = rng.random((len(x_q), n_bkt)).astype(np.float32)
    gtb = gt_bucket_map(gt_ids, d2b)
    hit = gt_hit_tensor(found, gt_ids, gtb)
    thresholds = np.array([0.1, 0.5, 0.9])
    rows = threshold_sweep(outputs, gtb, hit, layout.sizes, k, thresholds)
    expected = _oracle_sweep(outputs, gt_ids, found, d2b, layout.sizes, k, thresholds)
    for r, (enp, erec, ecmp) in zip(rows, expected):
        assert r.nprobe == pytest.approx(enp)
        assert r.recall == pytest.approx(erec)
        assert r.computations == pytest.approx(ecmp)


def test_sweep_csv(tmp_path, small_index):
    x_d, x_q, d2b, layout, n_bkt, k = small_index
    rows = threshold_sweep(
        np.random.default_rng(0).random((5, n_bkt)).astype(np.float32),
        np.zeros((5, k, 2), np.int32),
        np.zeros((5, k, 2), bool),
        layout.sizes,
        k,
        np.array([0.5]),
    )
    path = str(tmp_path / "sweep" / "model_0.csv")
    sweep_to_csv(rows, path)
    header = open(path).readline().strip()
    assert header == "threshold,nprobe,Recall,Computations,QPS"


# ---------- serving engine ----------


@pytest.fixture(scope="module")
def engine(small_index):
    x_d, x_q, d2b, layout, n_bkt, k = small_index
    from lira_tpu.partition.kmeans import kmeans_fit

    km = kmeans_fit(x_d, n_bkt, niter=5, seed=0)
    from lira_tpu.ops.distance import l2_to_centroids
    import jax.numpy as jnp

    raw = np.asarray(l2_to_centroids(jnp.asarray(x_d), jnp.asarray(km.centroids)))
    scaler = StandardScaler().fit(raw)
    params = init_params(jax.random.PRNGKey(0), n_bkt, x_d.shape[1])
    return QueryEngine(x_d, layout, km.centroids, scaler, params), x_d, x_q, layout


def test_engine_search_exact_within_probed(engine):
    eng, x_d, x_q, layout = engine
    k = 3
    res = eng.search(x_q, threshold=0.0, k=k)  # threshold 0 -> probe everything
    # probing everything == brute force over the whole corpus
    d = ((x_q[:, None, :] - x_d[None, :, :]) ** 2).sum(-1)
    expected = np.argsort(d, axis=1, kind="stable")[:, :k]
    np.testing.assert_array_equal(np.sort(res.ids, axis=1), np.sort(expected, axis=1))
    assert (res.nprobe == layout.n_bkt).all()
    assert (res.ndis == layout.sizes.sum()).all()


def test_engine_argmax_fallback(engine):
    eng, x_d, x_q, layout = engine
    res = eng.search(x_q, threshold=1.1, k=2)  # no bucket passes -> fallback
    assert (res.nprobe == 1).all()
    assert (res.ids[:, 0] >= 0).all()


def test_engine_search_matches_probed_bruteforce(engine):
    eng, x_d, x_q, layout = engine
    k = 3
    thr = 0.5
    outputs = eng.probe(x_q)
    probed = eng.select_buckets(outputs, thr)
    res = eng.search(x_q, threshold=thr, k=k)
    for i in range(len(x_q)):
        members = np.unique(np.concatenate([layout.bucket_members(b) for b in np.where(probed[i])[0]]))
        d = ((x_q[i] - x_d[members]) ** 2).sum(-1)
        expected = set(members[np.argsort(d, kind="stable")[:k]].tolist())
        got = set(int(v) for v in res.ids[i] if v >= 0)
        # sets may differ only on exact distance ties
        d_map = {int(m): d[j] for j, m in enumerate(members)}
        if got != expected:
            assert sorted(d_map[g] for g in got) == pytest.approx(
                sorted(d_map[e] for e in expected)
            )
        assert res.ndis[i] == layout.sizes[probed[i]].sum()
        assert res.nprobe[i] == probed[i].sum()


def test_engine_recall_and_sweep(engine):
    eng, x_d, x_q, layout = engine
    k = 3
    d = ((x_q[:, None, :] - x_d[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d, axis=1, kind="stable")[:, :k].astype(np.int32)
    rows = eng.sweep(x_q, gt, k, thresholds=np.array([0.0, 0.6]), warmup=False)
    assert rows[0]["avg_recall"] == pytest.approx(1.0)  # full probe = exact
    assert rows[0]["qps"] > 0
    assert rows[1]["avg_cmp"] <= rows[0]["avg_cmp"]
