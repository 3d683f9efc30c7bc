import numpy as np

from lira_tpu.diagnostics import observe_knn_tail, per_query_nprobe
from lira_tpu.engine.ivf_baseline import ivf_probe_matrix, ivf_sweep


def test_per_query_nprobe(tmp_path):
    # query 0: bucket ranking by score [2,0,1]; counts: bucket2 has 4 of 5 kNN,
    # bucket0 has 1 -> needs 2 probes for recall 0.98? 4/5=0.8 <0.98, 5/5=1.0 ok
    outputs = np.array([[0.3, 0.1, 0.9]], dtype=np.float32)
    cnt = np.array([[1, 0, 4]])
    sizes = np.array([10, 20, 30])
    res = per_query_nprobe(outputs, cnt, sizes, k=5, n_queries=1, csv_path=str(tmp_path / "pq.csv"))
    assert res[0, 1] == 2  # nprobe
    assert res[0, 2] == 40  # bucket2 + bucket0 sizes
    header = open(tmp_path / "pq.csv").readline().strip()
    assert header == "q_id,nprobe,cmp"


def test_observe_knn_tail_basic():
    # 1 query, 4 buckets: bucket0 holds 1 kNN (the tail), bucket1 holds 2
    knn_distr_cnt = np.array([[1, 2, 0, 0]])
    knn = np.array([[5, 6, 7]])  # neighbor ids
    data_2_bkt = np.zeros(10, dtype=np.int64)
    data_2_bkt[5] = 0  # the lone neighbor lives in bucket 0
    data_2_bkt[6] = data_2_bkt[7] = 1
    n_d, n_bkt = 10, 4
    outputs_data = np.random.default_rng(0).random((n_d, n_bkt)).astype(np.float32)
    outputs_data[5] = [0.1, 0.9, 0.2, 0.3]  # model ranks replica bucket1 first
    dists = np.random.default_rng(1).random((n_d, n_bkt)).astype(np.float32)
    dists[5] = [0.0, 0.9, 0.1, 0.2]  # distance ranks bucket1 last-ish (rank 3)
    res = observe_knn_tail(knn_distr_cnt, outputs_data, dists, knn, data_2_bkt)
    assert 5 in res["tail_ids"]
    # model puts the replica at rank 0 -> cumulative validity 1.0 from rank 0
    i = list(res["tail_ids"]).index(5)
    assert res["output_rank_valid"][0] >= res["dist_rank_valid"][0]


def test_ivf_probe_matrix_ranks_nearest_first(rng):
    x_q = rng.normal(size=(10, 8)).astype(np.float32)
    c = rng.normal(size=(6, 8)).astype(np.float32)
    m = ivf_probe_matrix(x_q, c)
    d = ((x_q[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(m.argmax(axis=1), d.argmin(axis=1))
    # top-M on the pseudo-scores == M nearest centroids
    np.testing.assert_array_equal(
        np.argsort(-m, axis=1, kind="stable"), np.argsort(d, axis=1, kind="stable")
    )


def test_ivf_sweep_monotone(rng):
    from lira_tpu.partition.assign import build_bucket_layout
    from lira_tpu.engine.scan import BucketCorpus, bucket_topk
    from lira_tpu.engine.sweep import gt_hit_tensor
    from lira_tpu.labels.distr import gt_bucket_map

    n, dim, n_bkt, k = 500, 8, 6, 3
    x_d = rng.normal(size=(n, dim)).astype(np.float32)
    x_q = rng.normal(size=(15, dim)).astype(np.float32)
    from lira_tpu.partition.kmeans import kmeans_fit, kmeans_assign

    km = kmeans_fit(x_d, n_bkt, niter=5, seed=0)
    assign = kmeans_assign(x_d, km.centroids)
    layout = build_bucket_layout(assign, n_bkt, tile=16)
    d = ((x_q[:, None, :] - x_d[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d, axis=1, kind="stable")[:, :k].astype(np.int32)
    corpus = BucketCorpus.build(x_d, layout)
    found = bucket_topk(x_q, corpus, k)
    gtb = gt_bucket_map(gt, assign)
    hit = gt_hit_tensor(found, gt, gtb)
    rows = ivf_sweep(x_q, km.centroids, gtb, hit, layout.sizes, k, nprobes=[1, 2, 4, 6])
    recalls = [r["recall"] for r in rows]
    assert all(b >= a - 1e-9 for a, b in zip(recalls, recalls[1:]))
    assert recalls[-1] == 1.0  # probing all buckets recovers everything


def test_observe_knn_tail_masks_negative_knn():
    """-1 neighbor padding must not wrap to the last corpus point."""
    from lira_tpu.diagnostics import observe_knn_tail

    knn_distr_cnt = np.array([[1, 2, 0]])
    outputs = np.zeros((4, 3), np.float32)
    dist = np.zeros((4, 3), np.float32)
    knn = np.array([[0, -1]], np.int32)
    d2b = np.array([0, 1, 1, 2], np.int32)
    res = observe_knn_tail(knn_distr_cnt, outputs, dist, knn, d2b)
    assert 3 not in res["tail_ids"]  # point 3 only reachable via the -1 wrap
    # max_points=0 means zero points, not unbounded
    res0 = observe_knn_tail(knn_distr_cnt, outputs, dist, knn, d2b, max_points=0)
    assert len(res0["tail_ids"]) == 0


def test_per_query_nprobe_reaches_max_probe():
    """M == max_probe is tested, and unreached queries report the full
    (max_probe, cmp) instead of deflating the statistic with zeros."""
    from lira_tpu.diagnostics import per_query_nprobe

    # one query; target first reached at exactly max_probe=3 buckets
    outputs = np.array([[3.0, 2.0, 1.0]])
    cnt = np.array([[4, 3, 3]])  # k=10: 4/10, 7/10, 10/10
    sizes = np.array([10, 20, 30])
    rows = per_query_nprobe(outputs, cnt, sizes, k=10, recall_target=0.98,
                            n_queries=1, max_probe=3)
    assert tuple(rows[0]) == (0, 3, 60)
    # unreachable target: report max_probe, not 0
    rows = per_query_nprobe(outputs, cnt, sizes, k=100, recall_target=0.98,
                            n_queries=1, max_probe=3)
    assert tuple(rows[0]) == (0, 3, 60)
