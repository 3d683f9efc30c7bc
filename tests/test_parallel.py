import numpy as np
import pytest
import jax

from lira_tpu.parallel.mesh import make_mesh
from lira_tpu.parallel.train_dp import dp_train_epoch, make_dp_train_step
from lira_tpu.parallel.sharded_engine import ShardedQueryEngine
from lira_tpu.models.train import make_train_state, train_epoch, evaluate


needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")



@needs_8
def test_dp_training_matches_single_device(rng):
    import optax
    from lira_tpu.models.probing_mlp import init_params
    from lira_tpu.models.train import TrainState

    n, n_bkt, dim = 256, 8, 16
    dist = rng.normal(size=(n, n_bkt)).astype(np.float32)
    vec = rng.normal(size=(n, dim)).astype(np.float32)
    targets = (rng.random((n, n_bkt)) < 0.3).astype(np.float32)

    # SGD makes the update linear in the gradient, so DP-vs-single parity
    # tests gradient correctness without Adam's amplification of float
    # summation-order noise in near-zero grads.
    def sgd_state():
        params = init_params(jax.random.PRNGKey(0), n_bkt, dim)
        tx = optax.sgd(0.1)
        return TrainState(params=params, opt_state=tx.init(params), tx=tx)

    mesh = make_mesh(8)
    s_dp, loss_dp = dp_train_epoch(sgd_state(), mesh, dist, vec, targets, global_batch=256)
    s_sd, loss_sd = train_epoch(sgd_state(), dist, vec, targets, batch_size=256)

    assert loss_dp == pytest.approx(loss_sd, rel=1e-5)
    for layer in s_dp.params:
        for name in s_dp.params[layer]:
            np.testing.assert_allclose(
                np.asarray(s_dp.params[layer][name]),
                np.asarray(s_sd.params[layer][name]),
                rtol=1e-4, atol=1e-6,
            )


@needs_8
def test_dp_training_with_padding(rng):
    # n not divisible by devices*batch: padded rows must not corrupt the loss
    n, n_bkt, dim = 100, 4, 8
    dist = rng.normal(size=(n, n_bkt)).astype(np.float32)
    vec = rng.normal(size=(n, dim)).astype(np.float32)
    targets = (rng.random((n, n_bkt)) < 0.3).astype(np.float32)
    mesh = make_mesh(8)
    state = make_train_state(seed=1, n_bkt=n_bkt, dim=dim)
    state, loss = dp_train_epoch(state, mesh, dist, vec, targets, global_batch=64)
    assert np.isfinite(loss)


@needs_8
def test_sharded_engine_matches_single_device():
    from lira_tpu.partition.assign import build_bucket_layout
    from lira_tpu.partition.kmeans import kmeans_fit
    from lira_tpu.labels.scaler import StandardScaler
    from lira_tpu.models.probing_mlp import init_params
    from lira_tpu.engine.serve import QueryEngine
    from lira_tpu.ops.distance import l2_to_centroids
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    n, dim, n_bkt = 800, 8, 10
    x_d = rng.normal(size=(n, dim)).astype(np.float32)
    x_q = rng.normal(size=(30, dim)).astype(np.float32)
    d2b = np.full((n, 2), -1, dtype=np.int32)
    d2b[:, 0] = rng.integers(0, n_bkt, size=n)
    sel = rng.random(n) < 0.15
    d2b[sel, 1] = rng.integers(0, n_bkt, size=sel.sum())
    layout = build_bucket_layout(d2b, n_bkt, tile=16)
    km = kmeans_fit(x_d, n_bkt, niter=3, seed=0)
    raw = np.asarray(l2_to_centroids(jnp.asarray(x_d), jnp.asarray(km.centroids)))
    scaler = StandardScaler().fit(raw)
    params = init_params(jax.random.PRNGKey(0), n_bkt, dim)

    single = QueryEngine(x_d, layout, km.centroids, scaler, params, tile=16)
    mesh = make_mesh(8)
    sharded = ShardedQueryEngine(x_d, layout, km.centroids, scaler, params, mesh)

    for thr in (0.0, 0.5, 1.1):
        r1 = single.search(x_q, thr, k=5)
        r8 = sharded.search(x_q, thr, k=5)
        np.testing.assert_array_equal(r1.nprobe, r8.nprobe)
        np.testing.assert_array_equal(r1.ndis, r8.ndis)
        # same neighbor sets (ties may reorder)
        for i in range(len(x_q)):
            s1 = set(int(v) for v in r1.ids[i] if v >= 0)
            s8 = set(int(v) for v in r8.ids[i] if v >= 0)
            assert s1 == s8, f"thr={thr} query {i}"


@needs_8
def test_sharded_engine_skewed_construction_memory():
    """Heavily skewed buckets: construction must stage one device's tables at
    a time, not a dense (n_dev, max_tiles, tile, dim) host array."""
    import tracemalloc
    from lira_tpu.partition.assign import build_bucket_layout
    from lira_tpu.partition.kmeans import kmeans_fit
    from lira_tpu.labels.scaler import StandardScaler
    from lira_tpu.models.probing_mlp import init_params
    from lira_tpu.ops.distance import l2_to_centroids
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    n, dim, n_bkt = 20_000, 32, 16
    x_d = rng.normal(size=(n, dim)).astype(np.float32)
    # one giant bucket + tiny ones: the dense layout would pad every device
    # to the giant bucket's tile count
    d2b = np.zeros((n, 1), np.int32)
    d2b[:, 0] = np.minimum(rng.integers(0, 200, size=n), n_bkt - 1)  # ~92% in bucket 15
    layout = build_bucket_layout(d2b, n_bkt, tile=128)
    km = kmeans_fit(x_d[:2000], n_bkt, niter=2, seed=0)
    raw = np.asarray(l2_to_centroids(jnp.asarray(x_d[:2000]), jnp.asarray(km.centroids)))
    scaler = StandardScaler().fit(raw)
    params = init_params(jax.random.PRNGKey(0), n_bkt, dim)
    mesh = make_mesh(8)

    t_pad_dense_bytes = 8 * layout.padded_sizes.max() // 128 * 128 * dim * 4  # old dense form
    tracemalloc.start()
    eng = ShardedQueryEngine(x_d, layout, km.centroids, scaler, params, mesh)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    # peak numpy staging must stay far below the dense host array it replaced
    assert peak < t_pad_dense_bytes, (peak, t_pad_dense_bytes)

    # and the engine still answers exactly
    x_q = rng.normal(size=(9, dim)).astype(np.float32)
    res = eng.search(x_q, 0.0, k=5)
    gt = np.argsort(((x_d[None] - x_q[:, None]) ** 2).sum(-1), axis=1)[:, :5]
    for i in range(9):
        assert set(res.ids[i][res.ids[i] >= 0]) == set(gt[i])


@needs_8
def test_sharded_engine_probe_cap_matches_single():
    from lira_tpu.partition.assign import build_bucket_layout
    from lira_tpu.partition.kmeans import kmeans_fit
    from lira_tpu.labels.scaler import StandardScaler
    from lira_tpu.models.probing_mlp import init_params
    from lira_tpu.engine.serve import QueryEngine
    from lira_tpu.ops.distance import l2_to_centroids
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    n, dim, n_bkt = 900, 8, 12
    x_d = rng.normal(size=(n, dim)).astype(np.float32)
    x_q = rng.normal(size=(21, dim)).astype(np.float32)
    d2b = np.full((n, 1), -1, np.int32)
    d2b[:, 0] = rng.integers(0, n_bkt, size=n)
    layout = build_bucket_layout(d2b, n_bkt, tile=128)
    km = kmeans_fit(x_d, n_bkt, niter=3, seed=0)
    raw = np.asarray(l2_to_centroids(jnp.asarray(x_d), jnp.asarray(km.centroids)))
    scaler = StandardScaler().fit(raw)
    params = init_params(jax.random.PRNGKey(0), n_bkt, dim)

    single = QueryEngine(x_d, layout, km.centroids, scaler, params, probe_cap=4)
    mesh = make_mesh(8)
    sharded = ShardedQueryEngine(x_d, layout, km.centroids, scaler, params, mesh, probe_cap=4)
    for thr in (0.0, 0.5):
        r1 = single.search(x_q, thr, k=5)
        r8 = sharded.search(x_q, thr, k=5)
        np.testing.assert_array_equal(r1.nprobe, r8.nprobe)
        np.testing.assert_array_equal(r1.ndis, r8.ndis)
        for i in range(len(x_q)):
            assert set(r1.ids[i][r1.ids[i] >= 0]) == set(r8.ids[i][r8.ids[i] >= 0])


def _small_index(seed=3, n=800, dim=8, n_bkt=10, tile=128):
    from lira_tpu.partition.assign import build_bucket_layout
    from lira_tpu.partition.kmeans import kmeans_fit
    from lira_tpu.labels.scaler import StandardScaler
    from lira_tpu.models.probing_mlp import init_params
    from lira_tpu.ops.distance import l2_to_centroids
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    x_d = rng.normal(size=(n, dim)).astype(np.float32)
    x_q = rng.normal(size=(30, dim)).astype(np.float32)
    d2b = np.full((n, 2), -1, dtype=np.int32)
    d2b[:, 0] = rng.integers(0, n_bkt, size=n)
    sel = rng.random(n) < 0.15
    d2b[sel, 1] = rng.integers(0, n_bkt, size=sel.sum())
    layout = build_bucket_layout(d2b, n_bkt, tile=tile)
    km = kmeans_fit(x_d, n_bkt, niter=3, seed=0)
    raw = np.asarray(l2_to_centroids(jnp.asarray(x_d), jnp.asarray(km.centroids)))
    scaler = StandardScaler().fit(raw)
    params = init_params(jax.random.PRNGKey(0), n_bkt, dim)
    return x_d, x_q, layout, km, scaler, params


@needs_8
def test_sharded_pallas_matches_gather():
    """The Pallas supertile path and the XLA-gather path must return the same
    neighbor sets on a 128-tile layout."""
    x_d, x_q, layout, km, scaler, params = _small_index()
    mesh = make_mesh(8)
    eng_p = ShardedQueryEngine(x_d, layout, km.centroids, scaler, params, mesh,
                               local_impl="pallas")
    eng_g = ShardedQueryEngine(x_d, layout, km.centroids, scaler, params, mesh,
                               local_impl="gather")
    for thr in (0.0, 0.5, 1.1):
        rp = eng_p.search(x_q, thr, k=5)
        rg = eng_g.search(x_q, thr, k=5)
        np.testing.assert_array_equal(rp.nprobe, rg.nprobe)
        np.testing.assert_array_equal(rp.ndis, rg.ndis)
        for i in range(len(x_q)):
            assert set(rp.ids[i][rp.ids[i] >= 0]) == set(rg.ids[i][rg.ids[i] >= 0]), (thr, i)


@needs_8
@pytest.mark.parametrize("impl", ["pallas", "gather"])
def test_sharded_bf16_matches_f32(impl):
    """bf16 round-1 screen + exact f32 rescore: with the default margin the
    tiny layout's candidate set is exhaustive, so results must be identical."""
    x_d, x_q, layout, km, scaler, params = _small_index(seed=11)
    mesh = make_mesh(8)
    f32 = ShardedQueryEngine(x_d, layout, km.centroids, scaler, params, mesh,
                             local_impl=impl)
    bf16 = ShardedQueryEngine(x_d, layout, km.centroids, scaler, params, mesh,
                              local_impl=impl, scan_dtype="bfloat16")
    import jax.numpy as jnp
    assert bf16.corpus_r1.dtype == jnp.bfloat16
    for thr in (0.0, 0.6):
        r1 = f32.search(x_q, thr, k=5)
        r2 = bf16.search(x_q, thr, k=5)
        np.testing.assert_array_equal(r1.ndis, r2.ndis)
        for i in range(len(x_q)):
            assert set(r1.ids[i][r1.ids[i] >= 0]) == set(r2.ids[i][r2.ids[i] >= 0]), (thr, i)


@needs_8
def test_sharded_kmeans_matches_single_chip():
    """Corpus-sharded Lloyd (psum of per-centroid sums/counts over the mesh)
    must agree with the single-chip _lloyd from the same init: one step to
    float-accumulation error, the 5-iter objective closely, and assignment
    bitwise (same per-row argmin; the mesh only splits the row space)."""
    import jax.numpy as jnp
    from lira_tpu.parallel.sharded_kmeans import (
        sharded_kmeans_assign, sharded_kmeans_fit,
    )
    from lira_tpu.partition.kmeans import _lloyd, kmeans_assign

    rng = np.random.default_rng(5)
    n, d, n_bkt = 997, 16, 12  # uneven n: exercises shard padding weights
    x = rng.normal(size=(n, d)).astype(np.float32)
    init = x[:n_bkt].copy()
    reseed_idx = np.arange(100, 100 + n_bkt)
    mesh = make_mesh(8)

    for niter, tol in ((1, 1e-5), (5, 1e-3)):
        c1, obj1 = _lloyd(
            jnp.asarray(x), jnp.asarray(init), jnp.asarray(reseed_idx),
            n_bkt, niter, n_chunks=1,
        )
        km8 = sharded_kmeans_fit(
            x, n_bkt, mesh, niter=niter, init_centroids=init,
            reseed_vectors=x[reseed_idx],
        )
        np.testing.assert_allclose(km8.centroids, np.asarray(c1), rtol=tol, atol=tol)
        np.testing.assert_allclose(
            km8.objective[-1], float(np.asarray(obj1)[-1]), rtol=1e-4
        )
    assert (np.diff(km8.objective) <= 1e-6).all()  # Lloyd monotone

    a1 = kmeans_assign(x, km8.centroids)
    a8 = sharded_kmeans_assign(x, km8.centroids, mesh)
    np.testing.assert_array_equal(a1, a8)


@needs_8
def test_sharded_int8_matches_f32():
    """int8 quantized round-1 screen sharded over the mesh: the global
    per-dim scale keeps shard scores commensurable at the ICI merge, the
    default margin is exhaustive on this tiny layout — results must be
    identical to the sharded f32 engine AND to the single-chip int8 engine."""
    from lira_tpu.engine.serve import QueryEngine
    import jax.numpy as jnp

    x_d, x_q, layout, km, scaler, params = _small_index(seed=13)
    mesh = make_mesh(8)
    f32 = ShardedQueryEngine(x_d, layout, km.centroids, scaler, params, mesh,
                             local_impl="pallas")
    i8 = ShardedQueryEngine(x_d, layout, km.centroids, scaler, params, mesh,
                            local_impl="pallas", scan_dtype="int8")
    assert i8.corpus_r1.dtype == jnp.int8
    chip = QueryEngine(x_d, layout, km.centroids, scaler, params,
                       scan_impl="blocked", scan_dtype="int8")
    for thr in (0.0, 0.6):
        r1 = f32.search(x_q, thr, k=5)
        r2 = i8.search(x_q, thr, k=5)
        rc = chip.search(x_q, thr, k=5)
        np.testing.assert_array_equal(r1.ndis, r2.ndis)
        np.testing.assert_array_equal(rc.ndis, r2.ndis)
        for i in range(len(x_q)):
            ref = set(r1.ids[i][r1.ids[i] >= 0])
            assert ref == set(r2.ids[i][r2.ids[i] >= 0]), (thr, i)
            assert ref == set(rc.ids[i][rc.ids[i] >= 0]), (thr, i)


@needs_8
@pytest.mark.parametrize("impl", ["pallas", "gather"])
def test_sharded_capacity_mode_matches_f32(impl):
    """store_f32=False on the mesh: one bf16 table per shard serves both
    rounds (0.5× corpus HBM), exact order restored by the host f32 re-rank
    after the ICI merge — sets and exact scores must match the f32 engine,
    search and stream."""
    import jax.numpy as jnp

    x_d, x_q, layout, km, scaler, params = _small_index(seed=17)
    mesh = make_mesh(8)
    f32 = ShardedQueryEngine(x_d, layout, km.centroids, scaler, params, mesh,
                             local_impl=impl)
    cap = ShardedQueryEngine(x_d, layout, km.centroids, scaler, params, mesh,
                             local_impl=impl, scan_dtype="bfloat16",
                             store_f32=False)
    assert cap.corpus.dtype == jnp.bfloat16 and cap.corpus_r1 is cap.corpus
    for thr in (0.0, 0.6):
        r1 = f32.search(x_q, thr, k=5)
        r2 = cap.search(x_q, thr, k=5)
        np.testing.assert_array_equal(r1.ndis, r2.ndis)
        for i in range(len(x_q)):
            assert set(r1.ids[i][r1.ids[i] >= 0]) == set(r2.ids[i][r2.ids[i] >= 0]), (thr, i)
        valid = r2.ids >= 0
        np.testing.assert_allclose(
            np.where(valid, r2.scores, 0), np.where(valid, r1.scores, 0),
            rtol=1e-5, atol=1e-4,
        )
    r_seq = cap.search(x_q, 0.5, k=5)
    r_str = cap.search_stream(x_q, 0.5, k=5, batch_size=8)
    np.testing.assert_array_equal(r_seq.ids, r_str.ids)


@needs_8
def test_sharded_capacity_int8_matches_f32():
    """store_f32=False + int8 on the mesh: ONE int8 table per shard (0.25×
    corpus HBM across the mesh, global per-dim scale so shard scores merge
    commensurably over ICI); exact order restored by the host f32 re-rank
    after the merge — sets and exact scores must match the f32 engine."""
    import jax.numpy as jnp

    x_d, x_q, layout, km, scaler, params = _small_index(seed=17)
    mesh = make_mesh(8)
    f32 = ShardedQueryEngine(x_d, layout, km.centroids, scaler, params, mesh,
                             local_impl="pallas")
    cap = ShardedQueryEngine(x_d, layout, km.centroids, scaler, params, mesh,
                             local_impl="pallas", scan_dtype="int8",
                             store_f32=False)
    assert cap.corpus.dtype == jnp.int8 and cap.corpus_r1 is cap.corpus
    for thr in (0.0, 0.6):
        r1 = f32.search(x_q, thr, k=5)
        r2 = cap.search(x_q, thr, k=5)
        np.testing.assert_array_equal(r1.ndis, r2.ndis)
        for i in range(len(x_q)):
            assert set(r1.ids[i][r1.ids[i] >= 0]) == set(r2.ids[i][r2.ids[i] >= 0]), (thr, i)
        valid = r2.ids >= 0
        np.testing.assert_allclose(
            np.where(valid, r2.scores, 0), np.where(valid, r1.scores, 0),
            rtol=1e-5, atol=1e-4,
        )
    r_seq = cap.search(x_q, 0.5, k=5)
    r_str = cap.search_stream(x_q, 0.5, k=5, batch_size=8)
    np.testing.assert_array_equal(r_seq.ids, r_str.ids)


@needs_8
def test_sharded_int8_rejects_gather_impl():
    x_d, x_q, layout, km, scaler, params = _small_index(seed=13)
    mesh = make_mesh(8)
    with pytest.raises(ValueError, match="int8"):
        ShardedQueryEngine(x_d, layout, km.centroids, scaler, params, mesh,
                           local_impl="gather", scan_dtype="int8")


@needs_8
def test_sharded_prober_matches_single_chip_ivf():
    """Pluggable prober: the sharded engine with the IVF centroid-rank prober
    must match the single-chip QueryEngine with the same prober."""
    from lira_tpu.engine.ivf_baseline import ivf_probe_matrix
    from lira_tpu.engine.serve import QueryEngine

    x_d, x_q, layout, km, scaler, params = _small_index(seed=17)
    cents = np.asarray(km.centroids)
    prober = lambda q: ivf_probe_matrix(q, cents)
    single = QueryEngine(x_d, layout, cents, scaler, params, prober=prober)
    mesh = make_mesh(8)
    sharded = ShardedQueryEngine(x_d, layout, cents, scaler, params, mesh,
                                 prober=prober)
    for thr in (1.0 - 0.5 / 10, 1.0 - 3.5 / 10):  # nprobe 1 and 4 of 10 buckets
        r1 = single.search(x_q, thr, k=5)
        r8 = sharded.search(x_q, thr, k=5)
        np.testing.assert_array_equal(r1.nprobe, r8.nprobe)
        np.testing.assert_array_equal(r1.ndis, r8.ndis)
        for i in range(len(x_q)):
            assert set(r1.ids[i][r1.ids[i] >= 0]) == set(r8.ids[i][r8.ids[i] >= 0]), (thr, i)


@needs_8
def test_sharded_union_build_is_fast_at_scale():
    """Host union construction must stay O(ms) at 2048 blocks x 1024 buckets
    (the round-2 Python double loop was O(n_dev x n_blocks))."""
    import time as _t

    x_d, x_q, layout, km, scaler, params = _small_index(n_bkt=10)
    mesh = make_mesh(8)
    eng = ShardedQueryEngine(x_d, layout, km.centroids, scaler, params, mesh)
    # synthetic big union mask: 2048 blocks, the engine's real bucket count,
    # ~30% buckets probed per block
    rng = np.random.default_rng(0)
    union = rng.random((2048, layout.n_bkt)) < 0.3
    t0 = _t.perf_counter()
    sel, tb, U, chunk = eng._block_unions(union)
    supers, tbs, ulen = eng._super_unions(sel)
    dt = _t.perf_counter() - t0
    # generous bound: the old double loop took minutes at this shape, the
    # vectorized build takes ~20 ms — 20 s still catches an O(n_dev*n_blocks)
    # regression without flaking on a contended single-vCPU runner
    assert dt < 20.0, f"union build took {dt:.2f}s"
    # spot-check correctness of one (device, block) row against a direct build
    d, i = 3, 7
    owned = np.nonzero((eng.local_tile_count[d] > 0) & union[i])[0]
    want = []
    for b in owned:
        s0 = eng.local_tile_start[d, b]
        want.extend(range(s0, s0 + eng.local_tile_count[d, b]))
    got = sel[d, i][sel[d, i] >= 0]
    assert sorted(got.tolist()) == sorted(want)
    ssup = supers[d, i][np.concatenate([[True], np.diff(supers[d, i]) != 0])]
    assert set(ssup.tolist()) >= set(np.unique(np.array(want) // 8).tolist())
    # true union length + last-real padding (the kernel's pad-skip contract)
    n_true = len(set(np.array(want) // 8))
    assert ulen[d, i] == n_true
    assert (supers[d, i][n_true:] == supers[d, i][n_true - 1]).all()


@needs_8
def test_sharded_stream_matches_search():
    """ShardedQueryEngine.search_stream pipelines batches but must return
    bit-identical results to per-batch search() (same sharded programs,
    different dispatch order).  Uneven tail batch included."""
    x_d, x_q, layout, km, scaler, params = _small_index()
    rng = np.random.default_rng(5)
    x_many = rng.normal(size=(70, x_d.shape[1])).astype(np.float32)
    mesh = make_mesh(8)
    eng = ShardedQueryEngine(x_d, layout, km.centroids, scaler, params, mesh)
    for thr in (0.0, 0.5):
        r_seq = eng.search(x_many, thr, k=5)
        r_str = eng.search_stream(x_many, thr, k=5, batch_size=32)
        np.testing.assert_array_equal(r_seq.ids, r_str.ids)
        np.testing.assert_array_equal(r_seq.scores, r_str.scores)
        np.testing.assert_array_equal(r_seq.nprobe, r_str.nprobe)
        np.testing.assert_array_equal(r_seq.ndis, r_str.ndis)
