"""Blocked (query-union) scan parity vs the per-query XLA engine.

The blocked scan is an execution strategy, not a different search: for every
threshold it must return identical neighbor sets, nprobe and ndis to the
reference-semantics per-query scan (engine/serve.py `_scan_probed_tiles`).
"""

import numpy as np
import pytest


def _build(rng, metric, n=1600, dim=16, n_bkt=7, n_mul=2, **eng_kw):
    import jax
    import jax.numpy as jnp
    from lira_tpu.engine.serve import QueryEngine
    from lira_tpu.labels.scaler import StandardScaler
    from lira_tpu.models.probing_mlp import init_params
    from lira_tpu.ops.distance import l2_to_centroids
    from lira_tpu.partition.assign import build_bucket_layout
    from lira_tpu.partition.kmeans import kmeans_fit

    x_d = rng.normal(size=(n, dim)).astype(np.float32)
    x_q = rng.normal(size=(33, dim)).astype(np.float32)
    d2b = np.full((n, n_mul), -1, dtype=np.int32)
    d2b[:, 0] = rng.integers(0, n_bkt, size=n)
    if n_mul > 1:  # replicate a slice of points: exercises dedup-to-k-distinct
        repl = rng.integers(0, n, size=n // 10)
        d2b[repl, 1] = (d2b[repl, 0] + 1) % n_bkt
    layout = build_bucket_layout(d2b, n_bkt, tile=128)
    km = kmeans_fit(x_d, n_bkt, niter=3, seed=0)
    raw = np.asarray(l2_to_centroids(jnp.asarray(x_d), jnp.asarray(km.centroids)))
    scaler = StandardScaler().fit(raw)
    params = init_params(jax.random.PRNGKey(0), n_bkt, dim)

    e_ref = QueryEngine(x_d, layout, km.centroids, scaler, params, metric=metric,
                        n_mul=n_mul, scan_impl="xla")
    e_blk = QueryEngine(x_d, layout, km.centroids, scaler, params, metric=metric,
                        n_mul=n_mul, scan_impl="blocked", **eng_kw)
    return x_q, e_ref, e_blk


@pytest.mark.parametrize("metric", ["L2", "inner_product"])
def test_blocked_matches_xla(rng, metric):
    x_q, e_ref, e_blk = _build(rng, metric)
    for thr in (0.0, 0.45, 0.7):
        r1 = e_ref.search(x_q, thr, k=5)
        r2 = e_blk.search(x_q, thr, k=5)
        np.testing.assert_array_equal(r1.nprobe, r2.nprobe)
        np.testing.assert_array_equal(r1.ndis, r2.ndis)
        for i in range(len(x_q)):
            assert set(r1.ids[i][r1.ids[i] >= 0]) == set(r2.ids[i][r2.ids[i] >= 0]), (thr, i)


def test_blocked_bf16_matches(rng):
    """bf16 round-1 screen + f32 round-2 rescore: exact at default margin."""
    x_q, e_ref, e_blk = _build(rng, "L2", scan_dtype="bfloat16")
    for thr in (0.0, 0.5):
        r1 = e_ref.search(x_q, thr, k=5)
        r2 = e_blk.search(x_q, thr, k=5)
        for i in range(len(x_q)):
            assert set(r1.ids[i][r1.ids[i] >= 0]) == set(r2.ids[i][r2.ids[i] >= 0]), (thr, i)


@pytest.mark.parametrize("metric", ["L2", "inner_product"])
def test_blocked_int8_matches(rng, metric):
    """int8 quantized round-1 screen (symmetric per-dim corpus scale, one
    batch query scale, int32 MXU dot) + exact f32 round 2: with the default
    margin (8·128/sel_rows groups for int8) the tiny layout's candidate set is
    exhaustive, so results must be identical to the f32 per-query engine."""
    x_q, e_ref, e_blk = _build(rng, metric, scan_dtype="int8")
    import jax.numpy as jnp

    assert e_blk._block_state.corpus_flat.dtype == jnp.int8
    assert e_blk._block_state.dim_scale is not None
    for thr in (0.0, 0.5):
        r1 = e_ref.search(x_q, thr, k=5)
        r2 = e_blk.search(x_q, thr, k=5)
        np.testing.assert_array_equal(r1.ndis, r2.ndis)
        for i in range(len(x_q)):
            assert set(r1.ids[i][r1.ids[i] >= 0]) == set(r2.ids[i][r2.ids[i] >= 0]), (thr, i)


def test_blocked_gmin_chunked_matches(rng, monkeypatch):
    """The screen-output HBM budget (_GMIN_BUDGET) chunks block rows so the
    per-block group-min array never materializes across all blocks at once
    (the 20M-scale compile OOM, logs/capacity_20m.log demanded 68 GB).
    Forcing one block per chunk must leave results identical to the
    per-query engine."""
    from lira_tpu.engine import block_scan

    x_q, e_ref, e_blk = _build(rng, "L2", block_q=8)  # 33 queries → 5 blocks
    monkeypatch.setattr(block_scan, "_GMIN_BUDGET", 1)
    block_scan._scan_all.clear_cache()  # same shapes → same jit key
    try:
        for thr in (0.0, 0.45):
            r1 = e_ref.search(x_q, thr, k=5)
            r2 = e_blk.search(x_q, thr, k=5)
            np.testing.assert_array_equal(r1.nprobe, r2.nprobe)
            np.testing.assert_array_equal(r1.ndis, r2.ndis)
            for i in range(len(x_q)):
                assert set(r1.ids[i][r1.ids[i] >= 0]) == set(
                    r2.ids[i][r2.ids[i] >= 0]
                ), (thr, i)
    finally:
        block_scan._scan_all.clear_cache()


def test_blocked_union_chunked_matches(rng, monkeypatch):
    """At ≥50M rows a near-full union makes EVEN ONE block's screen output
    (U·SG, qb) f32 ~8 GB (the 50M demo's compile OOM,
    logs/tpu_50m_demo5.log), so _screen_rescore additionally chunks the
    screen ALONG THE UNION with a running top-kg merge per block.  Forcing
    one-supertile U-slices must leave results identical to the per-query
    engine, and the plan introspection must confirm which branch ran."""
    from lira_tpu.engine import block_scan

    x_q, e_ref, e_blk = _build(rng, "L2", block_q=8)  # 33 queries → 5 blocks

    # default budget at these shapes: single pass, no U-chunking
    e_blk.search(x_q, 0.45, k=5)
    plan0 = block_scan._LAST_CHUNK_PLAN
    assert plan0["u_chunk"] >= plan0["U"]

    # budget = exactly 2 block-outputs: rows chunk (2 per call) but the
    # union stays whole — pins the row-chunk branch explicitly
    budget_rows2 = 2 * plan0["U"] * plan0["sg"] * plan0["qb"] * 4
    monkeypatch.setattr(block_scan, "_GMIN_BUDGET", budget_rows2)
    block_scan._scan_all.clear_cache()
    r1 = e_ref.search(x_q, 0.45, k=5)
    r2 = e_blk.search(x_q, 0.45, k=5)
    plan = block_scan._LAST_CHUNK_PLAN
    assert plan["u_chunk"] >= plan["U"] and plan["rows_per_call"] == 2
    np.testing.assert_array_equal(r1.ndis, r2.ndis)
    for i in range(len(x_q)):
        assert set(r1.ids[i][r1.ids[i] >= 0]) == set(r2.ids[i][r2.ids[i] >= 0]), i

    # budget 1 byte: one-supertile U-slices, running top-kg merge
    monkeypatch.setattr(block_scan, "_GMIN_BUDGET", 1)
    block_scan._scan_all.clear_cache()
    try:
        for thr in (0.0, 0.45):
            r1 = e_ref.search(x_q, thr, k=5)
            r2 = e_blk.search(x_q, thr, k=5)
            plan = block_scan._LAST_CHUNK_PLAN
            assert plan["u_chunk"] == 1 and plan["U"] >= 2, plan
            np.testing.assert_array_equal(r1.nprobe, r2.nprobe)
            np.testing.assert_array_equal(r1.ndis, r2.ndis)
            for i in range(len(x_q)):
                assert set(r1.ids[i][r1.ids[i] >= 0]) == set(
                    r2.ids[i][r2.ids[i] >= 0]
                ), (thr, i)
    finally:
        block_scan._scan_all.clear_cache()


def test_int8_requires_blocked_impl(rng):
    """The per-query xla/pallas paths have no quantized round 1."""
    from lira_tpu.engine.serve import QueryEngine

    x_q, e_ref, _ = _build(rng, "L2", n=256)

    class _Scaler:
        mean_ = np.asarray(e_ref.scaler_mean)
        scale_ = np.asarray(e_ref.scaler_scale)

    with pytest.raises(ValueError, match="int8"):
        QueryEngine(
            e_ref._x_d, e_ref.layout, np.asarray(e_ref.centroids),
            _Scaler(), e_ref.params, scan_impl="xla", scan_dtype="int8",
        )


def test_blocked_small_block_q(rng):
    """Tail blocks (B not a multiple of block_q) must pad correctly."""
    x_q, e_ref, e_blk = _build(rng, "L2", block_q=16)
    r1 = e_ref.search(x_q, 0.5, k=4)
    r2 = e_blk.search(x_q, 0.5, k=4)
    np.testing.assert_array_equal(r1.ndis, r2.ndis)
    for i in range(len(x_q)):
        assert set(r1.ids[i][r1.ids[i] >= 0]) == set(r2.ids[i][r2.ids[i] >= 0])


def test_blocked_empty_and_tiny_buckets(rng):
    """Empty buckets and k > bucket members: -1 fill, no crash."""
    import jax
    import jax.numpy as jnp
    from lira_tpu.engine.serve import QueryEngine
    from lira_tpu.labels.scaler import StandardScaler
    from lira_tpu.models.probing_mlp import init_params
    from lira_tpu.ops.distance import l2_to_centroids
    from lira_tpu.partition.assign import build_bucket_layout
    from lira_tpu.partition.kmeans import kmeans_fit

    n, dim, n_bkt = 40, 8, 6
    x_d = rng.normal(size=(n, dim)).astype(np.float32)
    x_q = rng.normal(size=(5, dim)).astype(np.float32)
    d2b = np.zeros((n, 1), dtype=np.int32)  # all points in bucket 0; 1..5 empty
    layout = build_bucket_layout(d2b, n_bkt, tile=128)
    km = kmeans_fit(x_d, n_bkt, niter=2, seed=0)
    raw = np.asarray(l2_to_centroids(jnp.asarray(x_d), jnp.asarray(km.centroids)))
    scaler = StandardScaler().fit(raw)
    params = init_params(jax.random.PRNGKey(0), n_bkt, dim)
    eng = QueryEngine(x_d, layout, km.centroids, scaler, params, scan_impl="blocked")

    res = eng.search(x_q, 0.0, k=50)  # k > n: padded with -1
    assert res.ids.shape == (5, 50)
    gt = np.argsort(((x_d[None] - x_q[:, None]) ** 2).sum(-1), axis=1)
    for i in range(5):
        got = res.ids[i][res.ids[i] >= 0]
        assert set(got) == set(gt[i])  # every real point found exactly once
        assert (res.ids[i][len(got):] == -1).all()


@pytest.mark.parametrize("metric", ["L2", "inner_product"])
def test_blocked_matches_xla_k100(rng, metric):
    """The reference large-scale default is k=100 (LIRA_largescale.py:27-49):
    fetch_k=200, kg=208 — the wide-candidate regime the per-query Pallas
    kernel refuses (>128) and round 2 must still rescore exactly."""
    x_q, e_ref, e_blk = _build(rng, metric, n=6400, n_bkt=9)
    for thr in (0.0, 0.5):
        r1 = e_ref.search(x_q, thr, k=100)
        r2 = e_blk.search(x_q, thr, k=100)
        np.testing.assert_array_equal(r1.nprobe, r2.nprobe)
        np.testing.assert_array_equal(r1.ndis, r2.ndis)
        for i in range(len(x_q)):
            assert set(r1.ids[i][r1.ids[i] >= 0]) == set(r2.ids[i][r2.ids[i] >= 0]), (thr, i)


def test_blocked_bf16_k100(rng):
    """bf16 screen at k=100: tiny corpus -> candidate set exhaustive, so the
    f32 rescore must recover identical neighbor sets."""
    x_q, e_ref, e_blk = _build(rng, "L2", n=3200, scan_dtype="bfloat16")
    r1 = e_ref.search(x_q, 0.3, k=100)
    r2 = e_blk.search(x_q, 0.3, k=100)
    for i in range(len(x_q)):
        assert set(r1.ids[i][r1.ids[i] >= 0]) == set(r2.ids[i][r2.ids[i] >= 0]), i


@pytest.mark.parametrize("sel_rows", [32, 64])
def test_blocked_subtile_selection_matches(rng, sel_rows):
    """Group-granular round-2 selection (sel_rows < 128) is an execution
    strategy: results must equal the per-query oracle engine exactly."""
    x_q, e_ref, e_blk = _build(rng, "L2", block_sel_rows=sel_rows)
    for thr in (0.0, 0.45, 0.7):
        r1 = e_ref.search(x_q, thr, k=5)
        r2 = e_blk.search(x_q, thr, k=5)
        np.testing.assert_array_equal(r1.nprobe, r2.nprobe)
        np.testing.assert_array_equal(r1.ndis, r2.ndis)
        for i in range(len(x_q)):
            assert set(r1.ids[i][r1.ids[i] >= 0]) == set(r2.ids[i][r2.ids[i] >= 0]), (thr, i)


def test_blocked_subtile_bf16(rng):
    x_q, e_ref, e_blk = _build(rng, "L2", scan_dtype="bfloat16", block_sel_rows=32)
    r1 = e_ref.search(x_q, 0.4, k=5)
    r2 = e_blk.search(x_q, 0.4, k=5)
    for i in range(len(x_q)):
        assert set(r1.ids[i][r1.ids[i] >= 0]) == set(r2.ids[i][r2.ids[i] >= 0]), i


def test_from_corpus_matches_host_construction():
    """Streamed device-scatter construction must produce identical state to
    the host padded-table path, including duplicated (redundancy) rows."""
    import jax.numpy as jnp

    from lira_tpu.engine.block_scan import BlockScanState
    from lira_tpu.partition.assign import build_bucket_layout

    rng = np.random.default_rng(11)
    n, d, n_bkt, tile = 900, 16, 6, 128
    x_d = rng.normal(size=(n, d)).astype(np.float32)
    d2b = np.full((n, 2), -1, np.int32)
    d2b[:, 0] = rng.integers(0, n_bkt, size=n)
    dup = rng.choice(n, size=200, replace=False)  # duplicated rows
    d2b[dup, 1] = (d2b[dup, 0] + 1) % n_bkt
    layout = build_bucket_layout(d2b, n_bkt, tile=tile)
    tile_bucket = np.repeat(
        np.arange(n_bkt, dtype=np.int32), layout.padded_sizes // tile
    )

    host = BlockScanState(
        layout.gather_vectors(x_d), layout.padded_ids, tile_bucket, "L2",
        jnp.float32, tile=tile,
    )
    dev = BlockScanState.from_corpus(
        x_d, layout.padded_ids, tile_bucket, "L2", jnp.float32, tile=tile,
        chunk_rows=256,  # force several scatter chunks
    )
    np.testing.assert_array_equal(np.asarray(host.tiles_ids), np.asarray(dev.tiles_ids))
    np.testing.assert_array_equal(
        np.asarray(host.corpus_flat_f32), np.asarray(dev.corpus_flat_f32)
    )
    np.testing.assert_allclose(np.asarray(host.bsq), np.asarray(dev.bsq))
    np.testing.assert_array_equal(host.tile_bucket, dev.tile_bucket)


def test_stream_matches_sequential_batches(rng):
    """search_stream pipelines batches (probe i+1 dispatched before batch
    i's results are fetched) but must return bit-identical results to
    per-batch search() calls — same device programs, different dispatch
    order.  Covers an uneven tail batch and both scan dtypes."""
    x_q, e_ref, e_blk = _build(rng, "L2")
    x_many = rng.normal(size=(150, x_q.shape[1])).astype(np.float32)
    for thr in (0.0, 0.5):
        r_seq = e_blk.search(x_many, thr, k=5)
        r_str = e_blk.search_stream(x_many, thr, k=5, batch_size=64)
        np.testing.assert_array_equal(r_seq.ids, r_str.ids)
        np.testing.assert_array_equal(r_seq.scores, r_str.scores)
        np.testing.assert_array_equal(r_seq.nprobe, r_str.nprobe)
        np.testing.assert_array_equal(r_seq.ndis, r_str.ndis)


def test_capacity_mode_matches_f32(rng):
    """store_f32=False (capacity mode): one bf16 table serves both rounds
    (0.5× corpus HBM) with a host f32 re-rank over over-fetched candidates.
    On this tiny corpus the default margin + slack are exhaustive, so
    neighbor sets AND exact scores must match the all-f32 engine."""
    from lira_tpu.engine.serve import QueryEngine
    import jax.numpy as jnp

    x_q, e_ref, e_cap = _build(rng, "L2", scan_dtype="bfloat16", store_f32=False)
    assert e_cap._block_state.corpus_flat_f32.dtype == jnp.bfloat16  # no f32 copy
    assert e_cap._block_state.corpus_flat is e_cap._block_state.corpus_flat_f32
    for thr in (0.0, 0.5):
        r1 = e_ref.search(x_q, thr, k=5)
        r2 = e_cap.search(x_q, thr, k=5)
        np.testing.assert_array_equal(r1.ndis, r2.ndis)
        for i in range(len(x_q)):
            assert set(r1.ids[i][r1.ids[i] >= 0]) == set(r2.ids[i][r2.ids[i] >= 0]), (thr, i)
        # exact host re-rank: scores of valid slots agree with the f32 engine
        valid = r2.ids >= 0
        np.testing.assert_allclose(
            np.where(valid, r2.scores, 0), np.where(valid, r1.scores, 0),
            rtol=1e-5, atol=1e-4,
        )
    # stream path shares the over-fetch + re-rank
    x_many = rng.normal(size=(100, x_q.shape[1])).astype(np.float32)
    r_seq = e_cap.search(x_many, 0.4, k=5)
    r_str = e_cap.search_stream(x_many, 0.4, k=5, batch_size=32)
    np.testing.assert_array_equal(r_seq.ids, r_str.ids)


@pytest.mark.parametrize("metric", ["L2", "inner_product"])
def test_capacity_int8_matches_f32(rng, metric):
    """store_f32=False with scan_dtype='int8': ONE int8 table serves both
    rounds (0.25× corpus HBM) — round 2 dequantizes via the per-dim scale
    folded into the query, exact row norms come from the raw f32 corpus,
    and the host f32 re-rank restores exact order.  On this tiny corpus the
    default margin + slack are exhaustive, so neighbor sets AND exact
    scores must match the all-f32 engine."""
    from lira_tpu.engine.serve import QueryEngine
    import jax.numpy as jnp

    x_q, e_ref, e_cap = _build(rng, metric, scan_dtype="int8", store_f32=False)
    st = e_cap._block_state
    assert st.corpus_flat_f32.dtype == jnp.int8  # no f32/bf16 copy anywhere
    assert st.corpus_flat is st.corpus_flat_f32
    assert st.rescore_arg is None  # one program parameter, not two
    assert st.dim_scale is not None
    for thr in (0.0, 0.5):
        r1 = e_ref.search(x_q, thr, k=5)
        r2 = e_cap.search(x_q, thr, k=5)
        np.testing.assert_array_equal(r1.ndis, r2.ndis)
        for i in range(len(x_q)):
            assert set(r1.ids[i][r1.ids[i] >= 0]) == set(r2.ids[i][r2.ids[i] >= 0]), (thr, i)
        # exact host re-rank: scores of valid slots agree with the f32 engine
        valid = r2.ids >= 0
        np.testing.assert_allclose(
            np.where(valid, r2.scores, 0), np.where(valid, r1.scores, 0),
            rtol=1e-5, atol=1e-4,
        )
    # stream path shares the over-fetch + re-rank
    x_many = rng.normal(size=(100, x_q.shape[1])).astype(np.float32)
    r_seq = e_cap.search(x_many, 0.4, k=5)
    r_str = e_cap.search_stream(x_many, 0.4, k=5, batch_size=32)
    np.testing.assert_array_equal(r_seq.ids, r_str.ids)


def test_capacity_int8_from_host_table(rng):
    """The padded-host-table constructor's int8 capacity path (host-side
    quantization + exact host norms) matches from_corpus bit-for-bit."""
    import jax.numpy as jnp
    from lira_tpu.engine.block_scan import BlockScanState
    from lira_tpu.partition.assign import build_bucket_layout

    n, dim, n_bkt = 900, 16, 5
    x_d = rng.normal(size=(n, dim)).astype(np.float32)
    d2b = np.full((n, 1), -1, np.int32)
    d2b[:, 0] = rng.integers(0, n_bkt, size=n)
    layout = build_bucket_layout(d2b, n_bkt, tile=128)
    tile_bucket = np.repeat(
        np.arange(n_bkt, dtype=np.int32), layout.padded_sizes // 128
    )
    padded = layout.gather_vectors(x_d)
    st_a = BlockScanState(padded, layout.padded_ids, tile_bucket, "L2",
                          jnp.int8, store_f32=False)
    st_b = BlockScanState.from_corpus(x_d, layout.padded_ids, tile_bucket,
                                      "L2", jnp.int8, store_f32=False,
                                      chunk_rows=257)
    assert st_a.corpus_flat_f32.dtype == jnp.int8
    assert st_b.corpus_flat_f32.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(st_a.dim_scale), np.asarray(st_b.dim_scale))
    np.testing.assert_array_equal(np.asarray(st_a.corpus_flat), np.asarray(st_b.corpus_flat))
    np.testing.assert_allclose(np.asarray(st_a.bsq), np.asarray(st_b.bsq), rtol=1e-6)


@pytest.mark.parametrize("metric,scan_dtype", [
    ("L2", "float32"), ("L2", "bfloat16"), ("L2", "int8"),
    ("inner_product", "float32"), ("inner_product", "int8"),
])
def test_allpad_groups_never_displace(rng, metric, scan_dtype):
    """Pad rows are stored as copies of the bucket's last real row, so
    all-pad selection groups carry a REAL row's (possibly globally best)
    score — if the per-group bucket map didn't mask them, they would
    displace true groups from the top-kg selection and drop neighbors.

    20 single-point buckets → each 128-row tile is 1 real + 127 pads: at
    sel_rows=32 that is 20 mixed + 60 all-pad groups, and kg (fetch_k +
    margin) < 20, so any unmasked all-pad duplicate of a strong bucket
    would push a true bucket's group out.  Results must equal brute force
    at thr 0 (all buckets probed)."""
    import jax
    import jax.numpy as jnp
    from lira_tpu.engine.serve import QueryEngine
    from lira_tpu.labels.scaler import StandardScaler
    from lira_tpu.models.probing_mlp import init_params
    from lira_tpu.ops.distance import l2_to_centroids
    from lira_tpu.partition.assign import build_bucket_layout
    from lira_tpu.partition.kmeans import kmeans_fit

    n, dim, n_bkt = 20, 16, 20
    x_d = rng.normal(size=(n, dim)).astype(np.float32)
    x_q = rng.normal(size=(9, dim)).astype(np.float32)
    d2b = np.arange(n, dtype=np.int32)[:, None]  # one point per bucket
    layout = build_bucket_layout(d2b, n_bkt, tile=128)
    km = kmeans_fit(x_d, n_bkt, niter=2, seed=0)
    raw = np.asarray(l2_to_centroids(jnp.asarray(x_d), jnp.asarray(km.centroids)))
    scaler = StandardScaler().fit(raw)
    params = init_params(jax.random.PRNGKey(0), n_bkt, dim)
    eng = QueryEngine(
        x_d, layout, km.centroids, scaler, params, metric=metric, n_mul=1,
        scan_impl="blocked", scan_dtype=scan_dtype, block_sel_rows=32,
        block_margin=4,  # keep kg = 5 + 4 < 20 so displacement would bite
    )
    assert int(np.asarray(eng._block_state.tile_pad_count)[:n_bkt].min()) == 127
    r = eng.search(x_q, 0.0, k=5)
    if metric == "inner_product":
        gt_scores = -(x_q @ x_d.T)
    else:
        gt_scores = (x_d[None] ** 2).sum(-1) - 2.0 * (x_q @ x_d.T)
    gt = np.argsort(gt_scores, axis=1, kind="stable")[:, :5]
    for i in range(len(x_q)):
        assert set(r.ids[i][r.ids[i] >= 0]) == set(gt[i]), (metric, scan_dtype, i)


def test_rescore_arg_aliases_shared_table(rng):
    """When the rescore table IS the screen table (f32 and capacity modes),
    the jitted scan must receive it as ONE program parameter: passing the
    identical array twice makes XLA's compile-time HBM bound count the
    table twice — an 18.6 GB 'arguments' compile OOM at the 10M demo's
    19.2M-row table (logs/tpu_10m_hard_run4.log)."""
    _, _, e_f32 = _build(rng, "L2")
    st = e_f32._block_state
    assert st.corpus_flat is st.corpus_flat_f32
    assert st.rescore_arg is None
    _, _, e_cap = _build(rng, "L2", scan_dtype="bfloat16", store_f32=False)
    assert e_cap._block_state.rescore_arg is None
    _, _, e_bf16 = _build(rng, "L2", scan_dtype="bfloat16")
    assert e_bf16._block_state.rescore_arg is e_bf16._block_state.corpus_flat_f32
    _, _, e_i8 = _build(rng, "L2", scan_dtype="int8")
    assert e_i8._block_state.rescore_arg is e_i8._block_state.corpus_flat_f32


def test_capacity_mode_requires_bf16_blocked(rng):
    from lira_tpu.engine.serve import QueryEngine

    x_q, e_ref, _ = _build(rng, "L2", n=256)

    class _Scaler:
        mean_ = np.asarray(e_ref.scaler_mean)
        scale_ = np.asarray(e_ref.scaler_scale)

    with pytest.raises(ValueError, match="capacity"):
        QueryEngine(e_ref._x_d, e_ref.layout, np.asarray(e_ref.centroids),
                    _Scaler(), e_ref.params, scan_impl="blocked",
                    scan_dtype="float32", store_f32=False)


def test_stream_int8_matches_search(rng):
    """Stream path through the int8 quantized screen: bit-identical to
    per-batch search (same device programs, different dispatch order)."""
    x_q, e_ref, e_blk8 = _build(rng, "L2", scan_dtype="int8")
    x_many = rng.normal(size=(100, x_q.shape[1])).astype(np.float32)
    r_seq = e_blk8.search(x_many, 0.4, k=5)
    r_str = e_blk8.search_stream(x_many, 0.4, k=5, batch_size=32)
    np.testing.assert_array_equal(r_seq.ids, r_str.ids)
    np.testing.assert_array_equal(r_seq.ndis, r_str.ndis)


def test_stream_bf16_and_prober(rng):
    """Stream path through the bf16 screen and the pluggable-prober branch."""
    x_q, e_ref, e_blk16 = _build(rng, "L2", scan_dtype="bfloat16")
    x_many = rng.normal(size=(100, x_q.shape[1])).astype(np.float32)
    r_seq = e_blk16.search(x_many, 0.4, k=5)
    r_str = e_blk16.search_stream(x_many, 0.4, k=5, batch_size=32)
    np.testing.assert_array_equal(r_seq.ids, r_str.ids)

    # prober branch: identical scores via the engine's own probe → results
    # must match the MLP path exactly
    from lira_tpu.engine.serve import QueryEngine

    e_prob = QueryEngine(
        e_blk16._x_d, e_blk16.layout, np.asarray(e_blk16.centroids),
        _scaler_of(e_blk16), e_blk16.params, scan_impl="blocked",
        prober=lambda q: e_blk16.probe(q),
    )
    r_p = e_prob.search_stream(x_many, 0.4, k=5, batch_size=32)
    np.testing.assert_array_equal(r_p.nprobe, r_seq.nprobe)
    np.testing.assert_array_equal(r_p.ndis, r_seq.ndis)
    for i in range(len(x_many)):
        assert set(r_p.ids[i][r_p.ids[i] >= 0]) == set(r_seq.ids[i][r_seq.ids[i] >= 0])


def _scaler_of(eng):
    from lira_tpu.labels.scaler import StandardScaler

    s = StandardScaler()
    s.mean_ = np.asarray(eng.scaler_mean)
    s.scale_ = np.asarray(eng.scaler_scale)
    return s


def test_query_buffer_mutation_not_served_stale(rng):
    """The sweep-upload cache must verify CONTENT: a serving loop that
    refills one preallocated query buffer in place must get results for the
    new vectors, not the first batch's (the identity-keyed cache bug)."""
    x_q, e_ref, e_blk = _build(rng, "L2")
    buf = np.array(x_q, np.float32)  # reused buffer
    r1 = e_blk.search(buf, 0.0, k=5)
    other = rng.normal(size=x_q.shape).astype(np.float32)
    buf[:] = other  # in-place refill, same object
    r2 = e_blk.search(buf, 0.0, k=5)
    want = e_ref.search(other, 0.0, k=5)
    for i in range(len(buf)):
        assert set(r2.ids[i][r2.ids[i] >= 0]) == set(want.ids[i][want.ids[i] >= 0])
    # and the cache still hits for a true repeat (same content)
    r3 = e_blk.search(buf, 0.0, k=5)
    np.testing.assert_array_equal(r2.ids, r3.ids)


def test_blocked_rejects_non128_tile(rng):
    """The blocked kernel is built on 128-row tiles; other layouts must be
    rejected loudly instead of scanning wrong rows."""
    import jax
    import jax.numpy as jnp
    from lira_tpu.engine.serve import QueryEngine
    from lira_tpu.labels.scaler import StandardScaler
    from lira_tpu.models.probing_mlp import init_params
    from lira_tpu.ops.distance import l2_to_centroids
    from lira_tpu.partition.assign import build_bucket_layout
    from lira_tpu.partition.kmeans import kmeans_fit

    x_d = rng.normal(size=(600, 8)).astype(np.float32)
    d2b = rng.integers(0, 4, size=(600, 1)).astype(np.int32)
    layout = build_bucket_layout(d2b, 4, tile=16)
    km = kmeans_fit(x_d, 4, niter=2, seed=0)
    raw = np.asarray(l2_to_centroids(jnp.asarray(x_d), jnp.asarray(km.centroids)))
    sc = StandardScaler().fit(raw)
    params = init_params(jax.random.PRNGKey(0), 4, 8)
    with pytest.raises(ValueError, match="128-row tile"):
        QueryEngine(x_d, layout, km.centroids, sc, params, scan_impl="blocked")


def test_empty_batch_and_gt_padding(rng):
    """Empty query batches return empty results on every path; -1 gt
    padding never counts as a hit against -1 result padding."""
    x_q, e_ref, e_blk = _build(rng, "L2")
    for eng in (e_ref, e_blk):
        r = eng.search(np.zeros((0, x_q.shape[1]), np.float32), 0.5, 5)
        assert r.ids.shape == (0, 5) and r.ndis.shape == (0,)
    r = e_blk.search_stream(np.zeros((0, x_q.shape[1]), np.float32), 0.5, 5)
    assert r.ids.shape == (0, 5)

    res = np.array([[3, -1, -1]])
    gt = np.array([[3, -1, -1]])
    rec = e_blk.recall_against(res, gt, 3)
    assert rec[0] == pytest.approx(1 / 3)  # only the real id counts


@pytest.mark.parametrize("scan_dtype", ["float32", "bfloat16", "int8"])
def test_heterogeneous_union_lengths_match_oracle(rng, scan_dtype):
    """Pad-skip contract (_union_groupmin_kernel ulen predication): with
    many small query blocks whose TRUE union lengths differ wildly — some
    near the padded pow2 width U, some a single supertile — the blocked
    engine must stay identical to the per-query oracle.  An off-by-one in
    the kernel's live predicate (skipping a REAL slot, or scoring a pad as
    live against an unmasked garbage supertile) flips neighbor sets here."""
    import jax
    import jax.numpy as jnp

    from lira_tpu.engine.block_scan import build_block_unions
    from lira_tpu.engine.serve import QueryEngine
    from lira_tpu.labels.scaler import StandardScaler
    from lira_tpu.models.probing_mlp import init_params
    from lira_tpu.ops.distance import l2_to_centroids
    from lira_tpu.partition.assign import build_bucket_layout
    from lira_tpu.partition.kmeans import kmeans_fit

    # zipf bucket sizes: one giant bucket (20 tiles) + a tail of tiny ones,
    # so a block probing the giant unions many supertiles and one probing
    # only tiny buckets unions a single supertile
    n, dim, n_bkt = 6400, 16, 9
    sizes = np.array([2600, 1800, 900, 500, 300, 150, 80, 50, 20])
    assert sizes.sum() == n
    assign = np.repeat(np.arange(n_bkt), sizes).astype(np.int32)
    x_d = rng.normal(size=(n, dim)).astype(np.float32)
    x_q = rng.normal(size=(64, dim)).astype(np.float32)
    layout = build_bucket_layout(assign.reshape(-1, 1), n_bkt, tile=128)
    km = kmeans_fit(x_d, n_bkt, niter=3, seed=0)
    raw = np.asarray(l2_to_centroids(jnp.asarray(x_d), jnp.asarray(km.centroids)))
    scaler = StandardScaler().fit(raw)
    params = init_params(jax.random.PRNGKey(0), n_bkt, dim)
    # deterministic pluggable prober (both engines share it): queries whose
    # top bucket is tiny probe ONLY it (argmax fallback), the rest probe a
    # 4-bucket run that includes the giants — per-block unions then span
    # 1 supertile .. the full corpus
    OUT = np.full((64, n_bkt), 0.05, np.float32)
    for i in range(64):
        p = i % n_bkt
        OUT[i, p] = 0.9
        if p < 4:
            OUT[i, p + 1 : p + 4] = 0.6
    prober = lambda qs: OUT[: len(qs)]
    e_ref = QueryEngine(x_d, layout, km.centroids, scaler, params,
                        scan_impl="xla", prober=prober)
    e_blk = QueryEngine(x_d, layout, km.centroids, scaler, params,
                        scan_impl="blocked", scan_dtype=scan_dtype, block_q=8,
                        prober=prober)

    for thr in (0.0, 0.45, 0.7):
        r1 = e_ref.search(x_q, thr, k=5)
        r2 = e_blk.search(x_q, thr, k=5)
        np.testing.assert_array_equal(r1.ndis, r2.ndis)
        for i in range(len(x_q)):
            assert set(r1.ids[i][r1.ids[i] >= 0]) == set(
                r2.ids[i][r2.ids[i] >= 0]
            ), (scan_dtype, thr, i)

    # the scenario must actually exercise heterogeneity: rebuild the unions
    # the engine served and assert the true lengths differ across blocks
    from lira_tpu.engine import block_scan as bs

    state = e_blk._block_state
    hb = bs._probe_batch(state, e_blk, x_q, 0.45, 8)
    union = np.asarray(hb["union"])
    supers, tb, ulen = build_block_unions(
        union, e_blk.tile_start, e_blk.tiles_per_bucket, state.tile_bucket
    )
    assert ulen.min() < ulen.max(), "test corpus produced uniform unions"
    assert supers.shape[1] >= ulen.max()
    # pad slots repeat the last real supertile
    for i in range(len(ulen)):
        if ulen[i] and ulen[i] < supers.shape[1]:
            assert (supers[i, ulen[i]:] == supers[i, ulen[i] - 1]).all()


def test_screen_qb_cap_clamps_at_wide_dims():
    """ADVICE r4: when the VMEM budget goes negative (f32 d>1280, bf16
    d>1920, int8 d>2560) the cap must clamp to the 8 minimum, not return a
    spuriously large pow2 from a negative int's bit_length."""
    import jax.numpy as jnp

    from lira_tpu.engine.block_scan import _screen_qb_cap

    # production geometry keeps the measured-optimal 1024
    assert _screen_qb_cap(128, jnp.bfloat16) >= 1024
    assert _screen_qb_cap(128, jnp.int8) >= 1024
    # negative-avail regime: minimum, never a blowup
    assert _screen_qb_cap(1536, jnp.float32) == 8
    assert _screen_qb_cap(2048, jnp.bfloat16) == 8
    assert _screen_qb_cap(4096, jnp.int8) == 8
    # wide-but-fitting dims return a sane intermediate pow2
    cap_960 = _screen_qb_cap(960, jnp.bfloat16)
    assert cap_960 in (128, 256, 512) and cap_960 >= 8


def test_wire_formats(rng):
    """Result D2H wire formats: 'pack32' (ids + bitcast-f32 scores fused
    into ONE transfer — the default) must be BIT-exact vs the legacy
    two-transfer 'f32' wire on both the sync and stream paths; 'bf16'
    (scores shipped as bfloat16 beside exact split-u16 ids, 25% fewer
    wire bytes) keeps ids exact and degrades only the reported score by
    bfloat16 rounding."""
    from lira_tpu.engine.serve import QueryEngine

    x_q, e_ref, e_pack = _build(rng, "L2")
    assert e_pack.wire == "pack32"

    def clone(wire):
        return QueryEngine(
            e_pack._x_d, e_pack.layout, np.asarray(e_pack.centroids),
            _scaler_of(e_pack), e_pack.params, scan_impl="blocked", wire=wire,
        )

    e_f32, e_bf16 = clone("f32"), clone("bf16")
    x_many = rng.normal(size=(100, x_q.shape[1])).astype(np.float32)
    for thr in (0.0, 0.5):
        r32 = e_f32.search(x_many, thr, k=5)
        rp = e_pack.search(x_many, thr, k=5)
        np.testing.assert_array_equal(r32.ids, rp.ids)
        np.testing.assert_array_equal(r32.scores, rp.scores)  # bitwise
        rb = e_bf16.search(x_many, thr, k=5)
        np.testing.assert_array_equal(r32.ids, rb.ids)
        np.testing.assert_allclose(r32.scores, rb.scores, rtol=1e-2)

    # stream path (pipelined batches, packed single-array fetch)
    r32 = e_f32.search(x_many, 0.5, k=5)
    r_str = e_pack.search_stream(x_many, 0.5, k=5, batch_size=32)
    np.testing.assert_array_equal(r_str.ids, r32.ids)
    np.testing.assert_array_equal(r_str.scores, r32.scores)
    rb_str = e_bf16.search_stream(x_many, 0.5, k=5, batch_size=32)
    np.testing.assert_array_equal(rb_str.ids, r32.ids)
    np.testing.assert_allclose(rb_str.scores, r32.scores, rtol=1e-2)
