import jax
import jax.numpy as jnp
import numpy as np

from lira_tpu.models.probing_mlp import init_params, forward, forward_logits, param_count
from lira_tpu.models.train import make_train_state, train_epoch, evaluate, infer
from lira_tpu.models.metrics import probing_metrics
from lira_tpu.labels.distr import gt_bucket_map


def test_forward_shapes_and_range():
    params = init_params(jax.random.PRNGKey(0), n_bkt=8, dim=16)
    out = forward(params, jnp.ones((5, 8)), jnp.ones((5, 16)))
    assert out.shape == (5, 8)
    assert ((out > 0) & (out < 1)).all()
    logits = forward_logits(params, jnp.ones((5, 8)), jnp.ones((5, 16)))
    np.testing.assert_allclose(np.asarray(jax.nn.sigmoid(logits)), np.asarray(out), rtol=1e-6)


def test_param_count():
    # dist: 8*128+128 + 128*64+64; vec: 16*128+128 + 128*64+64; head: 128*128+128 + 128*8+8
    params = init_params(jax.random.PRNGKey(0), n_bkt=8, dim=16)
    expected = (8 * 128 + 128) + (128 * 64 + 64) + (16 * 128 + 128) + (128 * 64 + 64) + (
        128 * 128 + 128
    ) + (128 * 8 + 8)
    assert param_count(params) == expected


def test_training_reduces_loss(rng):
    # learnable task: label = one-hot of argmin distance feature
    n, n_bkt, dim = 512, 8, 16
    dist = rng.normal(size=(n, n_bkt)).astype(np.float32)
    vec = rng.normal(size=(n, dim)).astype(np.float32)
    targets = np.zeros((n, n_bkt), dtype=np.float32)
    targets[np.arange(n), dist.argmin(axis=1)] = 1.0

    state = make_train_state(seed=0, n_bkt=n_bkt, dim=dim, lr=1e-3)
    _, _, loss0, _ = evaluate(state, dist, vec, targets)
    for _ in range(30):
        state, _ = train_epoch(state, dist, vec, targets, batch_size=64)
    _, _, loss1, _ = evaluate(state, dist, vec, targets)
    assert loss1 < loss0 * 0.7


def test_evaluate_loss_matches_manual(rng):
    n, n_bkt, dim = 100, 4, 8
    state = make_train_state(seed=1, n_bkt=n_bkt, dim=dim)
    dist = rng.normal(size=(n, n_bkt)).astype(np.float32)
    vec = rng.normal(size=(n, dim)).astype(np.float32)
    targets = (rng.random((n, n_bkt)) < 0.3).astype(np.float32)
    t, predicts, loss, outputs = evaluate(state, dist, vec, targets, batch_size=32)
    # manual BCE with the same batch partition (sizes 32,32,32,4)
    eps = 1e-12
    o = np.clip(outputs.astype(np.float64), eps, 1 - eps)
    per_row = -(targets * np.log(o) + (1 - targets) * np.log(1 - o)).mean(axis=1)
    manual = np.mean([per_row[s : s + 32].mean() for s in range(0, n, 32)])
    np.testing.assert_allclose(loss, manual, rtol=1e-4)
    np.testing.assert_array_equal(predicts, outputs > 0.5)


def test_train_partial_batch_equivalence(rng):
    # n not divisible by batch: padded rows must not change the first-batch grads
    n, n_bkt, dim = 70, 4, 8
    dist = rng.normal(size=(n, n_bkt)).astype(np.float32)
    vec = rng.normal(size=(n, dim)).astype(np.float32)
    targets = (rng.random((n, n_bkt)) < 0.3).astype(np.float32)
    s1 = make_train_state(seed=2, n_bkt=n_bkt, dim=dim)
    s1, loss = train_epoch(s1, dist, vec, targets, batch_size=64)
    assert np.isfinite(loss)


def test_infer_matches_evaluate(rng):
    n, n_bkt, dim = 50, 4, 8
    state = make_train_state(seed=3, n_bkt=n_bkt, dim=dim)
    dist = rng.normal(size=(n, n_bkt)).astype(np.float32)
    vec = rng.normal(size=(n, dim)).astype(np.float32)
    targets = np.zeros((n, n_bkt), dtype=np.float32)
    _, predicts_e, _, outputs_e = evaluate(state, dist, vec, targets)
    predicts_i, outputs_i = infer(state, dist, vec)
    np.testing.assert_allclose(outputs_i, outputs_e, rtol=1e-6)
    np.testing.assert_array_equal(predicts_i, predicts_e)


def test_probing_metrics():
    predicts = np.array([[1, 1, 0, 0], [0, 0, 0, 0]], dtype=bool)
    targets = np.array([[1, 0, 1, 0], [0, 0, 0, 0]], dtype=bool)
    knn = np.array([[0, 1], [2, 3]])
    d2b = np.array([[0, -1], [2, -1], [1, -1], [3, -1]])
    gtb = gt_bucket_map(knn, d2b)
    cnts = np.array([10, 20, 30, 40])
    m = probing_metrics(predicts, targets, gtb, cnts, k=2, epoch=0, loss=0.5)
    assert m["nprobe predict"] == 1.0  # (2+0)/2
    assert m["nprobe target"] == 1.0
    # row0: TP=1, targets=2 -> 0.5; row1 has no targets -> excluded
    assert m["Hit Rate"] == 0.5
    # accuracy: row0 2 wrong of 4; row1 all right -> 6/8
    assert m["Accuracy"] == 0.75
    # label recall: q0 probes {0,1}: nn0 in b0 yes, nn1 in b2 no -> 0.5; q1 probes {} -> 0
    assert m["KNN Recall"] == 0.25
    # computations: q0: 10+20; q1: 0 -> mean 15
    assert m["KNN Computations"] == 15.0


def test_predict_counts_matches_infer(rng):
    from lira_tpu.models.train import predict_counts

    n, n_bkt, dim = 70, 4, 8
    state = make_train_state(seed=5, n_bkt=n_bkt, dim=dim)
    dist = rng.normal(size=(n, n_bkt)).astype(np.float32)
    vec = rng.normal(size=(n, dim)).astype(np.float32)
    predicts, _ = infer(state, dist, vec, sigma=0.5)
    counts = predict_counts(state, dist, vec, sigma=0.5, chunk=32)
    np.testing.assert_array_equal(counts, predicts.sum(axis=1).astype(np.int32))


def test_predict_counts_and_subset_infer_on_device_arrays(rng):
    """smallscale promotes features to jax arrays on TPU; predict_counts and
    the selected-rows fancy-index gather must work on them too."""
    import jax.numpy as jnp

    from lira_tpu.models.train import predict_counts

    n, n_bkt, dim = 64, 4, 8
    state = make_train_state(seed=7, n_bkt=n_bkt, dim=dim)
    dist = rng.normal(size=(n, n_bkt)).astype(np.float32)
    vec = rng.normal(size=(n, dim)).astype(np.float32)
    dist_dev, vec_dev = jnp.asarray(dist), jnp.asarray(vec)
    counts_dev = predict_counts(state, dist_dev, vec_dev, chunk=16)
    counts_np = predict_counts(state, dist, vec, chunk=16)
    np.testing.assert_array_equal(counts_dev, counts_np)

    sel = np.sort(np.argsort(-counts_np, kind="stable")[: n // 4])
    p_dev, s_dev = infer(state, dist_dev[sel], vec_dev[sel])
    p_np, s_np = infer(state, dist[sel], vec[sel])
    np.testing.assert_array_equal(p_dev, p_np)
    np.testing.assert_allclose(s_dev, s_np, rtol=1e-6)
