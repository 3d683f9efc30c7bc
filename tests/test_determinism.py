import numpy as np

from lira_tpu.partition.kmeans import kmeans_fit, kmeans_assign
from lira_tpu.models.train import make_train_state, train_epoch, evaluate


def test_kmeans_deterministic(rng):
    x = rng.normal(size=(1000, 8)).astype(np.float32)
    km1 = kmeans_fit(x, 8, niter=5, seed=43)
    km2 = kmeans_fit(x, 8, niter=5, seed=43)
    np.testing.assert_array_equal(km1.centroids, km2.centroids)
    np.testing.assert_array_equal(kmeans_assign(x, km1.centroids), kmeans_assign(x, km2.centroids))


def test_training_deterministic(rng):
    n, n_bkt, dim = 100, 4, 8
    dist = rng.normal(size=(n, n_bkt)).astype(np.float32)
    vec = rng.normal(size=(n, dim)).astype(np.float32)
    targets = (rng.random((n, n_bkt)) < 0.3).astype(np.float32)

    outs = []
    for _ in range(2):
        state = make_train_state(seed=43, n_bkt=n_bkt, dim=dim)
        state, _ = train_epoch(state, dist, vec, targets, batch_size=32)
        outs.append(evaluate(state, dist, vec, targets)[3])
    np.testing.assert_array_equal(outs[0], outs[1])
