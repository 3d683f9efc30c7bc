import numpy as np

from lira_tpu.config import Config
from lira_tpu.labels.scaler import StandardScaler
from lira_tpu.models.train import make_train_state
from lira_tpu.pipelines.largescale import full_corpus_redundancy
from lira_tpu.redundancy.assign import apply_redundancy
from lira_tpu.labels.scaler import scaled_centroid_distances
from lira_tpu.models.train import infer


def test_batched_full_redundancy_matches_oneshot(rng):
    """full_corpus_redundancy (streamed batches) == apply_redundancy over all
    rows at once, given the same scores (reference: LIRA_largescale.py:320-329)."""
    n, dim, n_bkt = 600, 8, 6
    x_d = rng.normal(size=(n, dim)).astype(np.float32)
    centroids = rng.normal(size=(n_bkt, dim)).astype(np.float32)
    d2b = np.full((n, 2), -1, dtype=np.int32)
    d2b[:, 0] = rng.integers(0, n_bkt, size=n)

    raw, _, scaler = scaled_centroid_distances(x_d, None, centroids)
    state = make_train_state(seed=0, n_bkt=n_bkt, dim=dim)
    cfg = Config(dataset="x", k=3, n_bkt=n_bkt, redundancy_batch=128).update()

    batched = full_corpus_redundancy(x_d, d2b, centroids, scaler, state, cfg)

    dist_all, _, _ = scaled_centroid_distances(x_d, None, centroids, scaler=scaler)
    predicts, scores = infer(state, dist_all, x_d)
    oneshot = apply_redundancy(d2b, scores, predicts, np.arange(n))

    np.testing.assert_array_equal(batched, oneshot)
