import numpy as np
import jax.numpy as jnp
import pytest

from lira_tpu.ops.topk import grouped_topk


@pytest.mark.parametrize("c", [64, 200, 1000, 5000])
@pytest.mark.parametrize("k", [1, 10, 100])
def test_grouped_topk_matches_sort(rng, c, k):
    if k > c:
        pytest.skip("k > row width")
    scores = rng.normal(size=(17, c)).astype(np.float32)
    vals, idx = grouped_topk(jnp.asarray(scores), k, group=32)
    expected_idx = np.argsort(scores, axis=1, kind="stable")[:, :k]
    np.testing.assert_allclose(np.asarray(vals), np.take_along_axis(scores, expected_idx, 1))
    # indices must point at values equal to the true top-k (ties may swap ids)
    np.testing.assert_allclose(
        np.take_along_axis(scores, np.asarray(idx), 1),
        np.take_along_axis(scores, expected_idx, 1),
    )


def test_grouped_topk_exact_indices_no_ties(rng):
    scores = rng.permutation(4096).astype(np.float32).reshape(1, -1)
    vals, idx = grouped_topk(jnp.asarray(scores), 7)
    np.testing.assert_array_equal(np.asarray(idx)[0], np.argsort(scores[0])[:7])


def test_grouped_topk_adversarial_grouping():
    # all top-k in one group; far-away groups have low-but-not-lowest mins
    c, k = 1024, 5
    scores = np.full((1, c), 100.0, dtype=np.float32)
    scores[0, 256:261] = [1, 2, 3, 4, 5]  # all 5 best inside one 128-group
    scores[0, ::128] = 50  # every group has a deceptively low min
    vals, idx = grouped_topk(jnp.asarray(scores), k)
    np.testing.assert_array_equal(np.sort(np.asarray(idx)[0]), np.arange(256, 261))


def test_grouped_topk_with_padding():
    # c not a multiple of the group size; inf-padding must not leak
    scores = np.arange(300, dtype=np.float32)[::-1].reshape(1, 300).copy()
    vals, idx = grouped_topk(jnp.asarray(scores), 4, group=128)
    np.testing.assert_array_equal(np.asarray(idx)[0], [299, 298, 297, 296])
