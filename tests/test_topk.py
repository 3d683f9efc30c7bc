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
    # all top-k inside ONE strided group (indices ≡ 3 mod G); every other
    # group gets a deceptively low (but not lowest) min
    c, k = 1024, 5
    g = c // 128  # number of strided groups
    scores = np.full((1, c), 100.0, dtype=np.float32)
    winners = 3 + g * np.arange(5)  # same strided group
    scores[0, winners] = [1, 2, 3, 4, 5]
    scores[0, :g] = 50  # one low element per group
    scores[0, 3] = 1  # keep winner value
    vals, idx = grouped_topk(jnp.asarray(scores), k)
    got = np.sort(np.asarray(idx)[0])
    np.testing.assert_array_equal(got, winners)


def test_grouped_topk_with_padding():
    # c not a multiple of the group size; inf-padding must not leak
    scores = np.arange(300, dtype=np.float32)[::-1].reshape(1, 300).copy()
    vals, idx = grouped_topk(jnp.asarray(scores), 4, group=128)
    np.testing.assert_array_equal(np.asarray(idx)[0], [299, 298, 297, 296])
