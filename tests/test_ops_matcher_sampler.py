import numpy as np
import jax
import jax.numpy as jnp

from snn_automotive_object_detection_tpu.ops.matcher import match_boxes
from snn_automotive_object_detection_tpu.ops.sampler import balanced_sample
from tests import oracles


def test_matcher_matches_oracle(rng):
    for allow_low in (False, True):
        q = rng.uniform(0, 1, (6, 40)).astype(np.float32)
        got = np.asarray(
            match_boxes(jnp.asarray(q), jnp.ones(6, bool), 0.7, 0.3, allow_low)
        )
        want = oracles.match(q, 0.7, 0.3, allow_low)
        np.testing.assert_array_equal(got, want)


def test_matcher_ignores_padded_gt(rng):
    q = rng.uniform(0, 0.2, (4, 30)).astype(np.float32)
    q[2, 5] = 0.95  # only a padded row has high quality
    valid = np.array([True, True, False, True])
    got = np.asarray(match_boxes(jnp.asarray(q), jnp.asarray(valid), 0.7, 0.3, True))
    assert got[5] != 2 or got[5] < 0  # padded row must not win

    # With the row valid it does win.
    got2 = np.asarray(match_boxes(jnp.asarray(q), jnp.ones(4, bool), 0.7, 0.3, False))
    assert got2[5] == 2


def test_balanced_sampler_counts():
    key = jax.random.PRNGKey(0)
    n = 1000
    pos = np.zeros(n, bool)
    pos[:30] = True
    neg = np.zeros(n, bool)
    neg[500:] = True
    p, ng = balanced_sample(key, jnp.asarray(pos), jnp.asarray(neg), 256, 0.5)
    p, ng = np.asarray(p), np.asarray(ng)
    assert p.sum() == 30  # fewer positives than target -> take all
    assert ng.sum() == 256 - 30
    assert not (p & ~pos).any() and not (ng & ~neg).any()
    assert not (p & ng).any()


def test_balanced_sampler_caps_positives():
    key = jax.random.PRNGKey(1)
    n = 600
    pos = np.zeros(n, bool)
    pos[:400] = True
    neg = ~pos
    p, ng = balanced_sample(key, jnp.asarray(pos), jnp.asarray(neg), 256, 0.25)
    assert np.asarray(p).sum() == 64
    assert np.asarray(ng).sum() == 192


def test_balanced_sampler_few_negatives():
    key = jax.random.PRNGKey(2)
    n = 100
    pos = np.zeros(n, bool)
    pos[:10] = True
    neg = np.zeros(n, bool)
    neg[90:] = True  # only 10 negatives
    p, ng = balanced_sample(key, jnp.asarray(pos), jnp.asarray(neg), 256, 0.5)
    assert np.asarray(p).sum() == 10
    assert np.asarray(ng).sum() == 10
