"""Equivalence: adaptive_select (fast, sort-free) vs adaptive_select_reference
(the literal top_k+sort port) on random inputs including ties and empty rays."""

import jax.numpy as jnp
import numpy as np
import pytest

from adanerf_tpu.ops.samplers import adaptive_select, adaptive_select_reference


@pytest.mark.parametrize("seed,disc,max_s,thr", [
    (0, 128, 8, 0.2), (1, 128, 16, 0.15), (2, 16, 4, 0.5),
    (3, 64, 8, 0.9),   # mostly empty rays
    (4, 32, 32, 0.1),  # max_samples == disc
])
def test_fast_matches_reference(seed, disc, max_s, thr):
    rng = np.random.RandomState(seed)
    depth = rng.rand(257, disc).astype(np.float32)
    # inject exact ties
    depth[10, 3] = depth[10, 7] = depth[10, 12] = 0.77
    depth[11, :] = 0.5  # all-equal row
    z1, p1, m1 = adaptive_select_reference(jnp.array(depth), max_s, thr)
    z2, p2, m2 = adaptive_select(jnp.array(depth), max_s, thr)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)


def test_fast_empty_fallback():
    depth = np.full((4, 16), 0.01, np.float32)
    depth[2, 5] = 0.02
    z, p, m = adaptive_select(jnp.array(depth), 4, 0.5)
    m = np.asarray(m)
    assert (m.sum(axis=1) == 1).all()
    assert np.isclose(float(z[2, 0]), (5 + 0.5) / 16)
    assert np.isclose(float(p[2, 0]), 0.02)
