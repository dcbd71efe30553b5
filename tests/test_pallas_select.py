"""Fused select+pack Pallas kernel vs the jnp adaptive_select twin
(interpret mode), including exact ties and empty rays."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adanerf_tpu.ops.depth_transforms import LogTransform
from adanerf_tpu.ops.pallas.select_kernel import (select_pack_pallas,
                                                  unpack_mask)
from adanerf_tpu.ops.samplers import adaptive_select


@pytest.mark.parametrize("seed,thr,S", [(0, 0.2, 8), (1, 0.5, 4), (2, 0.9, 8)])
def test_matches_jnp_twin(seed, thr, S):
    rng = np.random.RandomState(seed)
    B, D = 256, 128
    oracle = rng.rand(B, D).astype(np.float32)
    oracle[5, 10] = oracle[5, 60] = oracle[5, 90] = 0.777  # exact ties
    oracle[7, :] = 0.01                                     # empty row
    odin = rng.randn(B, 128).astype(np.float32)
    depth_range = (0.1, 8.0)

    def to_world(z):
        return LogTransform.to_world(z, depth_range)

    packed = select_pack_pallas(jnp.asarray(oracle), jnp.asarray(odin),
                                max_samples=S, threshold=thr,
                                to_world=to_world, tile=128, interpret=True)
    packed = np.asarray(packed)

    z_ref, p_ref, m_ref = adaptive_select(jnp.asarray(oracle), S, thr)
    z_ref = np.asarray(LogTransform.to_world(np.asarray(z_ref), depth_range))
    z_ref = np.where(np.asarray(m_ref), z_ref, 0.0)
    p_ref = np.asarray(p_ref)

    np.testing.assert_allclose(packed[:, :6], odin[:, :6], atol=0)
    np.testing.assert_allclose(packed[:, 6:6 + S], z_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(packed[:, 6 + S:6 + 2 * S], p_ref, atol=1e-6)

    n, mask = unpack_mask(jnp.asarray(packed), S)
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(m_ref))
