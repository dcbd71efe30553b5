"""Pallas fused-MLP kernel vs the pure-jnp NeRFDef.apply reference (interpret
mode on CPU — the kernel-vs-fallback duality of SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adanerf_tpu.models.mlp import NeRFDef
from adanerf_tpu.ops.pallas.mlp_kernels import (embed_pad, nerf_mlp_pallas,
                                                pack_nerf_weights)


@pytest.mark.parametrize("depth,width,skips", [(8, 256, (4,)), (4, 128, (2,))])
def test_matches_reference(depth, width, skips):
    nerf = NeRFDef(depth=depth, width=width, input_ch=63, input_ch_views=27,
                   skips=skips)
    params = nerf.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    emb = jnp.asarray(rng.randn(256, 90).astype(np.float32))

    ref = nerf.apply(params, emb, dtype=jnp.bfloat16)

    packed = pack_nerf_weights(nerf, params)
    x = embed_pad(emb)
    out = nerf_mlp_pallas(nerf, packed, x, tile=128, interpret=True)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    # structural agreement beyond tolerance noise
    corr = np.corrcoef(np.asarray(out).ravel(), np.asarray(ref).ravel())[0, 1]
    assert corr > 0.999
