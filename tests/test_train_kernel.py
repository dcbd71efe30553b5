"""Fused Pallas train-kernel correctness: forward and gradients vs the stock
bf16 autodiff path (interpret mode on CPU).

The kernel's matmul split of the skip concat and its recompute-based backward
reorder bf16 roundings, so agreement is at AMP noise level, not bit-exact:
forward within ~2e-3 abs on O(1) outputs, grads within ~2% relative — the
same scale as two different-but-valid torch AMP executions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adanerf_tpu.models.mlp import NeRFDef
from adanerf_tpu.ops.pallas.train_kernel import make_nerf_train_apply


@pytest.fixture(scope="module")
def setup():
    d = NeRFDef(depth=8, width=256, input_ch=63, input_ch_views=27, n_out=4,
                skips=(4,), use_viewdirs=True)
    p = d.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (200, 90), jnp.float32)
    t = jax.random.normal(jax.random.PRNGKey(2), (200, 4), jnp.float32)
    apply_k = make_nerf_train_apply(d, tile=64, interpret=True)
    return d, p, x, t, apply_k


class TestTrainKernel:
    def test_forward_matches_bf16_apply(self, setup):
        d, p, x, _, apply_k = setup
        o_ref = d.apply(p, x, dtype=jnp.bfloat16)
        o_k = apply_k(p, x)
        assert o_k.shape == o_ref.shape
        np.testing.assert_allclose(np.asarray(o_k), np.asarray(o_ref),
                                   atol=4e-3)

    def test_forward_nd_batch(self, setup):
        d, p, x, _, apply_k = setup
        x3 = x.reshape(10, 20, 90)
        o3 = apply_k(p, x3)
        assert o3.shape == (10, 20, 4)
        np.testing.assert_allclose(np.asarray(o3.reshape(200, 4)),
                                   np.asarray(apply_k(p, x)), atol=1e-6)

    def test_grads_match_bf16_autodiff(self, setup):
        d, p, x, t, apply_k = setup

        def loss_ref(pp, xx):
            return jnp.mean((d.apply(pp, xx, dtype=jnp.bfloat16) - t) ** 2)

        def loss_k(pp, xx):
            return jnp.mean((apply_k(pp, xx) - t) ** 2)

        g_ref = jax.grad(loss_ref, argnums=(0, 1))(p, x)
        g_k = jax.grad(loss_k, argnums=(0, 1))(p, x)
        for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                        jax.tree_util.tree_leaves(g_k)):
            scale = float(jnp.max(jnp.abs(a))) + 1e-12
            assert float(jnp.max(jnp.abs(a - b))) / scale < 2e-2

    def test_row_padding_exact(self, setup):
        """N not a multiple of tile: pad rows must not perturb outputs or
        grads (pad g rows are zero so dW contributions vanish)."""
        d, p, x, t, apply_k = setup
        x_odd = x[:130]

        def loss_k(pp):
            return jnp.sum(apply_k(pp, x_odd) ** 2)

        def loss_full(pp):
            return jnp.sum(apply_k(pp, x)[:130] ** 2)

        g_odd = jax.grad(loss_k)(p)
        # reference grads computed on the first 130 rows of the padded-to-200
        # call must agree (the kernel only ever sees zero-padded tails)
        def loss_ref(pp):
            return jnp.sum(d.apply(pp, x_odd, dtype=jnp.bfloat16) ** 2)
        g_ref = jax.grad(loss_ref)(p)
        for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                        jax.tree_util.tree_leaves(g_odd)):
            scale = float(jnp.max(jnp.abs(a))) + 1e-12
            assert float(jnp.max(jnp.abs(a - b))) / scale < 2e-2
