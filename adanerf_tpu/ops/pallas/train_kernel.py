"""Fused forward+backward Pallas kernel for the shading-MLP training step.

Why this exists: the dense-phase train step runs the NeRF shading MLP at
batch*rays*samples rows (the reference workload: 2*2048*128 = 524k rows,
src/train_data.py:278-299 driving models.py:254-277).  XLA's autodiff of an
unfused 8x256 matmul chain materializes every (524k, 256) intermediate to
HBM — measured 34 ms for fwd+bwd where the pure-MXU bound is ~8 ms, and
neither remat nor bf16 activation storage moves it (the traffic is the
backward chain itself, not the residuals).  The only way past the HBM wall
is fusion: keep the whole layer chain in VMEM per row-tile.

Design (TPU-first, no torch analog):
  * ``fwd`` kernel: one grid step per row tile; all weights VMEM-resident;
    bf16 matmuls with f32 accumulation (the reference trains under AMP
    autocast, train.py:62-78, so bf16 operands are semantics-matching).
  * ``bwd`` kernel: RECOMPUTES the forward activations in VMEM (3 fwd-
    equivalents of FLOPs total — cheaper than round-tripping 3.2 GB of
    saved activations through HBM), then walks the chain backward; per-tile
    dW partials accumulate into constant-index output blocks across the
    sequential TPU grid.
  * the skip concat ``[input_pts, h] @ W`` is algebraically split as
    ``x @ Wx + h @ Wh`` (same trick as pack_nerf_weights) so every operand
    keeps 128-multiple shapes; zero-padded rows/cols make pad regions exact
    and their cotangent garbage is dropped by the pack slices' own VJP.
  * wrapped in ``jax.custom_vjp`` over the f32 packed-weight pytree, so
    ``jax.grad`` of any loss through ``apply`` sees exact f32 cotangents
    while all heavy math runs at bf16 MXU rate.

Numerics: dW/dX matmuls run bf16 x bf16 with f32 accumulation — identical
discipline to torch AMP backward (the reference's GradScaler path,
src/train.py) and to what XLA already emits for the stock bf16 step (the
stock and bf16-activation grads measured bit-identical).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .megakernel import LANE, pack_nerf_weights

BF = jnp.bfloat16


def _bf(x):
    return x.astype(BF)


def _mmt(a, b):
    """(T, k) x (T, n) -> (k, n): contract the row/tile dim (dW matmuls)."""
    return jax.lax.dot_general(_bf(a), _bf(b), (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_nt(a, b):
    """(T, n) x (k, n) -> (T, k): contract the lane dim (dX matmuls)."""
    return jax.lax.dot_general(_bf(a), _bf(b), (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm(a, b):
    return jnp.dot(_bf(a), _bf(b), preferred_element_type=jnp.float32)


def _forward(w, x, nerf_def):
    """Recompute the padded-weight forward chain; returns (hs, feat, hv, out).

    hs[i] is the post-relu activation of trunk layer i (f32).  out is the
    (T, LANE) padded output row: cols 0..2 rgb, col 3 alpha.
    """
    skips = set(nerf_def.skips)
    hs = []
    h = jax.nn.relu(_mm(x, w["w0"]) + w["b0"])
    hs.append(h)
    for i in range(1, nerf_def.depth):
        hi = _mm(h, w[f"wh{i}"])
        if (i - 1) in skips:
            hi = hi + _mm(x, w[f"wx{i}"])
        h = jax.nn.relu(hi + w[f"b{i}"])
        hs.append(h)
    alpha = _mm(h, w["wa"]) + w["ba"]          # (T, LANE), col 0 live
    feat = _mm(h, w["wf"]) + w["bf"]           # (T, W)
    hv = jax.nn.relu(_mm(feat, w["wv_f"]) + _mm(x, w["wv_d"]) + w["bv"])
    rgb = _mm(hv, w["wrgb"]) + w["brgb"]       # (T, LANE), cols 0..2 live
    lane = jax.lax.broadcasted_iota(jnp.int32, rgb.shape, 1)
    out = rgb + alpha[:, 0:1] * (lane == 3).astype(jnp.float32)
    return hs, feat, hv, out


def make_nerf_train_apply(nerf_def, tile: int = 512, interpret: bool = False):
    """Build ``apply(params, x) -> (N, 4)`` with a fused-Pallas custom VJP.

    Drop-in for ``NeRFDef.apply(params, x, dtype=bfloat16)`` on TPU.  x is
    the encoded (N, input_ch + input_ch_views) feature matrix; returns
    [rgb, alpha] exactly like models/mlp.py:229-248.
    """
    assert nerf_def.use_viewdirs, "fused train kernel assumes viewdirs head"
    n_in = nerf_def.input_ch + nerf_def.input_ch_views
    in_pad = LANE * math.ceil(n_in / LANE)

    # key order is the pallas arg order everywhere
    dummy = jax.eval_shape(
        lambda: pack_nerf_weights(
            nerf_def, _dummy_params(nerf_def), dtype=jnp.float32))
    keys = sorted(dummy.keys())

    def fwd_kernel(x_ref, *rest):
        w = {k: r[...] for k, r in zip(keys, rest[:-1])}
        out_ref = rest[-1]
        _, _, _, out = _forward(w, x_ref[...], nerf_def)
        out_ref[...] = out

    def bwd_kernel(x_ref, g_ref, *rest):
        w = {k: r[...] for k, r in zip(keys, rest[:len(keys)])}
        outs = rest[len(keys):]
        dx_ref = outs[0]
        dw_refs = dict(zip(keys, outs[1:]))

        x = x_ref[...]
        g = g_ref[...]                                   # (T, LANE) f32
        hs, feat, hv, _ = _forward(w, x, nerf_def)
        skips = set(nerf_def.skips)
        grads = {}

        # heads
        grads["wrgb"] = _mmt(hv, g)
        grads["brgb"] = jnp.sum(g, axis=0, keepdims=True)
        g_hv = _mm_nt(g, w["wrgb"]) * (hv > 0)
        grads["wv_f"] = _mmt(feat, g_hv)
        grads["wv_d"] = _mmt(x, g_hv)
        grads["bv"] = jnp.sum(g_hv, axis=0, keepdims=True)
        g_feat = _mm_nt(g_hv, w["wv_f"])
        grads["wf"] = _mmt(hs[-1], g_feat)
        grads["bf"] = jnp.sum(g_feat, axis=0, keepdims=True)
        lane = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
        g_a = jnp.sum(g * (lane == 3).astype(jnp.float32), axis=1,
                      keepdims=True)                      # (T, 1) alpha cot
        g_a_row = g_a * (lane == 0).astype(jnp.float32)   # back to col 0
        grads["wa"] = _mmt(hs[-1], g_a_row)
        grads["ba"] = jnp.sum(g_a_row, axis=0, keepdims=True)
        g_h = _mm_nt(g_feat, w["wf"]) + _mm_nt(g_a_row, w["wa"])

        # trunk, output side first
        dx = _mm_nt(g_hv, w["wv_d"])
        for i in range(nerf_def.depth - 1, 0, -1):
            g_pre = g_h * (hs[i] > 0)
            grads[f"wh{i}"] = _mmt(hs[i - 1], g_pre)
            grads[f"b{i}"] = jnp.sum(g_pre, axis=0, keepdims=True)
            if (i - 1) in skips:
                grads[f"wx{i}"] = _mmt(x, g_pre)
                dx = dx + _mm_nt(g_pre, w[f"wx{i}"])
            g_h = _mm_nt(g_pre, w[f"wh{i}"])
        g_pre = g_h * (hs[0] > 0)
        grads["w0"] = _mmt(x, g_pre)
        grads["b0"] = jnp.sum(g_pre, axis=0, keepdims=True)
        dx = dx + _mm_nt(g_pre, w["w0"])

        dx_ref[...] = dx
        first = pl.program_id(0) == 0
        for k in keys:
            @pl.when(first)
            def _(k=k):
                dw_refs[k][...] = grads[k]
            @pl.when(jnp.logical_not(first))
            def _(k=k):
                dw_refs[k][...] += grads[k]

    def _pallas_fwd(packed, xp):
        n = xp.shape[0]
        w_specs = [pl.BlockSpec(packed[k].shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM) for k in keys]
        return pl.pallas_call(
            fwd_kernel,
            grid=(n // tile,),
            in_specs=[pl.BlockSpec((tile, in_pad), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)] + w_specs,
            out_specs=pl.BlockSpec((tile, LANE), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, LANE), jnp.float32),
            interpret=interpret,
        )(xp, *[packed[k] for k in keys])

    def _pallas_bwd(packed, xp, gp):
        n = xp.shape[0]
        w_specs = [pl.BlockSpec(packed[k].shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM) for k in keys]
        const_out = [pl.BlockSpec(packed[k].shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM) for k in keys]
        out_shapes = ([jax.ShapeDtypeStruct((n, in_pad), jnp.float32)]
                      + [jax.ShapeDtypeStruct(packed[k].shape, jnp.float32)
                         for k in keys])
        res = pl.pallas_call(
            bwd_kernel,
            grid=(n // tile,),
            in_specs=([pl.BlockSpec((tile, in_pad), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((tile, LANE), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)] + w_specs),
            out_specs=([pl.BlockSpec((tile, in_pad), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)] + const_out),
            out_shape=out_shapes,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024) if tile > 512 else None,
            interpret=interpret,
        )(xp, gp, *[packed[k] for k in keys])
        dx = res[0]
        dw = dict(zip(keys, res[1:]))
        return dx, dw

    @jax.custom_vjp
    def core(packed, xp):
        return _pallas_fwd(packed, xp)

    def core_fwd(packed, xp):
        return _pallas_fwd(packed, xp), (packed, xp)

    def core_bwd(res, g):
        packed, xp = res
        dx, dw = _pallas_bwd(packed, xp, g)
        return dw, dx

    core.defvjp(core_fwd, core_bwd)

    def apply(params, x):
        packed = pack_nerf_weights(nerf_def, params, dtype=jnp.float32)
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
        n = x2.shape[0]
        n_pad = tile * math.ceil(n / tile)
        xp = jnp.zeros((n_pad, in_pad), jnp.float32).at[:n, :n_in].set(x2)
        out = core(packed, xp)
        return out[:n, :4].reshape(*lead, 4)

    return apply


def _dummy_params(nerf_def):
    """Shape-only param pytree for key discovery (no RNG cost)."""
    W, D = nerf_def.width, nerf_def.depth
    z = lambda *s: jnp.zeros(s, jnp.float32)
    pts = [{"w": z(nerf_def.input_ch, W), "b": z(W)}]
    for i in range(D - 1):
        n_in = W + nerf_def.input_ch if i in nerf_def.skips else W
        pts.append({"w": z(n_in, W), "b": z(W)})
    return {
        "pts": pts,
        "views": [{"w": z(W + nerf_def.input_ch_views, W // 2),
                   "b": z(W // 2)}],
        "feature": {"w": z(W, W), "b": z(W)},
        "alpha": {"w": z(W, 1), "b": z(1)},
        "rgb": {"w": z(W // 2, 3), "b": z(3)},
    }
