"""Fused NeRF shading-MLP Pallas kernel.

The role of the reference's TensorRT engine execution for the shading network
(imagegenerator.cpp:336-344): all weights live in VMEM for the whole kernel
(~1.2 MB bf16), the 8-layer trunk + view branch run back-to-back on the MXU
with fp32 accumulation, and the sample stream is tiled through VMEM — no HBM
round-trips between layers.

Design notes:
 * the skip connection (concat at layer `skip`, models.py:260-261) is
   algebraically split into two matmuls (``[h, x] @ W == h @ W_h + x @ W_x``)
   so every operand keeps MXU-friendly 128-multiple shapes;
 * inputs are zero-padded to 128 lanes ([pos_enc 63 | dir_enc 27 | 0...]),
   with the corresponding weight rows zero-padded, which leaves results exact;
 * output block is (TILE, 128) with rgb+alpha in the first 4 lanes (padded
   lanes cost bandwidth, not compute; the consumer slices them away).
"""

from __future__ import annotations

import functools
import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _pad_to(x, rows, cols):
    return jnp.zeros((rows, cols), x.dtype).at[:x.shape[0], :x.shape[1]].set(x)


def pack_nerf_weights(nerf_def, params: Dict, dtype=jnp.bfloat16):
    """Pad/split the NeRF param pytree into MXU-aligned matrices.

    Returns a dict of bf16 matrices + fp32 bias rows, all of whose dims are
    multiples of 128 (weight rows beyond the logical width are zero).
    """
    W = nerf_def.width
    in_ch = nerf_def.input_ch
    in_views = nerf_def.input_ch_views
    skips = set(nerf_def.skips)
    # widths that aren't 128-multiples compile but waste MXU lanes
    in_pad = LANE * math.ceil((in_ch + in_views) / LANE)

    packed = {}
    # layer 0: (in_ch -> W), input padded to in_pad with dirs+zeros after pos
    w0 = params["pts"][0]["w"].astype(dtype)
    packed["w0"] = _pad_to(w0, in_pad, W)
    packed["b0"] = params["pts"][0]["b"].astype(jnp.float32).reshape(1, W)

    for i in range(1, nerf_def.depth):
        p = params["pts"][i]
        w = p["w"].astype(dtype)
        if (i - 1) in skips:
            # reference concat order is [input_pts, h] (models.py:261)
            packed[f"wx{i}"] = _pad_to(w[:in_ch], in_pad, W)
            packed[f"wh{i}"] = w[in_ch:]
        else:
            packed[f"wh{i}"] = w
        packed[f"b{i}"] = p["b"].astype(jnp.float32).reshape(1, W)

    half = W // 2
    half_pad = LANE * math.ceil(half / LANE)
    packed["wa"] = _pad_to(params["alpha"]["w"].astype(dtype), W, LANE)
    packed["ba"] = _pad_to(params["alpha"]["b"].astype(jnp.float32).reshape(1, 1),
                           1, LANE)
    packed["wf"] = params["feature"]["w"].astype(dtype)
    packed["bf"] = params["feature"]["b"].astype(jnp.float32).reshape(1, W)
    # views layer input is [feature W | dirs in_views] (models.py:266)
    wv = params["views"][0]["w"].astype(dtype)
    packed["wv_f"] = _pad_to(wv[:W], W, half_pad)
    # dir rows aligned to their position in the padded input (after pos)
    wv_d = jnp.zeros((in_pad, half_pad), dtype)
    wv_d = wv_d.at[in_ch:in_ch + in_views, :half].set(wv[W:W + in_views])
    packed["wv_d"] = wv_d
    packed["bv"] = _pad_to(params["views"][0]["b"].astype(jnp.float32)
                           .reshape(1, half), 1, half_pad)
    packed["wrgb"] = _pad_to(params["rgb"]["w"].astype(dtype), half_pad, LANE)
    packed["brgb"] = _pad_to(params["rgb"]["b"].astype(jnp.float32)
                             .reshape(1, 3), 1, LANE)
    return packed


def _mlp_kernel(nerf_def, keys, x_ref, *refs):
    """Kernel body: refs = packed weight refs (ordered by `keys`) + out_ref."""
    out_ref = refs[-1]
    w = {k: r for k, r in zip(keys, refs[:-1])}
    dtype = w["w0"].dtype
    skips = set(nerf_def.skips)

    x = x_ref[:]                       # (TILE, in_pad) bf16
    h = jnp.dot(x, w["w0"][:], preferred_element_type=jnp.float32) + w["b0"][:]
    h = jax.nn.relu(h)
    for i in range(1, nerf_def.depth):
        hi = jnp.dot(h.astype(dtype), w[f"wh{i}"][:],
                     preferred_element_type=jnp.float32)
        if (i - 1) in skips:
            hi = hi + jnp.dot(x, w[f"wx{i}"][:],
                              preferred_element_type=jnp.float32)
        h = jax.nn.relu(hi + w[f"b{i}"][:])

    hb = h.astype(dtype)
    alpha = jnp.dot(hb, w["wa"][:], preferred_element_type=jnp.float32) \
        + w["ba"][:]
    feat = jnp.dot(hb, w["wf"][:], preferred_element_type=jnp.float32) \
        + w["bf"][:]
    hv = jnp.dot(feat.astype(dtype), w["wv_f"][:],
                 preferred_element_type=jnp.float32) \
        + jnp.dot(x, w["wv_d"][:], preferred_element_type=jnp.float32) \
        + w["bv"][:]
    hv = jax.nn.relu(hv)
    rgb = jnp.dot(hv.astype(dtype), w["wrgb"][:],
                  preferred_element_type=jnp.float32) + w["brgb"][:]

    out = jnp.concatenate([rgb[:, :3], alpha[:, :1]], axis=-1)
    out_ref[:, :4] = out
    out_ref[:, 4:] = jnp.zeros_like(out_ref[:, 4:])


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def nerf_mlp_pallas(nerf_def, packed, x, tile=1024, interpret=False):
    """Run the fused shading MLP.

    x: (N, in_pad) bf16 padded embeddings (pos | dirs | zeros), N % tile == 0.
    Returns (N, 4) fp32 raw outputs [rgb, alpha] (pre-sigmoid).
    """
    keys = sorted(packed.keys())
    n = x.shape[0]
    in_pad = x.shape[1]
    grid = (n // tile,)

    in_specs = [pl.BlockSpec((tile, in_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for k in keys:
        shape = packed[k].shape
        in_specs.append(pl.BlockSpec(shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        functools.partial(_mlp_kernel, nerf_def, keys),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, LANE), jnp.float32),
        interpret=interpret,
    )(x, *[packed[k] for k in keys])
    return out[:, :4]


def embed_pad(emb: jnp.ndarray, in_pad: int = LANE,
              dtype=jnp.bfloat16) -> jnp.ndarray:
    """(N, 90) embedding -> (N, in_pad) bf16 zero-padded kernel input."""
    n, c = emb.shape
    out = jnp.zeros((n, in_pad), dtype)
    return out.at[:, :c].set(emb.astype(dtype))
