"""Positional (frequency) encoding.

Reference semantics: ``src/util/feature_encoding.py:54-74`` — the classic NeRF
encoding ``[x, sin(2^0 x), cos(2^0 x), ..., sin(2^{F-1} x), cos(2^{F-1} x)]``
with the identity first and per-frequency (sin, cos) pairs interleaved along
the feature axis.

TPU note: the encoding is a pure VPU op that XLA fuses into the surrounding
matmul producers/consumers; a handwritten kernel buys nothing here, so this
stays jnp. Frequencies are baked in as static python floats so the jitted
graph contains constants.
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp
import numpy as np


def freq_bands(n_freqs: int) -> np.ndarray:
    """2^linspace(0, n_freqs-1) — static host-side constant."""
    if n_freqs <= 0:
        return np.zeros((0,), dtype=np.float32)
    return (2.0 ** np.linspace(0.0, n_freqs - 1, n_freqs)).astype(np.float32)


def positional_encode(x: jnp.ndarray, n_freqs: int) -> jnp.ndarray:
    """NeRF frequency encoding of the last axis.

    x: (..., C) -> (..., C * (2*n_freqs + 1)); layout [x, sin f0, cos f0, ...].
    """
    if n_freqs <= 0:
        return x
    # One wide sin and one wide cos over the frequency-flattened axis
    # instead of 2*n_freqs narrow (..., C) calls. Values are bit-identical
    # (same elementwise inputs); the win is TPU layout: a (N, 3) f32 temp
    # tiles to T(8,128) with a 42.7x lane-padding expansion, and the 2F+1
    # narrow remat temps OOM'd training at 2x4096 rays (DEVNOTES round 4).
    # The flattened (N, F*C) temps pad ~2x, cutting those bytes ~10x.
    bands = jnp.asarray(freq_bands(n_freqs))
    lead, C = x.shape[:-1], x.shape[-1]
    F = int(n_freqs)
    xf = (x[..., None, :] * bands[:, None]).reshape(*lead, F * C)
    s = jnp.sin(xf).reshape(*lead, F, 1, C)
    c = jnp.cos(xf).reshape(*lead, F, 1, C)
    # (..., F, 2, C) -> [sin f0 | cos f0 | sin f1 | ...], the reference
    # interleaved layout (feature_encoding.py:54-74)
    sc = jnp.concatenate([s, c], axis=-2).reshape(*lead, 2 * F * C)
    return jnp.concatenate([x, sc], axis=-1)


def encoded_width(name: str, n: int, n_freqs: int) -> int:
    """Number of output features (reference: feature_encoding.py:33-38)."""
    if name == "nerf":
        return n * 2 * n_freqs + n
    return n


def get_encoder(name: str, n_freqs: int):
    """'nerf' -> frequency encoder with n_freqs bands; 'none' -> identity."""
    if name == "nerf":
        return partial(positional_encode, n_freqs=n_freqs)
    if name == "none":
        return lambda x: x
    raise ValueError(f"Encoding {name} not implemented")
