"""Fused adaptive-select + row-pack Pallas kernel — the TPU analog of the
viewer's warp-compaction kernel ``sampleAdaptiveWarpReductionMax``
(adaptive_cuda_kernels.cu:301-450).

One VMEM pass per ray tile: threshold/top-K selection over the 128 oracle
bins (K rounds of first-occurrence argmax + tie-capped threshold mask),
bin-order packing into K slots, world-space depth transform, and assembly of
the 128-lane packed shade row [o(3) | d(3) | z_world(K) | probs(K) | ... |
count] — HBM traffic is exactly one read of the oracle bins + the ray
geometry and one write of the packed rows.

Semantics identical to ``ops.samplers.adaptive_select`` (the jnp twin);
equivalence is tested in interpret mode and on random inputs with ties.

Status: measured at 7.4-9.9 ms/batch (80k rays, v5e) vs 6.9 ms for the
fused-XLA twin — the K serial argmax rounds don't vectorize better in Mosaic
than in XLA, so the production path (realtime.py) uses the jnp twin; this
kernel remains the verified scaffold for a future single-kernel
select+gather+shade fusion.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
COUNT_LANE = 127  # lane holding the per-ray live-sample count (as float)


def _lane_cumsum(x_f32):
    """Inclusive cumsum along the 128-lane axis as one MXU matmul with an
    upper-triangular ones matrix (Pallas TPU has no cumsum lowering)."""
    T, D = x_f32.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (D, D), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (D, D), 1)
    tri = (rows <= cols).astype(jnp.float32)
    return jnp.dot(x_f32, tri, preferred_element_type=jnp.float32)


def _select_pack_kernel(oracle_ref, odin_ref, out_ref, *, max_samples: int,
                        threshold: float, to_world: Callable):
    d = oracle_ref[:].astype(jnp.float32)            # (T, D)
    T, D = d.shape
    S = max_samples
    cell = 1.0 / D
    iota = jax.lax.broadcasted_iota(jnp.int32, (T, D), 1)
    neg_inf = jnp.float32(-jnp.inf)

    # K-th largest via K rounds of first-occurrence argmax masking
    work = d
    v_k = None
    for _ in range(S):
        v_k = jnp.max(work, axis=1, keepdims=True)
        first = jnp.min(jnp.where(work == v_k, iota, D), axis=1, keepdims=True)
        work = jnp.where(iota == first, neg_inf, work)

    above = d > v_k
    n_above = jnp.sum(above.astype(jnp.int32), axis=1, keepdims=True)
    ties = d == v_k
    tie_rank = _lane_cumsum(ties.astype(jnp.float32)).astype(jnp.int32)
    keep = above | (ties & (tie_rank <= (S - n_above)))
    keep = keep & (d >= threshold)

    # empty-ray fallback: first global argmax bin
    any_keep = jnp.any(keep, axis=1, keepdims=True)
    dmax = jnp.max(d, axis=1, keepdims=True)
    am_first = jnp.min(jnp.where(d == dmax, iota, D), axis=1, keepdims=True)
    keep = keep | (jnp.logical_not(any_keep) & (iota == am_first))

    rowcum = _lane_cumsum(keep.astype(jnp.float32)).astype(jnp.int32)
    n_per_ray = jnp.sum(keep.astype(jnp.int32), axis=1)

    keep_f = keep.astype(jnp.float32)
    iota_f = iota.astype(jnp.float32)

    z_cols = []
    p_cols = []
    for s in range(S):
        sel = keep_f * (rowcum == (s + 1)).astype(jnp.float32)
        bin_s = jnp.sum(iota_f * sel, axis=1)
        prob_s = jnp.sum(d * sel, axis=1)
        live = (s < n_per_ray).astype(jnp.float32)
        z_world = to_world((bin_s + 0.5) * cell) * live
        z_cols.append(z_world[:, None])
        p_cols.append((prob_s * live)[:, None])

    pad = jnp.zeros((T, LANE - 6 - 2 * S - 1), jnp.float32)
    count = n_per_ray.astype(jnp.float32)[:, None]
    out_ref[:] = jnp.concatenate(
        [odin_ref[:, 0:6]] + z_cols + p_cols + [pad, count], axis=1)


@functools.partial(jax.jit,
                   static_argnames=("max_samples", "threshold", "to_world",
                                    "tile", "interpret"))
def select_pack_pallas(oracle_out, odin, *, max_samples: int, threshold: float,
                       to_world: Callable, tile: int = 1024,
                       interpret: bool = False):
    """oracle_out (B, D) raw oracle bins; odin (B, 128) rows whose first 6
    lanes are [origin, direction]. Returns packed (B, 128) rows:
    [o | d | z_world(K) | probs(K) | 0... | count]."""
    B, D = oracle_out.shape
    assert B % tile == 0 and tile % 8 == 0, (B, tile)
    kernel = functools.partial(_select_pack_kernel, max_samples=max_samples,
                               threshold=threshold, to_world=to_world)
    return pl.pallas_call(
        kernel,
        grid=(B // tile,),
        in_specs=[pl.BlockSpec((tile, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tile, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, LANE), jnp.float32),
        interpret=interpret,
    )(oracle_out.astype(jnp.float32), odin)


def unpack_mask(packed, max_samples: int):
    """(B,) live counts and (B, K) slot mask from packed rows."""
    n = packed[:, COUNT_LANE].astype(jnp.int32)
    slot = jax.lax.broadcasted_iota(jnp.int32, (packed.shape[0], max_samples), 1)
    return n, slot < n[:, None]
