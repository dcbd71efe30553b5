"""Ragged-sample compaction for adaptive inference — the TPU-native analog of
the CUDA viewer's warp-level compaction + ragged TensorRT binding
(adaptive_cuda_kernels.cu:301-450 ``sampleAdaptiveWarpReductionMax`` and
imagegenerator.cpp:336-344).

On GPU the reference compacts surviving samples into a flat ragged array whose
length ``num_act_inputs`` becomes a dynamic TensorRT binding dimension. XLA
needs static shapes, so the same idea becomes *bucketed* compaction: valid
samples are prefix-sum-packed to the front of a fixed-capacity buffer, and the
host picks the smallest compiled capacity bucket >= the live sample count
(one scalar sync per batch — exactly the role of the TRT optimization
profiles). The shading MLP then runs on a dense, fully-utilized MXU batch.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def compact_indices(mask_flat: jnp.ndarray, capacity: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Indices of the first ``capacity`` True entries of ``mask_flat``.

    Returns (src_idx, n_act): src_idx (capacity,) int32 source positions
    (entries past n_act point at position 0 — callers mask by slot < n_act),
    and the live count n_act. Pure cumsum/scatter — no sort.
    """
    n = mask_flat.shape[0]
    positions = jnp.cumsum(mask_flat.astype(jnp.int32)) - 1  # slot per valid
    n_act = positions[-1] + 1
    # scatter: slot -> source index (unique slots, drop out-of-capacity)
    slot = jnp.where(mask_flat, positions, capacity)
    src_idx = jnp.zeros((capacity,), jnp.int32).at[slot].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    return src_idx, n_act


def scatter_back(values: jnp.ndarray, src_idx: jnp.ndarray, n_act: jnp.ndarray,
                 out_size: int) -> jnp.ndarray:
    """Scatter compacted per-sample values (capacity, C) back to a flat
    (out_size, C) buffer (zeros at dead slots) — the inverse of
    ``compact_indices`` (reference: restore at nerf_raymarch_common.py:96-114).
    """
    capacity = values.shape[0]
    slots = jnp.arange(capacity, dtype=jnp.int32)
    live = slots < n_act
    dst = jnp.where(live, src_idx, out_size)  # dead slots dropped
    out = jnp.zeros((out_size, values.shape[-1]), values.dtype)
    return out.at[dst].set(values, mode="drop")
