"""Rays-sharded multi-chip frame rendering.

The reference viewer scales a frame by looping 80k-ray batches through one
GPU (adanerf_real_time_viewer/src/imagegenerator.cpp:247-394 — the batch
loop IS its render-scaling story). The TPU-native equivalent shards the
frame's ray axis over a 1-D device mesh instead: every stage of the
megakernel pipeline (ray setup -> oracle -> adaptive select -> encode ->
shading MLP -> composite) is per-ray independent, so the frame partitions
with ZERO collectives — each chip renders its contiguous block-order slice
and the host (or XLA, on the jit boundary) concatenates the slices.

This is the capability axis where the rebuild can beat the reference's
single-GPU design: the at-cap Pavillon S=16 workload is arithmetically
bound at ~9.7 TFLOP/frame (BENCH.md), i.e. ~70 ms on one chip at the MXU
ceiling — 2 chips halve it, 4 reach 30 FPS. Usage: ``bench.py --mesh N``,
``viewer.py --mesh N``, tested on the virtual CPU mesh
(tests/test_parallel_render.py) and dry-run by __graft_entry__ leg 4.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import AXIS

try:  # jax >= 0.8
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map_exp

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_exp(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=False)


def frame_pad(n_pix: int, tile: int, n_devices: int) -> int:
    """Rows the ray array must be padded to: each device's shard must hold
    a whole number of kernel tiles (800x800 over 8 devices at tile 256 ->
    641024 rows, 0.16% pad)."""
    quantum = tile * n_devices
    return ((n_pix + quantum - 1) // quantum) * quantum


def shard_megakernel(mesh: Mesh, mk):
    """Wrap a built megakernel ``run(dirs_pad, pose8, rot_pad) -> (B, 128)``
    so the ray axis is sharded over ``mesh``: each device executes the
    unchanged Pallas kernel on its local (B/n, 128) slice; pose/rotation
    are replicated. No collectives — rays are independent.

    The returned fn is NOT jitted (callers fuse it with their unpermute /
    slicing epilogue under one jit); inputs may be plain (they are placed
    by the jit's in_shardings) but pre-placing dirs with
    ``place_frame_inputs`` avoids a device-0 stopover on large frames.
    """
    return shard_map(
        mk, mesh,
        in_specs=(P(AXIS, None), P(None, None), P(None, None)),
        out_specs=P(AXIS, None))


def place_frame_inputs(mesh: Mesh, dirs_pad, pose8, rot_pad):
    """Device-place the megakernel inputs with the mesh shardings (dirs
    split over rays, pose/rot replicated) so the per-frame jit call never
    funnels the whole ray array through one device."""
    return (jax.device_put(dirs_pad, NamedSharding(mesh, P(AXIS, None))),
            jax.device_put(pose8, NamedSharding(mesh, P())),
            jax.device_put(rot_pad, NamedSharding(mesh, P())))


def devices_mesh(n_devices: int) -> Mesh:
    """1-D rays mesh over the first n_devices of jax.devices()."""
    devices = jax.devices()
    if n_devices > len(devices):
        raise ValueError(f"--mesh {n_devices}: only {len(devices)} "
                         f"device(s) present")
    return Mesh(np.array(devices[:n_devices]), (AXIS,))
