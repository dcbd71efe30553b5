"""Multi-device scaling via jax.sharding + pjit.

The reference is strictly single-GPU (SURVEY.md §2.3: no DistributedDataParallel,
no NCCL/MPI anywhere); this module is the additive TPU-native scale-out layer.

The natural parallel axis of the AdaNeRF workload is RAYS: both MLPs are tiny
(256-wide — tensor-parallelism would waste ICI), the cascade is a dataflow
within one program (no pipeline stages to split), so the mesh is a 1-D
``("rays",)`` data-parallel axis. Parameters are replicated; every batch
array is sharded on its ray dimension; XLA inserts the gradient psum and
metric all-reduces automatically from the global-view jit. Multi-host extends
the same mesh via jax.distributed.initialize (DCN only for init/checkpoint).
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..pipeline.keys import DatasetKeys

AXIS = "rays"


def make_mesh(n_devices: int = -1) -> Mesh:
    devices = jax.devices()
    if n_devices > 0:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (AXIS,))


def batch_shardings(mesh: Mesh, batch: Dict, targets: Dict):
    """NamedShardings for a training batch: ray axes sharded, tiny per-image
    arrays replicated."""
    repl = NamedSharding(mesh, P())
    ray2 = NamedSharding(mesh, P(None, AXIS))       # (n_img, R, ...) arrays
    ray3 = NamedSharding(mesh, P(None, AXIS, None))

    b_shard = {}
    for k, v in batch.items():
        if k == DatasetKeys.ray_directions_samples:
            b_shard[k] = ray3
        elif k == DatasetKeys.depth_image_samples:
            b_shard[k] = NamedSharding(mesh, P(AXIS, None))
        else:
            b_shard[k] = repl
    t_shard = {}
    for k, v in targets.items():
        if hasattr(v, 'ndim') and v.ndim == 3:
            t_shard[k] = ray3
        else:
            t_shard[k] = NamedSharding(mesh, P(AXIS, None))
    return b_shard, t_shard


def shard_train_step(ts, mesh: Mesh):
    """Return (jitted_fn, placer): the TrainState's train-step body jitted
    with explicit shardings over the mesh (params/opt replicated, batch
    sharded on rays), plus a helper that device_puts a host batch with the
    right shardings. The global-view jit turns per-shard loss means into
    psum-based global means and gradient psums automatically — no
    hand-written collectives (they ride ICI on real hardware)."""
    ts.make_train_step()
    raw = ts._train_step_raw
    repl = NamedSharding(mesh, P())
    jitted = jax.jit(raw, out_shardings=(repl, repl, None))

    def place(params, opt_states, batch, targets):
        b_shard, t_shard = batch_shardings(mesh, batch, targets)
        return (jax.device_put(params, repl),
                jax.device_put(opt_states, repl),
                {k: jax.device_put(np.asarray(v), b_shard[k])
                 for k, v in batch.items()},
                {k: jax.device_put(np.asarray(v), t_shard[k])
                 for k, v in targets.items()})

    return jitted, place
