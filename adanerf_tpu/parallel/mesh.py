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

_distributed_initialized = False


def init_multi_host(coordinator_address: str = None, num_processes: int = None,
                    process_id: int = None) -> int:
    """Join (or stand up) a multi-host JAX cluster before any backend use.

    On a TPU pod slice launched through the usual orchestrators (GKE, QR,
    gcloud --worker=all) jax.distributed.initialize() discovers everything
    from the environment, so all three arguments stay None; for manual
    launches pass them explicitly (same contract as jax.distributed).
    Single-process runs (no coordinator, one process) skip initialization
    entirely and fall through to the local-device mesh — this keeps every
    code path CPU-testable.

    Returns the process index (0 on single-process).

    Launch recipe (one line per host):
      ADANERF_COORD=<host0>:8476 ADANERF_NPROC=<N> ADANERF_PROC_ID=<i> \
          python train.py ... --meshDevices -1
    or rely on TPU-pod auto-detection and just run the same command on every
    worker. DCN is only involved in init/checkpoint; the gradient psums ride
    ICI within the global-view jit.
    """
    global _distributed_initialized
    import os

    coordinator_address = coordinator_address or os.environ.get("ADANERF_COORD")
    if num_processes is None and os.environ.get("ADANERF_NPROC"):
        num_processes = int(os.environ["ADANERF_NPROC"])
    if process_id is None and os.environ.get("ADANERF_PROC_ID"):
        process_id = int(os.environ["ADANERF_PROC_ID"])

    explicit = coordinator_address is not None
    in_tpu_pod = bool(os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
                      or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if not _distributed_initialized and (explicit or in_tpu_pod):
        try:
            jax.distributed.initialize(coordinator_address=coordinator_address,
                                       num_processes=num_processes,
                                       process_id=process_id)
            _distributed_initialized = True
        except (ValueError, RuntimeError) as e:
            if explicit:
                raise
            # pod-looking env without a resolvable coordinator (e.g. the
            # single-chip tunnel sets TPU_* placeholders): single-process
            print(f"init_multi_host: auto-detect failed ({e}); "
                  "running single-process")
    return jax.process_index() if _distributed_initialized else 0


def make_mesh(n_devices: int = -1, multi_host: bool = False) -> Mesh:
    """1-D ray-data-parallel mesh. With multi_host=True the mesh spans
    jax.devices() across ALL processes of the jax.distributed cluster
    (init_multi_host must have run first); each process feeds only its
    addressable shard of every rays-sharded array."""
    if multi_host:
        init_multi_host()
    devices = jax.devices()
    if n_devices > 0:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (AXIS,))


def local_batch_slice(mesh: Mesh, n_rays: int) -> slice:
    """The [start, stop) ray range this process must materialize on host for
    a rays-sharded array of global length n_rays (multi-host data loading:
    each host only decodes/uploads its own slice)."""
    n_proc = jax.process_count()
    if n_proc == 1:
        return slice(0, n_rays)
    assert n_rays % n_proc == 0, (n_rays, n_proc)
    per = n_rays // n_proc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


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


def _process_local_put(v, sharding: NamedSharding):
    """Build a global array for `sharding` from this process's slice of the
    host batch `v` (every host assembles the same global batch from the
    shared seed, then feeds only its addressable block — contiguous in
    process order, matching jax.devices() ordering)."""
    if isinstance(v, jax.Array) and getattr(v, "sharding", None) == sharding:
        return v
    v = np.asarray(v)
    if jax.process_count() == 1:
        return jax.device_put(v, sharding)
    idx = [slice(None)] * v.ndim
    spec = sharding.spec
    for ax in range(min(v.ndim, len(spec))):
        if spec[ax] == AXIS:
            n_proc = jax.process_count()
            assert v.shape[ax] % n_proc == 0, (v.shape, ax, n_proc)
            per = v.shape[ax] // n_proc
            i = jax.process_index()
            idx[ax] = slice(i * per, (i + 1) * per)
    return jax.make_array_from_process_local_data(sharding, v[tuple(idx)],
                                                  global_shape=v.shape)


def shard_train_step(ts, mesh: Mesh):
    """Return (jitted_fn, placer): the TrainState's train-step body jitted
    with explicit shardings over the mesh (params/opt replicated, batch
    sharded on rays), plus a helper that places a host batch with the
    right shardings. The global-view jit turns per-shard loss means into
    psum-based global means and gradient psums automatically — no
    hand-written collectives (they ride ICI on real hardware). Works
    unchanged under multi-host (init_multi_host first): each process feeds
    only its addressable ray block via make_array_from_process_local_data."""
    ts.make_train_step()
    raw = ts._train_step_raw
    repl = NamedSharding(mesh, P())
    jitted = jax.jit(raw, out_shardings=(repl, repl, None))

    def place(params, opt_states, batch, targets):
        b_shard, t_shard = batch_shardings(mesh, batch, targets)
        return (jax.tree.map(lambda x: _process_local_put(x, repl), params),
                jax.tree.map(lambda x: _process_local_put(x, repl), opt_states),
                {k: _process_local_put(v, b_shard[k])
                 for k, v in batch.items()},
                {k: _process_local_put(v, t_shard[k])
                 for k, v in targets.items()})

    return jitted, place
