#!/usr/bin/env python
"""Stage-bisection profiler for the realtime frame pipeline on the tunnel TPU.

block_until_ready is not a completion fence through the axon tunnel, so each
variant is timed by the chain-slope method: run N frames chained, end with a
scalar readback, and take the slope between two chain lengths.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_workload
import jax.numpy as _jnp; float(_jnp.zeros(()))
from adanerf_tpu.ops.samplers import adaptive_select


def slope_time(fn, args, n1=2, n2=10):
    probe = jax.jit(lambda f: jnp.sum(jnp.ravel(f)[:4]))

    def run(n):
        t0 = time.perf_counter()
        r = None
        for i in range(n):
            r = fn(*args)
        float(probe(r[0] if isinstance(r, tuple) else r))
        return time.perf_counter() - t0

    run(1)  # compile + warm
    d1 = run(n1)
    d2 = run(n2)
    return (d2 - d1) / (n2 - n1) * 1e3


def main():
    rt, directions, scene = build_workload()
    n_pix = directions.shape[0]
    B = rt.batch_size
    n_batches = n_pix // B
    dirs_dev = jnp.asarray(directions)
    p0, p1 = rt.params
    pose = jnp.asarray(scene.view_cell_center, jnp.float32)
    rot = jnp.eye(3)

    def scan_frame(body):
        @jax.jit
        def render(p0, p1, pose, rot, dirs_full):
            starts = jnp.arange(n_batches, dtype=jnp.int32) * B
            def one(carry, start):
                chunk = jax.lax.dynamic_slice(dirs_full, (start, 0), (B, 3))
                return carry, body(p0, p1, pose, rot, chunk)
            _, out = jax.lax.scan(one, 0, starts)
            return out
        return render

    # 1. oracle MLP only
    def oracle_only(p0, p1, pose, rot, chunk):
        sc = rt.scene
        nds = chunk @ rot.T
        center = jnp.asarray(sc.view_cell_center)
        origins = jnp.broadcast_to(pose, nds.shape)
        from adanerf_tpu.ops.raymarch import ray_sphere_offset
        distance = ray_sphere_offset(nds, origins, center, sc.view_cell_radius)
        proj = origins + nds * distance[:, None]
        x = jnp.concatenate([rt.enc0_dir(nds), rt.enc0_pos(proj)], -1)
        out = rt.oracle_def.apply(p0, x, dtype=rt.dtype)
        return jnp.sum(out, axis=-1)
    print(f"frame: oracle only          {slope_time(scan_frame(oracle_only), (p0, p1, pose, rot, dirs_dev)):8.1f} ms")

    # 2. oracle + select
    def oracle_select(p0, p1, pose, rot, chunk):
        proj, nds, z, zp, m, n = rt._oracle_stage(p0, pose, rot, chunk)
        return jnp.sum(z * zp, axis=-1) + n
    print(f"frame: oracle + select      {slope_time(scan_frame(oracle_select), (p0, p1, pose, rot, dirs_dev)):8.1f} ms")

    # 3. + dense shade
    def full_dense(p0, p1, pose, rot, chunk):
        proj, nds, z, zp, m, n = rt._oracle_stage(p0, pose, rot, chunk)
        return rt._dense_shade_stage(p1, proj, nds, z, zp, m)
    print(f"frame: full dense shade     {slope_time(scan_frame(full_dense), (p0, p1, pose, rot, dirs_dev)):8.1f} ms")

    # 4. + compacted shade fixed capacity (no switch)
    for cap in rt.capacities:
        def full_compact(p0, p1, pose, rot, chunk, cap=cap):
            proj, nds, z, zp, m, n = rt._oracle_stage(p0, pose, rot, chunk)
            return rt._shade_stage(p1, proj, nds, z, zp, m, capacity=cap)
        print(f"frame: compact cap={cap:7d}  {slope_time(scan_frame(full_compact), (p0, p1, pose, rot, dirs_dev)):8.1f} ms")

    # 5. full production renderer (switch)
    render = rt.make_frame_renderer(n_pix)
    print(f"frame: full with switch     {slope_time(render, (p0, p1, pose, rot, dirs_dev)):8.1f} ms")


if __name__ == "__main__":
    main()
