#!/usr/bin/env python
"""Benchmark: AdaNeRF adaptive real-time rendering throughput on one TPU chip.

Replicates the reference viewer's benchmark workload
(adanerf_real_time_viewer/README.md:26-28): 800x800 frame, 80,000-ray
batches (8 per frame), full-size networks (oracle relu 256x8 -> 128 bins,
shading NeRF 256x8, posEnc 10-4), adaptiveSamplingThreshold=0.2, max 8
samples/ray — through the fully on-device bucketed-compaction pipeline
(adanerf_tpu/realtime.py): one jitted program per frame, in-graph capacity
bucketing via lax.switch, zero host round-trips inside the frame.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is FPS / 30 (BASELINE.json north star: >=30 FPS-equivalent at
800x800 on one v5e chip).
"""

import json
import sys
import time
from types import SimpleNamespace

import numpy as np


def build_workload(w=800, h=800, max_samples=8, threshold=0.2,
                   target_avg_samples=4.0, batch_size=80_000, seed=0):
    import jax
    import jax.numpy as jnp

    from adanerf_tpu.models.mlp import BaseNetDef, NeRFDef
    from adanerf_tpu.ops.raygen import generate_ray_directions
    from adanerf_tpu.pipeline.features import SceneStatic
    from adanerf_tpu.ops.depth_transforms import LogTransform
    from adanerf_tpu.realtime import RealtimeRenderer

    fov = 0.69  # ~ DONeRF classroom camera_angle_x
    focal = 0.5 * w / np.tan(0.5 * fov)
    scene = SceneStatic(
        w=w, h=h, fov=fov, focal=focal,
        view_cell_center=(0.0, 0.0, 0.0), view_cell_radius=0.52,
        depth_range=(0.5, 20.0), depth_range_warped=(0.03, 20.0),
        depth_transform=LogTransform, depth_max=20.0)

    oracle = BaseNetDef(depth=8, width=256, n_in=90, n_out=128, skip="",
                        net_idx=0)
    nerf = NeRFDef(depth=8, width=256, input_ch=63, input_ch_views=27,
                   n_out=4, skips=(4,), net_idx=1)
    key = jax.random.PRNGKey(seed)
    k0, k1 = jax.random.split(key)
    params = [oracle.init(k0), nerf.init(k1)]

    config = SimpleNamespace(
        numRaymarchSamples=[128, max_samples],
        adaptiveSamplingThreshold=threshold,
        posEnc=["nerf", "nerf"], posEncArgs=["10-4", "10-4"],
        rayMarchNormalization=["InverseSqrtDistCentered",
                               "InverseSqrtDistCentered"],
        accumulationMult="alpha")

    directions = generate_ray_directions(w, h, fov, focal) \
        .reshape(-1, 3).astype(np.float32)

    # calibrate: shift the oracle output bias so the thresholded top-k keeps
    # ~target_avg_samples samples/ray — an honest adaptive workload with
    # untrained weights (a trained classroom oracle keeps ~2-4 of 8)
    rt_probe = RealtimeRenderer([oracle, nerf], params, scene, config,
                                batch_size=8192)
    pose = jnp.asarray(scene.view_cell_center, jnp.float32)
    rot = jnp.eye(3)
    probe_dirs = jnp.asarray(directions[:: max(len(directions) // 8192, 1)][:8192])
    # run the real feature math (sphere projection) for the probe
    _probe = jax.jit(lambda p: rt_probe._oracle_stage(p, pose, rot, probe_dirs))
    proj, nds, _, _, _, _ = _probe(params[0])
    out = np.asarray(oracle.apply(params[0], jnp.concatenate(
        [rt_probe.enc0_dir(nds), rt_probe.enc0_pos(proj)], -1)))

    def avg_kept(shift):
        counts = (out + shift >= threshold).sum(axis=1)
        return np.minimum(counts, max_samples).mean()

    lo, hi = -50.0, 50.0
    for _ in range(60):
        mid = 0.5 * (lo + hi)
        if avg_kept(mid) < target_avg_samples:
            lo = mid
        else:
            hi = mid
    params[0][-1]["b"] = params[0][-1]["b"] + 0.5 * (lo + hi)

    rt = RealtimeRenderer([oracle, nerf], params, scene, config,
                          batch_size=batch_size)
    return rt, directions, scene


def main():
    import jax
    import jax.numpy as jnp

    w = h = 800
    rt, directions, scene = build_workload(w, h)
    n_pix = directions.shape[0]

    render = rt.make_frame_renderer(n_pix)
    dirs_dev = jnp.asarray(directions)  # uploaded once
    p0, p1 = rt.params[0], rt.params[1]

    # NOTE: through the axon tunnel, block_until_ready() does not reflect
    # device completion; the only honest fence is a (tiny) readback. We warm
    # the transfer path once, then time N chained frames ending in a scalar
    # readback and subtract the per-readback latency measured separately.
    probe = jax.jit(lambda f: jnp.sum(f[:2, :2]))

    rng = np.random.RandomState(1)
    center = np.asarray(scene.view_cell_center)
    poses = [jnp.asarray(center + rng.uniform(-0.2, 0.2, 3), jnp.float32)
             for _ in range(64)]
    rot = jnp.eye(3)

    # compile + warm transfer path
    frame, n_acts = render(p0, p1, poses[0], rot, dirs_dev)
    float(probe(frame))
    t0 = time.perf_counter()
    float(probe(frame))
    read_latency = time.perf_counter() - t0

    def run(n_frames):
        t0 = time.perf_counter()
        last = None
        for f in range(n_frames):
            last, n_acts = render(p0, p1, poses[f % len(poses)], rot, dirs_dev)
        float(probe(last))
        return time.perf_counter() - t0, n_acts

    dt1, _ = run(4)
    dt2, n_acts = run(24)
    # slope between the two chain lengths removes fixed dispatch/readback cost
    per_frame_s = (dt2 - dt1) / (24 - 4)

    rays_per_s = n_pix / per_frame_s
    fps = 1.0 / per_frame_s
    avg_samples = float(np.sum(np.asarray(n_acts))) / n_pix

    print(json.dumps({
        "metric": "adaptive_render_rays_per_sec_800x800_thr0.2",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(fps / 30.0, 3),
    }))
    print(f"# fps={fps:.2f} frame_ms={per_frame_s * 1e3:.2f} "
          f"avg_samples/px={avg_samples:.2f} read_latency_ms="
          f"{read_latency * 1e3:.1f} buckets={rt.capacities}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
