#!/usr/bin/env python
"""Probe an exported model's oracle: avg kept samples/px vs threshold.

Usage: python tools/probe_threshold.py demo/trained_tscene_export \
           [--thresholds 0.2,0.1,0.05,0.02,0.01] [--poses 4]

For each threshold, runs the oracle stage of the realtime renderer over a
full 800x800 frame at in-cell poses (same pose distribution bench.py uses)
and reports the average live samples/px the select would keep. Because the
fine phase trains with the oracle LOCKED (configs/fine_training.ini
epochsLockWeightsAfter=[0,-1], mirroring the reference), this statistic
equals what a fine model retrained at that threshold would measure.

Reference analog: the viewer lets the threshold be changed at runtime and
reports avg samples (adanerf_real_time_viewer, imagegenerator.cpp's
per-frame sample counter).
"""

import argparse
import os
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("export_dir")
    ap.add_argument("--thresholds", default="0.2,0.15,0.1,0.05,0.02,0.01")
    ap.add_argument("--poses", type=int, default=4)
    cli = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from viewer import build_renderer_from_export
    from adanerf_tpu.ops.raygen import generate_ray_directions

    w = h = 800
    rt, scene = build_renderer_from_export(cli.export_dir, 80_000)
    focal = 0.5 * w / np.tan(0.5 * scene.fov)
    directions = generate_ray_directions(w, h, scene.fov, focal) \
        .reshape(-1, 3).astype(np.float32)
    n_pix = directions.shape[0]
    dirs_dev = jnp.asarray(directions)
    B = rt.batch_size
    p0 = rt.params[0]

    rng = np.random.RandomState(1)
    center = np.asarray(scene.view_cell_center)
    poses = [jnp.asarray(center + rng.uniform(-1.0, 1.0, 3)
                         * 0.38 * scene.view_cell_radius, jnp.float32)
             for _ in range(cli.poses)]
    rot = jnp.eye(3)
    max_s = rt.config.numRaymarchSamples[-1]

    from adanerf_tpu.ops.raymarch import ray_sphere_offset
    center_dev = jnp.asarray(scene.view_cell_center)

    @jax.jit
    def counts_for(p0, pose, thr):
        nb = n_pix // B
        db = dirs_dev[:nb * B].reshape(B, nb, 3).transpose(1, 0, 2)

        def f(carry, chunk):
            # oracle features are ALWAYS world-space (features.py SpherePosDir
            # projects onto the view-cell sphere; same math as realtime.py's
            # _oracle_stage front)
            nds = chunk @ rot.T
            origins = jnp.broadcast_to(pose, nds.shape)
            dist = ray_sphere_offset(nds, origins, center_dev,
                                     scene.view_cell_radius)
            proj = origins + nds * dist[:, None]
            out = rt.oracle_def.apply(p0, jnp.concatenate(
                [rt.enc0_dir(nds), rt.enc0_pos(proj)], -1))
            kept = jnp.clip((out >= thr).sum(-1), 1, max_s)
            return carry, kept.sum()

        _c, t = jax.lax.scan(f, 0, db)
        return t.sum()

    print(f"# export={cli.export_dir} max_samples={max_s} "
          f"trained_thr={rt.config.adaptiveSamplingThreshold}")
    for thr in [float(t) for t in cli.thresholds.split(",")]:
        tot = np.mean([float(counts_for(p0, pse, jnp.float32(thr)))
                       for pse in poses])
        print(f"thr={thr:<6} avg_samples_px={tot / n_pix:.3f}")


if __name__ == "__main__":
    main()
