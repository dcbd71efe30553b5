#!/usr/bin/env python
"""Per-rank oracle output statistics for an exported model: the mean and
percentiles of each ray's k-th largest oracle bin value, over one frame.

Tells whether a threshold exists that separates >=2 bins per ray (i.e.
whether the oracle learned a second surface mode), and where it sits.

Usage: python tools/probe_oracle_ranks.py demo/trained_tscene_export
"""

import argparse
import os
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("export_dir")
    ap.add_argument("--ranks", type=int, default=8)
    cli = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from viewer import build_renderer_from_export
    from adanerf_tpu.ops.raygen import generate_ray_directions
    from adanerf_tpu.ops.raymarch import ray_sphere_offset

    w = h = 800
    rt, scene = build_renderer_from_export(cli.export_dir, 80_000)
    focal = 0.5 * w / np.tan(0.5 * scene.fov)
    directions = generate_ray_directions(w, h, scene.fov, focal) \
        .reshape(-1, 3).astype(np.float32)
    n_pix = directions.shape[0]
    dirs_dev = jnp.asarray(directions)
    B = rt.batch_size
    p0 = rt.params[0]
    rot = jnp.eye(3)
    center = jnp.asarray(scene.view_cell_center)
    rng = np.random.RandomState(1)
    pose = jnp.asarray(np.asarray(scene.view_cell_center)
                       + rng.uniform(-1.0, 1.0, 3)
                       * 0.38 * scene.view_cell_radius, jnp.float32)
    R = cli.ranks

    @jax.jit
    def rank_stats(p0):
        nb = n_pix // B
        db = dirs_dev[:nb * B].reshape(B, nb, 3).transpose(1, 0, 2)

        def f(carry, chunk):
            nds = chunk @ rot.T
            origins = jnp.broadcast_to(pose, nds.shape)
            dist = ray_sphere_offset(nds, origins, center,
                                     scene.view_cell_radius)
            proj = origins + nds * dist[:, None]
            out = rt.oracle_def.apply(p0, jnp.concatenate(
                [rt.enc0_dir(nds), rt.enc0_pos(proj)], -1))
            top = jax.lax.top_k(out, R)[0]  # (B, R)
            return carry, top

        _c, tops = jax.lax.scan(f, 0, db)
        return tops.reshape(-1, R)

    tops = np.asarray(rank_stats(p0))
    print(f"# export={cli.export_dir} rays={tops.shape[0]}")
    print("rank  mean      p50       p90       p99")
    for k in range(R):
        v = tops[:, k]
        print(f"{k + 1:>4}  {v.mean():.5f}  {np.percentile(v, 50):.5f}  "
              f"{np.percentile(v, 90):.5f}  {np.percentile(v, 99):.5f}")


if __name__ == "__main__":
    main()
