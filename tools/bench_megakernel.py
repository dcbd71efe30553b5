#!/usr/bin/env python
"""Head-to-head frame benchmark of the fused megakernel variants on the real
TPU at the reference viewer workload (800x800, thr 0.2, ~2.5 avg samples/px).

Usage: python tools/bench_megakernel.py [v3] [v5] [v5:tile=512,chunk=256] ...
       python tools/bench_megakernel.py --export-dir demo/trained_ndc_export \
           v5 v5:stop_after=oracle ...
Prints one line per variant: name, frame ms, FPS, Mrays/s.

With --export-dir the workload is a TRAINED export (same model/scene/ray
order bench.py times: 800x800, square-block ray permutation, in-cell pose);
without it the calibrated random-weights workload (avg=NN sets the target
samples/px x10, scan ray order).
"""

import argparse
import sys
import time

import numpy as np


def _flag(v):
    """Variant options arrive as int or string; 'false'/'off'/'no' are off
    (bool('false') is True — the trap this avoids)."""
    return str(v).lower() not in ("0", "false", "no", "off")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--export-dir", default=None)
    ap.add_argument("variants", nargs="*", default=None)
    cli = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import build_workload
    from adanerf_tpu.ops.pallas.megakernel import (make_megakernel,
                                                   pack_oracle_weights,
                                                   prep_inputs)
    from adanerf_tpu.ops.pallas.megakernel3 import make_megakernel_compact
    from adanerf_tpu.ops.pallas.megakernel import pack_nerf_weights
    from adanerf_tpu.utils.profiling import chain_slope_time
    from types import SimpleNamespace

    t0 = time.perf_counter()
    float(jnp.zeros(()))
    print(f"# init readback {time.perf_counter() - t0:.0f}s", flush=True)

    w = h = 800
    cache = {}

    def workload(avg):
        if avg not in cache:
            cache[avg] = build_workload(w, h, target_avg_samples=avg)
        return cache[avg]

    export_rt = None
    if cli.export_dir:
        from adanerf_tpu.ops.raygen import generate_ray_directions
        from viewer import build_renderer_from_export
        export_rt, export_scene = build_renderer_from_export(
            cli.export_dir, 80_000)
        focal = 0.5 * w / np.tan(0.5 * export_scene.fov)
        export_dirs = generate_ray_directions(
            w, h, export_scene.fov, focal).reshape(-1, 3).astype(np.float32)

    variants = cli.variants or ["v3", "v5"]
    for spec in variants:
        name, _, opts = spec.partition(":")
        kw = {}
        for kv in opts.split(","):
            if kv:
                k, v = kv.split("=")
                try:
                    kw[k] = int(v)
                except ValueError:
                    kw[k] = v
        avg_target = kw.pop("avg", 25) / 10.0  # avg=12 -> 1.2 samples/px
        if export_rt is not None:
            rt, directions, scene = export_rt, export_dirs, export_scene
            mk_cfg = rt.config
        else:
            rt, directions, scene = workload(avg_target)
            mk_cfg = SimpleNamespace(
                numRaymarchSamples=[128, rt.max_samples],
                adaptiveSamplingThreshold=rt.threshold,
                posEnc=["nerf", "nerf"], posEncArgs=["10-4", "10-4"],
                rayMarchNormalization=["InverseSqrtDistCentered",
                                       "InverseSqrtDistCentered"],
                accumulationMult="alpha")
        n_pix = directions.shape[0]
        p0, p1 = rt.params[0], rt.params[1]
        po = pack_oracle_weights(rt.oracle_def, p0, dtype=jnp.bfloat16)
        pn = pack_nerf_weights(rt.nerf_def, p1, dtype=jnp.bfloat16)
        mk_dirs = directions
        if export_rt is not None:
            from viewer import block_permutation
            perm, _inv = block_permutation(w, h, kw.get("tile", 256))
            if perm is not None:
                mk_dirs = directions[perm]
        dirs_pad, _, rot_pad = prep_inputs(jnp.asarray(mk_dirs),
                                           jnp.zeros(3), jnp.eye(3))
        pose_np = np.asarray(scene.view_cell_center, np.float32)
        pose_np = pose_np + (0.2 * float(scene.view_cell_radius)
                             if export_rt is not None else 0.1)
        pose_row = jnp.zeros((1, 128), jnp.float32).at[0, :3].set(
            jnp.asarray(pose_np))
        t0 = time.perf_counter()
        try:
            if name == "v3":
                run = make_megakernel(rt.oracle_def, rt.nerf_def, scene,
                                      mk_cfg, **kw)(po, pn)
            elif name == "v5":
                if "dyn" in kw:
                    kw["dynamic"] = _flag(kw.pop("dyn"))
                if "dense" in kw:
                    kw["dense_path"] = _flag(kw.pop("dense"))
                if "dcost" in kw:
                    kw["dense_cost"] = int(kw.pop("dcost"))
                run = make_megakernel_compact(
                    rt.oracle_def, rt.nerf_def, scene, mk_cfg,
                    **kw)(po, pn)
            else:
                raise ValueError(name)
            out = run(dirs_pad, pose_row, rot_pad)
            avg = float(jnp.mean(out[:, 3]))
            compile_s = time.perf_counter() - t0
            ms = chain_slope_time(run, (dirs_pad, pose_row, rot_pad))
            print(f"{spec}: {ms:.1f} ms/frame  {1e3 / ms:.2f} FPS  "
                  f"{n_pix / ms / 1e3:.2f} Mrays/s  avg_smp={avg:.2f}  "
                  f"compile={compile_s:.0f}s", flush=True)
        except Exception as e:
            print(f"{spec}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
