#!/usr/bin/env python
"""Head-to-head frame benchmark of the fused megakernel variants on the real
TPU at the reference viewer workload (800x800, thr 0.2, ~2.5 avg samples/px).

Usage: python tools/bench_megakernel.py [v3] [v5] [v5:tile=512,chunk=256] ...
Prints one line per variant: name, frame ms, FPS, Mrays/s.
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import build_workload
    from adanerf_tpu.ops.pallas.megakernel import (make_megakernel,
                                                   pack_oracle_weights,
                                                   prep_inputs)
    from adanerf_tpu.ops.pallas.megakernel3 import make_megakernel_compact
    from adanerf_tpu.ops.pallas.megakernel4 import make_megakernel_supertile
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

    variants = sys.argv[1:] or ["v3", "v5"]
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
        rt, directions, scene = workload(avg_target)
        n_pix = directions.shape[0]
        p0, p1 = rt.params[0], rt.params[1]
        mk_cfg = SimpleNamespace(
            numRaymarchSamples=[128, rt.max_samples],
            adaptiveSamplingThreshold=rt.threshold,
            posEnc=["nerf", "nerf"], posEncArgs=["10-4", "10-4"],
            accumulationMult="alpha")
        po = pack_oracle_weights(rt.oracle_def, p0, dtype=jnp.bfloat16)
        pn = pack_nerf_weights(rt.nerf_def, p1, dtype=jnp.bfloat16)
        dirs_pad, _, rot_pad = prep_inputs(jnp.asarray(directions),
                                           jnp.zeros(3), jnp.eye(3))
        pose_row = jnp.zeros((1, 128), jnp.float32).at[0, :3].set(
            jnp.asarray(np.asarray(scene.view_cell_center, np.float32) + 0.1))
        t0 = time.perf_counter()
        try:
            if name == "v3":
                run = make_megakernel(rt.oracle_def, rt.nerf_def, scene,
                                      mk_cfg, **kw)(po, pn)
            elif name in ("v5", "v7"):
                if "dyn" in kw:
                    kw["dynamic"] = bool(kw.pop("dyn"))
                if name == "v7":
                    mults = kw.pop("mults", "1-2-3-4-6-8")
                    kw["chunk_mults"] = tuple(
                        int(m) for m in str(mults).split("-"))
                run = make_megakernel_compact(rt.oracle_def, rt.nerf_def,
                                              scene, mk_cfg, **kw)(po, pn)
            elif name == "v6":
                if "dyn" in kw:
                    kw["dyn_loop"] = bool(kw.pop("dyn"))
                run = make_megakernel_supertile(rt.oracle_def, rt.nerf_def,
                                                scene, mk_cfg, **kw)(po, pn)
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
