#!/usr/bin/env python
"""Training-throughput benchmark: steps/s of the fused dense-training program
at the reference's workload (2 images x 2048 rays x 128 samples, oracle
256x8->128 + NeRF 256x8, joint blended losses, Adam) and at a TPU-sized batch.

The reference trains 300,001 epochs of this step on an RTX 3090; this reports
the projected wall-clock for the same schedule on one TPU chip.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    float(jnp.zeros(()))  # pay the tunnel's first-readback init

    from adanerf_tpu.config import Config
    from adanerf_tpu.train_state import TrainState
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from scene_utils import make_scene

    scene_dir = "/tmp/bench_train_scene"
    if not os.path.exists(os.path.join(scene_dir, "dataset_info.json")):
        make_scene(scene_dir, w=128, h=128, n_train=8)

    for samples, n_raymarch, width, layers, label in [
            (2048, 128, 256, 8, "reference workload (2x2048 rays, 128 smp)"),
            (4096, 128, 256, 8, "TPU-sized batch (2x4096 rays, 128 smp)"),
            (8192, 128, 256, 8, "TPU-sized batch (2x8192 rays, 128 smp)"),
            (16384, 128, 256, 8, "TPU-sized batch (2x16384 rays, 128 smp)")]:
        args = [
            "-data", scene_dir, "-log", "/tmp/bench_train_logs",
            "--depthTransform", "log", "--scale", "1",
            "--inFeatures", "SpherePosDir", "--inFeatures", "RayMarchFromPoses",
            "--outFeatures", "RawSigmoid", "--outFeatures", "RGBARayMarch",
            "--posEnc", "nerf", "--posEnc", "nerf",
            "--posEncArgs", "10-4", "--posEncArgs", "10-4",
            "--raySampleInput", "0", "--raySampleInput", "0",
            "--multiDepthFeatures", "128", "--multiDepthFeatures", "128",
            "--multiDepthIgnoreValue", "1.01", "--multiDepthIgnoreValue", "1.01",
            "--activation", "relu", "--activation", "nerf",
            "--layers", str(layers), "--layers", str(layers),
            "--layerWidth", str(width), "--layerWidth", str(width),
            "--skips", " ", "--skips", "auto",
            "--epochs", "301", "--samples", str(samples),
            "--batchImages", "2", "--lrate", "5e-4",
            "--losses", "NeRFWeightMultiplicationLoss", "--losses", "MSE",
            "--lossWeights", "0.025", "--lossWeights", "1.0",
            "--numRaymarchSamples", str(n_raymarch),
            "--numRaymarchSamples", str(n_raymarch),
            "--rayMarchSampler", "none",
            "--rayMarchSampler", "FromClassifiedDepthAdaptive",
            "--rayMarchSamplingStep", "0.0078125",
            "--rayMarchSamplingStep", "0.0078125",
            "--rayMarchNormalization", "InverseSqrtDistCentered",
            "--rayMarchNormalization", "InverseSqrtDistCentered",
            "--adaptiveSamplingThreshold", "0.0",
            "--accumulationMult", "alpha",
            "--lossComponents", "One", "--lossComponents", "Zero",
            "--lossComponents", "NerfA",
            "--lossComponentBlending", "-1.0", "--lossComponentBlending", "-1.0",
            "--lossComponentBlending", "-1.0",
            "--lossBlendingStart", "25000", "--lossBlendingDuration", "50000",
            "--bf16",
        ]
        from adanerf_tpu.config import Config as _C
        _C.reset() if hasattr(_C, 'reset') else None
        config = Config.init(argv=args)
        ts = TrainState()
        ts.initialize(config)
        step = ts.make_train_step()

        batch, targets = ts.assemble_train_batch(ts.train_dataset,
                                                 np.array([0, 1]))
        # compile
        try:
            ts.params, ts.opt_states, per = step(ts.params, ts.opt_states,
                                                 batch, targets, jnp.asarray(0),
                                                 jax.random.PRNGKey(0))
            float(per[1])
        except Exception as e:
            print(f"{label}: FAILED to compile ({type(e).__name__})")
            continue

        def run(n):
            t0 = time.perf_counter()
            p = None
            for e in range(n):
                ts.params, ts.opt_states, p = step(
                    ts.params, ts.opt_states, batch, targets,
                    jnp.asarray(e + 1), jax.random.PRNGKey(e + 1))
            float(p[1])
            return time.perf_counter() - t0

        try:
            d1 = run(5)
            d2 = run(45)
        except Exception as e:
            print(f"{label}: FAILED ({type(e).__name__})")
            continue
        per_step = (d2 - d1) / 40
        total_rays = 2 * samples
        print(f"{label}: {per_step * 1e3:.2f} ms/step "
              f"({1 / per_step:.1f} steps/s, "
              f"{total_rays * n_raymarch / per_step / 1e6:.1f} Msamples/s) "
              f"-> 300k epochs in {per_step * 300000 / 3600:.2f} h")


if __name__ == "__main__":
    main()
