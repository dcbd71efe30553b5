#!/usr/bin/env python
"""Bisect the production-kernel PSNR deficit by precision stage.

Round-2 measured the fused Pallas kernel 0.19 dB under the fp32 XLA path
against BASELINE.md's 0.1 dB bar, and ruled out shading-MLP rounding alone
(explains ~60 dB image agreement; observed 41.7 dB).  The remaining
suspects differ in WHERE they live:

  * oracle-MLP bf16 rounding  -> selection flips + premultiplied-p errors
    (present in the bf16 XLA path AND the kernel),
  * shading-MLP bf16 rounding (same),
  * kernel-only machinery (lane-packed encode, hi/lo gather, slot build).

The XLA realtime path runs everything except the two MLPs in f32, so the
{bf16, oracle32, nerf32, fp32} XLA variants isolate each MLP's rounding,
and (kernel - bf16 XLA) isolates the kernel-only machinery.  Usage:

    python tools/precision_study.py demo/trained_sphere_export demo/scene \
        [--n-frames 2] [--variants bf16,oracle32,nerf32,fp32]

Reports per-variant PSNR-vs-GT and PSNR-vs-fp32.  Runs on CPU (slow) or
TPU (fast); numerics identical per backend's dot rounding.
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("export_dir")
    ap.add_argument("scene_dir")
    ap.add_argument("--set", default="test")
    ap.add_argument("--n-frames", type=int, default=2)
    ap.add_argument("--variants", default="bf16,oracle32,nerf32,fp32")
    args = ap.parse_args()

    from adanerf_tpu.platform import apply_platform_env
    apply_platform_env()

    import imageio.v2 as imageio

    from adanerf_tpu.ops.raygen import generate_ray_directions
    from viewer import build_renderer_from_export

    with open(os.path.join(args.scene_dir, "dataset_info.json")) as f:
        info = json.load(f)
    w, h = info["resolution"]
    with open(os.path.join(args.scene_dir,
                           f"transforms_{args.set}.json")) as f:
        frames = json.load(f)["frames"][:args.n_frames]

    variants = args.variants.split(",")
    if "fp32" not in variants:
        variants.append("fp32")

    imgs = {v: [] for v in variants}
    gts = []
    dirs = None
    for v in variants:
        rt, scene = build_renderer_from_export(args.export_dir,
                                               batch_size=80_000, dtype_str=v)
        if dirs is None:
            focal = 0.5 * w / np.tan(0.5 * scene.fov)
            dirs = generate_ray_directions(w, h, scene.fov, focal) \
                .reshape(-1, 3).astype(np.float32)
        for fr in frames:
            t = np.array(fr["transform_matrix"], np.float32)
            img = np.clip(np.asarray(
                rt.render_frame(t[:3, 3], t[:3, :3], dirs)), 0, 1) \
                .reshape(h, w, 3)
            imgs[v].append(img)
            if v == variants[0]:
                gt_path = os.path.join(args.scene_dir,
                                       fr["file_path"][2:] + ".png")
                gts.append(imageio.imread(gt_path)
                           .astype(np.float32)[..., :3] / 255.0)
        print(f"# rendered {v}", flush=True)

    out = {}
    for v in variants:
        a = np.stack(imgs[v])
        out[v] = {
            "psnr_gt": psnr(a, np.stack(gts)),
            # per-image mean — the SAME aggregate tools/eval_megakernel.py
            # reports, so kernel rows are directly comparable
            "psnr_gt_mean": float(np.mean(
                [psnr(i, g) for i, g in zip(imgs[v], gts)])),
            "psnr_vs_fp32": psnr(a, np.stack(imgs["fp32"]))}
        print(f"{v:9s} psnr_gt={out[v]['psnr_gt']:.3f} "
              f"psnr_gt_mean={out[v]['psnr_gt_mean']:.3f} "
              f"psnr_vs_fp32={out[v]['psnr_vs_fp32']:.3f}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
