#!/usr/bin/env python
"""Quality x speed coupling on ONE model: render a scene's test split through
the production fused Pallas megakernel (the path bench.py/viewer.py time) and
report per-image + mean PSNR against the ground-truth PNGs, plus the same
frames through the fp32 XLA chunked renderer for a kernel-vs-reference-path
delta. This is the TPU analog of the reference's claim that the CUDA viewer
renders "within 0.1 dB" of the offline evaluator (imagegenerator.cpp:370-393
vs evaluate.py:322-342).

Usage:
  python tools/eval_megakernel.py <export_dir> <scene_dir> [--out dir]
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
    ap.add_argument("scene_dir", nargs="?", default=None,
                    help="GT scene dir; omit with --orbit to compare the "
                         "kernel against the fp32 pipeline only (converted "
                         "reference exports have no in-repo ground truth)")
    ap.add_argument("--out", default=None, help="dump rendered frames here")
    ap.add_argument("--set", default="test")
    ap.add_argument("--fp32-delta", action="store_true",
                    help="also render through the fp32 XLA chunked pipeline "
                         "and report the kernel-vs-fp32 PSNR delta")
    ap.add_argument("--variant", default="v5", help="kernel variant (v3/v5/v5d)")
    ap.add_argument("--n-frames", type=int, default=0,
                    help="limit to the first N frames (0 = all)")
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--mlp-f32", action="store_true",
                    help="diagnostic: f32 weight packing + highest matmul "
                         "precision (all in-kernel matmuls exact)")
    ap.add_argument("--pack-f32", action="store_true",
                    help="diagnostic: f32 weight packing at DEFAULT matmul "
                         "precision (MXU still rounds inputs to bf16 — "
                         "isolates storage rounding from input rounding)")
    ap.add_argument("--oracle-split", action="store_true",
                    help="hi/lo-split oracle-MLP activations (2-pass)")
    ap.add_argument("--nerf-split", action="store_true",
                    help="hi/lo-split shading-MLP activations (2-pass)")
    ap.add_argument("--orbit", type=int, default=0,
                    help="render N in-cell orbit poses instead of a GT test "
                         "split (implies --fp32-delta vs-fp32 only)")
    args = ap.parse_args()
    if args.orbit == 0 and args.scene_dir is None:
        ap.error("need a scene_dir or --orbit N")

    from adanerf_tpu.platform import apply_platform_env
    apply_platform_env()

    import imageio.v2 as imageio
    import jax.numpy as jnp

    from adanerf_tpu.ops.raygen import generate_ray_directions
    from viewer import build_megakernel_renderer, build_renderer_from_export

    if args.orbit:
        args.fp32_delta = True
        frames = None
    else:
        with open(os.path.join(args.scene_dir, "dataset_info.json")) as f:
            info = json.load(f)
        w, h = info["resolution"]
        with open(os.path.join(args.scene_dir,
                               f"transforms_{args.set}.json")) as f:
            frames = json.load(f)["frames"]
        if args.n_frames:
            frames = frames[:args.n_frames]

    rt, scene = build_renderer_from_export(args.export_dir, batch_size=80_000)
    if args.orbit:
        w, h = (scene.w, scene.h) if scene.w > 0 else (800, 800)
        from viewer import orbit_poses
        eye = np.eye(3, dtype=np.float32)
        frames = [{"pose": p, "rot": eye, "name": f"orbit{i:02d}.png"}
                  for i, p in enumerate(orbit_poses(
                      scene.view_cell_center, 0.4 * scene.view_cell_radius,
                      args.orbit))]
    focal = 0.5 * w / np.tan(0.5 * scene.fov)
    dirs = generate_ray_directions(w, h, scene.fov, focal) \
        .reshape(-1, 3).astype(np.float32)

    mk_kw = {}
    if args.mlp_f32:
        import jax.numpy as jnp2
        mk_kw = dict(pack_dtype=jnp2.float32, mlp_precision="highest")
    elif args.pack_f32:
        import jax.numpy as jnp2
        mk_kw = dict(pack_dtype=jnp2.float32)
    if args.oracle_split:
        mk_kw["oracle_split"] = True
    if args.nerf_split:
        mk_kw["nerf_split"] = True
    render = build_megakernel_renderer(rt, scene, dirs,
                                       variant=args.variant, tile=args.tile,
                                       image_size=(w, h), **mk_kw)
    rt32 = None
    if args.fp32_delta:
        rt32, _ = build_renderer_from_export(args.export_dir,
                                             batch_size=80_000, dtype_str="fp32")

    rows = []
    for fr in frames:
        if args.orbit:
            pose, rot, name = fr["pose"], fr["rot"], fr["name"]
            gt = None
        else:
            t = np.array(fr["transform_matrix"], np.float32)
            pose, rot = t[:3, 3], t[:3, :3]
            gt_path = os.path.join(args.scene_dir,
                                   fr["file_path"][2:] + ".png")
            gt = imageio.imread(gt_path).astype(np.float32)[..., :3] / 255.0
            name = os.path.basename(gt_path)
        rgb, counts = render(rt.params[0], rt.params[1],
                             jnp.asarray(pose), jnp.asarray(rot), None)
        img = np.clip(np.asarray(rgb), 0, 1).reshape(h, w, 3)
        row = {"name": name,
               "avg_samples": float(np.mean(np.asarray(counts)))}
        if gt is not None:
            row["psnr_mk"] = psnr(img, gt)
        if args.fp32_delta:
            ref = np.clip(np.asarray(
                rt32.render_frame(pose, rot, dirs)), 0, 1).reshape(h, w, 3)
            if gt is not None:
                row["psnr_fp32"] = psnr(ref, gt)
            row["psnr_mk_vs_fp32"] = psnr(img, ref)
        rows.append(row)
        print(" ".join(f"{k}={v:.3f}" if isinstance(v, float) else f"{k}={v}"
                       for k, v in row.items()), flush=True)
        if args.out:
            os.makedirs(args.out, exist_ok=True)
            imageio.imwrite(
                os.path.join(args.out, row["name"]),
                (img * 255).astype(np.uint8))

    mean = {k: float(np.mean([r[k] for r in rows]))
            for k in rows[0] if k != "name"}
    print(json.dumps({"set": args.set, "n": len(rows), **mean}))


if __name__ == "__main__":
    main()
