#!/usr/bin/env python
"""Real-time-style benchmark viewer — the TPU equivalent of the CUDA/TensorRT
viewer binary (reference: adanerf_real_time_viewer/src/main.cpp:19-51,
neuralrenderer.cpp:146-222, imagegenerator.cpp:247-478).

Usage (mirrors `./adanerf <model_dir> -s 800 800 -bs 80000 -nb 8`):
  python viewer.py <exported_model_dir> -s 800 800 -bs 80000 -n 100 -d out/

Loads the exported artifact directory (config.ini + dataset_info.txt +
model weights), builds the bucketed-compaction renderer, renders frames along
a camera path (predefined json path or an in-cell orbit), reports frame ms /
FPS / per-stage microseconds / avg samples per pixel every logging interval,
and optionally dumps frames (the BMP-dump path, neuralrenderer.cpp:184-222).
"""

import argparse
import ast
import math
import os
import sys
import time

import numpy as np


def parse_kv_file(path):
    """Parse `key = value` files (config.ini / dataset_info.txt) where value
    may be a scalar, string or bracketed list (viewer parser: config.cpp)."""
    out = {}
    with open(path) as f:
        for raw in f:
            line = raw.split(';')[0].strip()
            if not line or line.startswith('[') or '=' not in line:
                continue
            k, v = line.split('=', 1)
            k, v = k.strip(), v.strip()
            try:
                out[k] = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                if v.startswith('[') and v.endswith(']'):
                    items = [x.strip() for x in v[1:-1].split(',')]
                    conv = []
                    for it in items:
                        try:
                            conv.append(ast.literal_eval(it))
                        except (ValueError, SyntaxError):
                            conv.append(it)
                    out[k] = conv
                else:
                    out[k] = v
    return out


def build_renderer_from_export(model_dir, batch_size, dtype_str="bf16"):
    import jax.numpy as jnp

    from adanerf_tpu.models.mlp import BaseNetDef, NeRFDef
    from adanerf_tpu.ops.depth_transforms import get_depth_transform
    from adanerf_tpu.pipeline.features import SceneStatic
    from adanerf_tpu.realtime import RealtimeRenderer
    from adanerf_tpu.train_state import load_tree
    from types import SimpleNamespace

    cfg = parse_kv_file(os.path.join(model_dir, "config.ini"))
    info = parse_kv_file(os.path.join(model_dir, "dataset_info.txt"))

    w = h = None
    fov = float(info["fov"])
    focal = float(info["focal"])

    # the literal token `None` in a stored config.ini means the explicit
    # "None" (identity) normalization, not an absent key — parse_kv_file's
    # literal_eval collapses it to Python None, which get_normalization
    # would resolve to the MaxDepth *default* (normalization.py _SWITCH);
    # keep it as the string so NDC exports shade in raw NDC coordinates
    rmn = cfg.get("rayMarchNormalization")
    if rmn is not None:
        rmn = ["None" if x is None else x for x in rmn]
    config = SimpleNamespace(
        numRaymarchSamples=cfg["numRaymarchSamples"],
        adaptiveSamplingThreshold=float(cfg.get("adaptiveSamplingThreshold", 0.0)),
        posEnc=cfg["posEnc"], posEncArgs=cfg["posEncArgs"],
        rayMarchNormalization=rmn,
        accumulationMult=cfg.get("accumulationMult"),
        useNDC=cfg.get("useNDC") is True,
        rayMarchSampler=cfg.get("rayMarchSampler"))

    depth_transform = get_depth_transform(cfg.get("depthTransform", "log"))
    depth_range = [float(x) for x in info["depth_range"]]
    # training resolution (NDC exports need it for the resolution-dependent
    # ndc_rays transform; absent in pre-round-3 exports -> 0, non-NDC only)
    res = info.get("resolution", [0, 0])
    scene = SceneStatic(
        w=int(res[0]), h=int(res[1]), fov=fov, focal=focal,
        view_cell_center=tuple(float(x) for x in info["view_cell_center"]),
        view_cell_radius=float(np.linalg.norm(
            np.array(info["view_cell_size"], np.float64) / 2.0)),
        depth_range=tuple(depth_range),
        depth_range_warped=tuple(depth_range),
        depth_transform=depth_transform,
        depth_max=float(info["max_depth"]))

    # model definitions: inferred from the weight files themselves (the
    # minimal viewer config.ini — e.g. the reference's sample_pavillon_16 —
    # omits layers/layerWidth and lets the C++ viewer default them); the
    # stored config remains the source for encodings and sampling.
    args0 = [int(x) for x in config.posEncArgs[0].split('-')]
    args1 = [int(x) for x in config.posEncArgs[1].split('-')]
    n_in0 = args0[0] * 6 + 3 + 3 + args0[1] * 6
    w0 = np.load(os.path.join(model_dir, "model0.weights"))
    depth0 = sum(1 for k in w0.files if k.endswith(".w"))
    width0 = int(w0["0.w"].shape[1])
    n_out0 = int(w0[f"{depth0 - 1}.w"].shape[1])
    oracle = BaseNetDef(depth=depth0, width=width0,
                        n_in=n_in0, n_out=n_out0, skip="", net_idx=0)
    w1 = np.load(os.path.join(model_dir, "model1.weights"))
    depth1 = sum(1 for k in w1.files
                 if k.startswith("pts.") and k.endswith(".w"))
    width1 = int(w1["pts.0.w"].shape[1])
    in_ch1 = int(w1["pts.0.w"].shape[0])
    skips1 = tuple(i - 1 for i in range(1, depth1)
                   if w1[f"pts.{i}.w"].shape[0] > width1)
    in_views1 = int(w1["views.0.w"].shape[0]) - width1
    nerf = NeRFDef(depth=depth1, width=width1,
                   input_ch=in_ch1, input_ch_views=in_views1,
                   n_out=4, skips=skips1 or (4,), net_idx=1)
    import jax
    params = [oracle.init(jax.random.PRNGKey(0)), nerf.init(jax.random.PRNGKey(1))]
    params[0] = load_tree(os.path.join(model_dir, "model0.weights"), params[0])
    params[1] = load_tree(os.path.join(model_dir, "model1.weights"), params[1])

    # "bf16" / "fp32" set both MLPs; "oracle32" / "nerf32" run just that
    # net in fp32 (precision bisection, tools/precision_study.py)
    per_net = {}
    if dtype_str == "oracle32":
        per_net = dict(oracle_dtype=None)
    elif dtype_str == "nerf32":
        per_net = dict(nerf_dtype=None)
    dtype = None if dtype_str == "fp32" else jnp.bfloat16
    rt = RealtimeRenderer([oracle, nerf], params, scene, config,
                          batch_size=batch_size, dtype=dtype, **per_net)
    return rt, scene


def block_permutation(w, h, tile=256):
    """Pixel permutation that makes each kernel ray-tile a square image
    block instead of a thin row strip.

    The megakernel's adaptive machinery is tile-gated (select rounds, z/p
    slots, composite length all scale with the TILE-MAX keep count,
    megakernel3.py): a 256-ray tile taken in scan order spans 2 thin rows
    that cross every object on the scanline, while a 16x16 block usually
    sits entirely on background or entirely on one surface.  This is the
    same reason the CUDA viewer renders in square warp blocks
    (adanerf_real_time_viewer render kernels launch over 2D thread
    blocks).  The reorder is a STATIC host-side permutation of the ray
    array — zero kernel cost; the inverse gather on the 128-lane output
    rows costs ~0.4 ms/frame (BENCH.md round-1 gather measurements).

    Returns (perm, inv) index arrays with perm.size == w*h, or (None,
    None) when the image does not tile into the square block (callers
    fall back to scan order).
    """
    side = int(math.isqrt(tile))
    if side * side != tile or w % side or h % side:
        return None, None
    idx = np.arange(w * h, dtype=np.int32).reshape(h, w)
    blocks = idx.reshape(h // side, side, w // side, side)
    perm = blocks.transpose(0, 2, 1, 3).reshape(-1)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size, dtype=np.int32)
    return perm, inv


def build_megakernel_renderer(rt, scene, dirs, variant="v5", tile=256,
                              pack_dtype=None, mlp_precision=None,
                              image_size=None, mesh=None, **mk_kwargs):
    """Frame renderer through the fused whole-frame Pallas kernel
    (ops/pallas/megakernel3.py) — the production analog of the viewer's
    single CUDA+TensorRT loop. Same (frame, n_acts) contract as
    RealtimeRenderer.make_frame_renderer.

    pack_dtype/mlp_precision are precision-diagnostic knobs
    (tools/eval_megakernel.py --mlp-f32): f32 weight packing + a
    'highest' default-matmul-precision build makes every in-kernel matmul
    exact, isolating bf16 rounding from algorithmic differences.

    image_size=(w, h) enables the square-block ray order
    (block_permutation) so tile-gated stages see spatially-coherent
    tiles; outputs are returned in the original scan order either way.

    mesh: a 1-D ``("rays",)`` jax.sharding.Mesh — the frame's ray axis is
    sharded over its devices via shard_map (every pipeline stage is
    per-ray independent: zero collectives; adanerf_tpu/parallel/render.py),
    the TPU-native counterpart of the CUDA viewer's per-GPU batch loop
    (imagegenerator.cpp:247-394)."""
    import jax.numpy as jnp

    from adanerf_tpu.ops.pallas.megakernel import (make_megakernel,
                                                   pack_nerf_weights,
                                                   pack_oracle_weights,
                                                   prep_inputs)
    from adanerf_tpu.ops.pallas.megakernel3 import make_megakernel_compact

    S = rt.max_samples
    if not (rt.threshold > 0.0 and 8 * S <= 128):
        raise SystemExit("--megakernel needs an adaptive model "
                         f"(threshold>0, <=16 samples; got thr={rt.threshold}"
                         f", S={S})")
    if getattr(rt, "use_ndc", False) and variant not in ("v5", "v5d"):
        # ValueError (not SystemExit) so bench.py falls back to another
        # path instead of silently timing wrong-geometry frames
        raise ValueError("only the v5 megakernel implements the NDC ray "
                         "transform (megakernel3.py); use variant='v5'")
    config = rt.config

    n_pix = dirs.shape[0]
    inv_dev = None
    if image_size is not None:
        w_img, h_img = image_size
        perm, inv = block_permutation(w_img, h_img, tile)
        if perm is not None and n_pix == w_img * h_img:
            dirs = dirs[perm]
            inv_dev = jnp.asarray(inv)
    n_shards = mesh.devices.size if mesh is not None else 1
    from adanerf_tpu.parallel.render import frame_pad
    n_pad = frame_pad(n_pix, tile, n_shards)
    dirs_padded = np.zeros((n_pad, 3), np.float32)
    dirs_padded[:n_pix] = dirs
    dirs_pad, _, _ = prep_inputs(jnp.asarray(dirs_padded), jnp.zeros(3),
                                 np.eye(3, dtype=np.float32))

    import jax
    dtype = pack_dtype or rt.dtype or jnp.float32
    po = pack_oracle_weights(rt.oracle_def, rt.params[0], dtype=dtype)
    pn = pack_nerf_weights(rt.nerf_def, rt.params[1], dtype=dtype)
    interp = jax.default_backend() != "tpu"
    if mlp_precision:  # diagnostic: make every in-kernel matmul this precise
        jax.config.update("jax_default_matmul_precision", mlp_precision)
    if variant == "v3":      # dense-slot kernel: wins when rays sit at cap
        mk = make_megakernel(rt.oracle_def, rt.nerf_def, scene, config,
                             tile=tile, interpret=interp,
                             **mk_kwargs)(po, pn)
    else:                    # v5 in-tile compaction: wins sparse workloads
        if variant == "v5d":  # dynamic-trip chunk loop (the S=16 path)
            mk_kwargs.setdefault("dynamic", True)
        mk = make_megakernel_compact(rt.oracle_def, rt.nerf_def, scene,
                                     config, tile=tile, chunk=tile,
                                     interpret=interp,
                                     **mk_kwargs)(po, pn)

    if mesh is not None:
        from adanerf_tpu.parallel.render import (place_frame_inputs,
                                                 shard_megakernel)
        mk = shard_megakernel(mesh, mk)
        dirs_pad, _, _ = place_frame_inputs(
            mesh, dirs_pad, jnp.zeros((1, 128), jnp.float32),
            jnp.zeros((128, 128), jnp.float32))

    def render(p0, p1, pose, rot, dirs_dev):
        pose8 = jnp.zeros((1, 128), jnp.float32).at[0, :3].set(pose)
        rot_pad = jnp.zeros((128, 128), jnp.float32) \
            .at[:3, :3].set(jnp.asarray(rot).T)
        out = mk(dirs_pad, pose8, rot_pad)
        if inv_dev is not None:
            # one aligned 128-lane row gather back to scan order
            out = out[:n_pix][inv_dev]
        return out[:n_pix, :3], out[:n_pix, 3]

    return render


def orbit_poses(center, radius, n, phase=0.0):
    """In-view-cell orbit (the WASD camera's role, headless)."""
    poses = []
    for i in range(n):
        a = phase + 2 * np.pi * i / max(n, 1)
        offset = radius * np.array([np.cos(a), 0.15 * np.sin(2 * a), np.sin(a)])
        poses.append(np.asarray(center) + offset)
    return poses


from adanerf_tpu.platform import apply_platform_env

def main(argv=None):
    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("model_dir", type=str)
    p.add_argument("-s", "--size", nargs=2, type=int, default=[800, 800])
    p.add_argument("-bs", "--batch_size", type=int, default=80_000)
    p.add_argument("-n", "--frames", type=int, default=100)
    p.add_argument("-d", "--dump_dir", type=str, default=None)
    p.add_argument("--camPath", type=str, default=None,
                   help="camera path json (PredefinedCamera format)")
    p.add_argument("--logging_interval", type=int, default=10)
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--dynamic", action="store_true",
                   help="in-graph lax.switch bucketing instead of a probed fixed capacity")
    p.add_argument("--megakernel", nargs="?", const="v5d", default=None,
                   choices=["v5d", "v5", "v3"],
                   help="render through the fused whole-frame Pallas kernel "
                        "(ops/pallas/megakernel3.py) instead of the XLA "
                        "bucketed pipeline")
    p.add_argument("--mesh", type=int, default=0,
                   help="shard each frame's rays over this many devices "
                        "(1-D mesh, shard_map; needs --megakernel). 0 = "
                        "unsharded single-device path")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from adanerf_tpu.ops.raygen import generate_ray_directions

    w, h = args.size
    # small -s frames: a batch can't exceed the frame (n_batches >= 1)
    bs = min(args.batch_size, w * h)
    rt, scene = build_renderer_from_export(args.model_dir, bs,
                                           "fp32" if args.fp32 else "bf16")
    # render-size focal: keep the exported fov at any -s resolution
    focal = 0.5 * w / np.tan(0.5 * scene.fov)
    dirs = generate_ray_directions(w, h, scene.fov, focal) \
        .reshape(-1, 3).astype(np.float32)
    n_pix = dirs.shape[0]
    dirs_dev = jnp.asarray(dirs)
    p0, p1 = rt.params

    if args.camPath:
        from adanerf_tpu.data.camera import PredefinedCamera
        transforms = PredefinedCamera.import_camera_path(
            os.path.dirname(args.camPath) or ".",
            os.path.basename(args.camPath).replace(".json", ""), args.frames)
        cams = [(t[:3, 3], t[:3, :3]) for t in transforms]
    else:
        poses = orbit_poses(scene.view_cell_center,
                            0.4 * scene.view_cell_radius, args.frames)
        cams = [(pos, np.eye(3, dtype=np.float32)) for pos in poses]

    # compile + warm the transfer path (the engine-build phase)
    t0 = time.perf_counter()
    capacity = None
    if args.megakernel:
        mesh = None
        if args.mesh:
            from adanerf_tpu.parallel.render import devices_mesh
            mesh = devices_mesh(args.mesh)
            print(f"rays-sharded rendering over {args.mesh} device(s)")
        render = build_megakernel_renderer(rt, scene, dirs,
                                           variant=args.megakernel,
                                           image_size=(w, h), mesh=mesh)
    elif args.mesh:
        raise SystemExit("--mesh needs --megakernel (the sharded frame "
                         "path wraps the Pallas kernel)")
    elif rt.compaction and not args.dynamic:
        # probe live counts once, compile one fixed-capacity frame program
        # (the TRT optimization-profile pattern; ~1.5x faster than the
        # in-graph lax.switch)
        B = rt.batch_size
        nb = n_pix // B

        @jax.jit
        def probe_counts(p0, pose, rotation, dirs_full):
            db = dirs_full[:nb * B].reshape(B, nb, 3).transpose(1, 0, 2)

            def f(carry, chunk):
                _pk, _m, n_act = rt._oracle_stage(p0, pose, rotation, chunk)
                return carry, n_act

            _c, n_acts = jax.lax.scan(f, 0, db)
            return n_acts

        counts = []
        for pos, rot in cams[::max(len(cams) // 4, 1)][:4]:
            counts.append(np.asarray(probe_counts(
                p0, jnp.asarray(pos, jnp.float32),
                jnp.asarray(rot, jnp.float32), dirs_dev)))
        capacity = rt.choose_frame_capacity(np.concatenate(counts))
        print(f"fixed frame capacity: {capacity} "
              f"(max live {int(np.max(np.concatenate(counts)))})")
    if not args.megakernel:
        render = rt.make_frame_renderer(n_pix, capacity=capacity)

    frame, n_acts = render(p0, p1, jnp.asarray(cams[0][0], jnp.float32),
                           jnp.asarray(cams[0][1], jnp.float32), dirs_dev)
    probe = jax.jit(lambda f: jnp.sum(f[:2, :2]))
    float(probe(frame))
    print(f"engine build (jit compile + warmup): {time.perf_counter() - t0:.1f}s")

    total_samples = 0
    t_start = time.perf_counter()
    t_last = t_start
    for i, (pos, rot) in enumerate(cams):
        frame, n_acts = render(p0, p1, jnp.asarray(pos, jnp.float32),
                               jnp.asarray(rot, jnp.float32), dirs_dev)
        if args.dump_dir or (i + 1) % args.logging_interval == 0:
            img = np.clip(np.asarray(frame), 0, 1).reshape(h, w, 3)
            total_samples = float(np.sum(np.asarray(n_acts)))
            now = time.perf_counter()
            fps = args.logging_interval / (now - t_last)
            t_last = now
            print(f"frame {i + 1:5d}: {1e3 / max(fps, 1e-9):7.2f} ms "
                  f"({fps:6.2f} FPS) avg samples/px "
                  f"{total_samples / n_pix:.2f}")
            if args.dump_dir:
                os.makedirs(args.dump_dir, exist_ok=True)
                import imageio.v2 as imageio
                imageio.imwrite(os.path.join(args.dump_dir, f"{i:05d}.png"),
                                (img * 255).astype(np.uint8))
    # final fence
    float(probe(frame))
    dt = time.perf_counter() - t_start
    print(f"total: {len(cams)} frames in {dt:.2f}s = {len(cams) / dt:.2f} FPS "
          f"({len(cams) * n_pix / dt / 1e6:.2f} Mrays/s)")


if __name__ == "__main__":
    main()
