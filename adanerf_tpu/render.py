"""Full-image rendering, debug artifacts, video paths and training plots.

Functional rebuild of ``src/plots.py``. Rendering runs the jitted cascade over
fixed-size ray chunks (one compiled program, reused across chunks and frames;
the last chunk is padded to the chunk size so no shape ever changes).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from .data.camera import camera_path_transforms
from .ops.normalization import get_normalization_abbr
from .pipeline.keys import FSK, DatasetKeys
from .utils.saveimage import save_img, transform_img


def calculate_mse(diff):
    return float(np.mean(np.asarray(diff) ** 2))


def calculate_psnr(mse):
    return 10 * np.log10(1.0 / mse)


def _collect_keys(d: Dict) -> List[str]:
    out = []
    for k, v in d.items():
        if v is None:
            continue
        arr = np.asarray(v)
        if arr.ndim in (1, 2):
            out.append(k)
    return out


def render_rays_chunked(ts, pose, rotation, chunk_size: int,
                        collect: Optional[List[str]] = None,
                        pixel_indices: Optional[np.ndarray] = None):
    """Render all (or selected) pixels for one camera pose in fixed chunks.

    Returns (imgs, extras): per-net flat images (n_pix, C) and a dict of
    collected last-net inference-dict channels.
    """
    h, w = ts.h, ts.w
    dirs_full = ts.test_dataset.directions if ts.test_dataset is not None else None
    if pixel_indices is None:
        pixel_indices = np.arange(h * w, dtype=np.int64)
    dirs_sel = dirs_full[pixel_indices]
    n_pix = dirs_sel.shape[0]

    imgs = None
    extras: Dict[str, np.ndarray] = {}
    import jax.numpy as jnp

    pose_j = jnp.asarray(pose[None])
    rot_j = jnp.asarray(rotation[None])

    for start in range(0, n_pix, chunk_size):
        end = min(start + chunk_size, n_pix)
        chunk = dirs_sel[start:end]
        pad = chunk_size - (end - start)
        if pad > 0:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, axis=0)])
        batch = {DatasetKeys.image_pose: pose_j,
                 DatasetKeys.image_rotation: rot_j,
                 DatasetKeys.ray_directions_samples: jnp.asarray(chunk[None])}
        outs, dicts = ts.inference(batch)

        if imgs is None:
            imgs = [np.zeros((n_pix, np.asarray(o).shape[-1]), np.float32)
                    for o in outs]
            if collect is None:
                collect = _collect_keys(dicts[-1])
            for k in collect:
                v = dicts[-1].get(k)
                if v is None:
                    continue
                arr = np.asarray(v)
                # only per-ray channels can be stitched across chunks
                if arr.ndim == 1 and arr.shape[0] == chunk_size:
                    extras[k] = np.zeros((n_pix,), np.float32)
                elif arr.ndim == 2 and arr.shape[0] == chunk_size:
                    extras[k] = np.zeros((n_pix, arr.shape[-1]), np.float32)

        for i, o in enumerate(outs):
            imgs[i][start:end] = np.asarray(o)[:end - start]
        for k in extras:
            v = dicts[-1].get(k)
            if v is not None:
                extras[k][start:end] = np.asarray(v, np.float32)[:end - start]
    return imgs, extras


def render_img(ts, image_index: int, dataset=None, img_name=None,
               model_idxs=None):
    """Debug render of one validation image + estimated-depth colormap,
    adaptive-sample heatmap, oracle histogram and epipolar slice
    (plots.py:33-209)."""
    import matplotlib
    from matplotlib import colors, pyplot as plt

    dataset = dataset or ts.valid_dataset
    h, w = ts.h, ts.w
    chunk = ts.config_file.inferenceChunkSize
    pose = dataset.poses[image_index]
    rot = dataset.rotations[image_index]

    collect = [FSK.nerf_estimated_depth, FSK.adaptive_sample_positions,
               FSK.oracle_weights, FSK.nerf_weights_output,
               FSK.nerf_alpha_output]
    imgs, extras = render_rays_chunked(ts, pose, rot, chunk, collect=collect)

    target = None
    if dataset.color_images is not None:
        target = dataset.color_images[image_index].reshape(-1, 3)

    class Dim:
        pass
    dim = Dim()
    dim.h, dim.w = h, w

    log_dir = ts.logDir
    for i, img in enumerate(imgs):
        if model_idxs is not None and i not in model_idxs:
            continue
        save_img(img, dim, os.path.join(log_dir, f"{img_name}_{i}.png"))
    if target is not None:
        save_img(target, dim, os.path.join(log_dir, f"{img_name}_{len(imgs)-1}_train_targets.png"))

    if FSK.nerf_estimated_depth in extras:
        color_map = matplotlib.colormaps.get_cmap('plasma')
        d = extras[FSK.nerf_estimated_depth]
        save_img(color_map(d.reshape(-1)), dim,
                 os.path.join(log_dir, f"{img_name}_estimated_depth.png"))

    if FSK.adaptive_sample_positions in extras:
        a = extras[FSK.adaptive_sample_positions]
        if a.sum() != h * w:
            color_map = matplotlib.colormaps.get_cmap('coolwarm')
            save_img(color_map(a), dim,
                     os.path.join(log_dir, f"{img_name}_adaptive_samples.png"))

    if FSK.oracle_weights in extras:
        ow = extras[FSK.oracle_weights]
        histogram = np.histogram((ow * 255).flatten(), 255, (0.0, 255.0))
        cmap = colors.LinearSegmentedColormap.from_list("", ["red", "green", "blue"])
        plt.bar(histogram[1][:-1], histogram[0], color=cmap(histogram[1][:-1] / 255))
        plt.title("Oracle Activations Histogram")
        plt.xlabel("Activation Ranges")
        plt.ylabel("Number of Samples")
        plt.savefig(os.path.join(log_dir, f"{img_name}_oracle_histogram.png"))
        plt.close()

        slice_ = ow[int(h * 0.5 * w):int((h * 0.5 + 1) * w)]
        slice_ = np.flip(np.transpose(slice_), 0)

        class SliceDim:
            pass
        sd = SliceDim()
        sd.h, sd.w = slice_.shape[0], w
        color_map = matplotlib.colormaps.get_cmap("magma")
        save_img(color_map(slice_), sd,
                 os.path.join(log_dir, f"{img_name}_oracle_weights.png"))

    if FSK.nerf_weights_output in extras:
        nw = extras[FSK.nerf_weights_output]
        slice_ = np.flip(np.transpose(nw[int(h * 0.5 * w):int((h * 0.5 + 1) * w)]), 0)

        class SliceDim:
            pass
        sd = SliceDim()
        sd.h, sd.w = slice_.shape[0], w
        color_map = matplotlib.colormaps.get_cmap("magma")
        save_img(color_map(slice_), sd,
                 os.path.join(log_dir, f"{img_name}_nerf_weights.png"))

    if target is not None:
        psnr = calculate_psnr(calculate_mse(target - imgs[-1]))
        print(f"\nRender img PSNR {img_name}: {psnr}\n")
        return psnr
    return None


def render_all_imgs(ts, subfolder_name="", dataset_name="test"):
    """Offline render of a full split + depth npz + TermiNeRF quantized
    weights (plots.py:212-327)."""
    out_dir = os.path.join(ts.logDir, subfolder_name, dataset_name)
    os.makedirs(out_dir, exist_ok=True)
    dataset = {"train": ts.train_dataset, "val": ts.valid_dataset,
               "test": ts.test_dataset}.get(dataset_name) or ts.test_dataset
    chunk = ts.config_file.inferenceChunkSize
    h, w = ts.h, ts.w

    class Dim:
        pass
    dim = Dim()
    dim.h, dim.w = h, w

    raw_save_suffix = ""
    if "lin" not in ts.config_file.depthTransform:
        raw_save_suffix += ts.config_file.depthTransform[0:2]
    if ts.config_file.rayMarchNormalization:
        raw_save_suffix += get_normalization_abbr(
            ts.config_file.rayMarchNormalization[-1]) or ""

    psnrs = []
    for i in range(len(dataset)):
        base = os.path.splitext(os.path.basename(dataset.image_filenames[i]))[0]
        collect = [FSK.nerf_estimated_depth, FSK.nerf_weights_output,
                   FSK.adaptive_sample_positions, FSK.oracle_weights]
        imgs, extras = render_rays_chunked(ts, dataset.poses[i],
                                           dataset.rotations[i], chunk,
                                           collect=collect)
        for net_idx, img in enumerate(imgs):
            save_img(img, dim, os.path.join(out_dir, f"{net_idx}_{base}.png"))

        if FSK.nerf_estimated_depth in extras:
            depth_map = extras[FSK.nerf_estimated_depth]
            save_img(depth_map, dim,
                     os.path.join(out_dir, f"{base}_estimated_depth.png"))
            depth_range = ts.f_in[-1].depth_range
            world_depth = np.asarray(ts.scene.depth_transform.to_world(
                depth_map, depth_range))
            np.savez(os.path.join(out_dir, f"{base}_depth.npz"), world_depth)
            save_img(depth_map, dim,
                     os.path.join(out_dir, f"{base}_{raw_save_suffix}_depth.png"))
            if FSK.nerf_weights_output in extras:
                quant = (extras[FSK.nerf_weights_output] * 255).astype(np.uint8)
                np.save(os.path.join(out_dir, f"{base}_weights.trch.npy"), quant)

        if FSK.nerf_estimated_depth not in extras:
            # non-raymarch final nets: dump the raw collected channels
            # (plots.py:311-315 .raw export)
            for key, value in extras.items():
                np.save(os.path.join(
                    out_dir, f"{i}_{key}_{raw_save_suffix}.raw.npy"), value)

        if dataset.color_images is not None:
            target = dataset.color_images[i].reshape(-1, 3)
            psnrs.append(calculate_psnr(calculate_mse(target - imgs[-1])))

    if psnrs:
        for i, p in enumerate(psnrs):
            print(f"Render all img psnr {i} {p}")
        print(f"Average PSNR: {np.mean(psnrs)}")
    return psnrs


def render_video(ts, vid_name=None, out_dir=None):
    """Render the configured camera path; mp4 when an ffmpeg backend exists,
    PNG frame sequence otherwise (plots.py:330-375)."""
    c = ts.config_file
    transforms = camera_path_transforms(c, ts.dataset_info)
    chunk = c.inferenceChunkSize
    h, w = ts.h, ts.w

    class Dim:
        pass
    dim = Dim()
    dim.h, dim.w = h, w

    video_output_dir = out_dir or ts.logDir
    frames_by_net = None
    for t in transforms:
        pose = t[:3, 3]
        rot = t[:3, :3]
        imgs, _ = render_rays_chunked(ts, pose, rot, chunk, collect=[])
        if frames_by_net is None:
            frames_by_net = [[] for _ in imgs]
        for net_idx, img in enumerate(imgs):
            frames_by_net[net_idx].append(
                (transform_img(img, dim) * 255).astype(np.uint8))

    import imageio.v2 as imageio
    for net_idx, frames in enumerate(frames_by_net):
        path = os.path.join(video_output_dir, f"{vid_name}_{net_idx}.mp4")
        try:
            imageio.mimwrite(path, frames, fps=30, quality=8)
        except Exception:
            frame_dir = os.path.join(video_output_dir, f"{vid_name}_{net_idx}_frames")
            os.makedirs(frame_dir, exist_ok=True)
            for fi, fr in enumerate(frames):
                imageio.imwrite(os.path.join(frame_dir, f"{fi:05d}.png"), fr)


def plot_training_stats(log_dir, csv_path, x_column, y_column):
    """plots.py:378-383."""
    import pandas as pd
    from matplotlib import pyplot as plt
    fig, ax = plt.subplots()
    df = pd.read_csv(os.path.join(log_dir, csv_path))
    df.plot(ax=ax, x=x_column, y=y_column)
    y_name = y_column if isinstance(y_column, str) else "_".join(y_column)
    plt.savefig(os.path.join(log_dir, f"{x_column}_{y_name}.pdf"))
    plt.close(fig)
