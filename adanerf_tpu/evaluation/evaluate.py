"""Quantitative evaluation: MSE/PSNR/IW-SSIM/FLIP + analytic FLOPs accounting
scaled by measured adaptive sample counts, diff/flip imagery, CSV/TXT writers
and per-experiment-directory discovery.

Functional rebuild of ``src/evaluate.py``. FLOPs need no ptflops-style hooks:
MLP MACs are analytic (models expose ``macs_per_input``), and the shading
net's MACs are scaled by the measured average adaptive sample count
(reference: evaluate.py:237-251).
"""

from __future__ import annotations

import os
import re
from shutil import copyfile

import numpy as np

from ..pipeline.keys import FSK
from ..render import render_rays_chunked, render_video
from ..utils.saveimage import save_img
from .flip import flip_error_map
from .iw_ssim import iw_ssim, rgb_to_gray255
from .metrics import mse as mse_fn, psnr as psnr_fn


class QualityContainer:
    """Per-image metric accumulators (reference: evaluate.py:34-46)."""

    def __init__(self):
        self.flip = []
        self.mse = []
        self.psnr = []
        self.ssim = []
        self.samples = []
        self.sparsity = []
        self.diff_data = []
        self.square_diff_data = []
        self.flip_data = []


def get_network_size(ts, out_dir):
    """Parameter census -> network_description.txt (evaluate.py:363-385)."""
    import jax
    total = 0
    lines = []
    for i, d in enumerate(ts.model_defs):
        for path, leaf in jax.tree_util.tree_flatten_with_path(ts.params[i])[0]:
            name = f"{d.name}." + ".".join(
                str(getattr(p, 'key', getattr(p, 'idx', p))) for p in path)
            n = int(np.prod(leaf.shape))
            if leaf.ndim > 1:
                lines.append(f"{n} = {'x'.join(str(x) for x in leaf.shape)} ({name})")
            else:
                lines.append(f"{n} ({name})")
            total += n
    lines.insert(0, f"{total} total params")
    with open(os.path.join(out_dir, "network_description.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


def generate_data(ts, flags, out_dir=None):
    """Test-split render + metrics + complexity (evaluate.py:164-342)."""
    out_dir = out_dir or getattr(ts, 'outDir', ts.logDir)
    os.makedirs(os.path.join(out_dir, "eval"), exist_ok=True)
    dataset = ts.test_dataset
    h, w = ts.h, ts.w
    chunk = ts.config_file.inferenceChunkSize

    count_flops = "complexity" in flags
    image_macs = []
    image_macs_pp = []
    q = QualityContainer()

    class Dim:
        pass
    dim = Dim()
    dim.h, dim.w = h, w

    for i in range(len(dataset)):
        collect = [FSK.adaptive_sample_positions, FSK.oracle_weights]
        imgs, extras = render_rays_chunked(ts, dataset.poses[i],
                                           dataset.rotations[i], chunk,
                                           collect=collect)
        test = np.clip(imgs[-1][:, :3], 0.0, 1.0)
        reference = dataset.color_images[i].reshape(-1, 3)

        # measured average adaptive sample count scales the shading-net MACs
        samples = float(ts.config_file.numRaymarchSamples[-1])
        if FSK.adaptive_sample_positions in extras:
            frac = float(np.sum(extras[FSK.adaptive_sample_positions]))
            if frac > 0:
                samples = frac / (h * w) * ts.config_file.numRaymarchSamples[-1]
                q.samples.append(samples)

        if count_flops:
            total_macs = 0.0
            for k, d in enumerate(ts.model_defs):
                macs = d.macs_per_input()
                total_macs += macs if k == 0 else macs * samples
            image_macs.append(total_macs * w * h)
            image_macs_pp.append(total_macs)

        diff = np.abs(test - reference)
        m = mse_fn(test, reference)
        q.mse.append(m)
        if "psnr" in flags:
            q.psnr.append(psnr_fn(test, reference))
        if "ssim" in flags:
            q.ssim.append(iw_ssim(rgb_to_gray255(reference.reshape(h, w, 3)),
                                  rgb_to_gray255(test.reshape(h, w, 3))))
        if "flip" in flags:
            fmap = np.asarray(flip_error_map(reference.reshape(h, w, 3),
                                             test.reshape(h, w, 3)))
            q.flip.append(float(fmap.mean()))
            from matplotlib import colormaps
            q.flip_data.append(colormaps.get_cmap("magma")(fmap)[..., :3])
        q.diff_data.append(diff.reshape(h, w, 3))
        q.square_diff_data.append((diff ** 2).reshape(h, w, 3))

        if "output_images" in flags:
            save_img(test.reshape(h, w, 3), dim,
                     os.path.join(out_dir, "eval", f"{i}_out.png"), False)

        if ts.config_file.adaptiveSamplingThreshold == 0.0 and \
                FSK.oracle_weights in extras:
            q.sparsity.append(float(np.mean(extras[FSK.oracle_weights])))

    for i in range(len(q.diff_data)):
        save_img(q.diff_data[i], dim, os.path.join(
            out_dir, "eval", f"{i}_diff_{q.diff_data[i].mean()}.png"), False)
        save_img(q.square_diff_data[i], dim, os.path.join(
            out_dir, "eval", f"{i}_square_diff_{q.square_diff_data[i].mean()}.png"),
            False)
        if "flip" in flags and i < len(q.flip_data):
            save_img(q.flip_data[i], dim, os.path.join(
                out_dir, "eval", f"{i}_flip_{q.flip[i]}.png"), False)

    if count_flops:
        with open(os.path.join(out_dir, "complexity.txt"), "w") as f:
            cma = cma_pp = 0.0
            for idx, (macs, macs_pp) in enumerate(zip(image_macs, image_macs_pp)):
                f.write(f"{idx} - {macs} - {macs_pp}\n")
                cma = cma + (macs - cma) / (idx + 1)
                cma_pp = cma_pp + (macs_pp - cma_pp) / (idx + 1)
            f.write(f"{cma} : {cma_pp}\n")

    default_samples = float(ts.config_file.numRaymarchSamples[-1])
    with open(os.path.join(out_dir, "image_quality_images.txt"), "w") as f:
        for idx, m in enumerate(q.mse):
            f.write(f"image={idx} mse={m:.4f} psnr="
                    f"{q.psnr[idx] if 'psnr' in flags else -1.0:.4f} "
                    f"ssim={q.ssim[idx] if 'ssim' in flags else -1.0:.4f} "
                    f"flip_loss={q.flip[idx] if 'flip' in flags else -1.0:.4f} "
                    f"samples={q.samples[idx] if len(q.samples) > idx else default_samples} "
                    f"sparsity={q.sparsity[idx] if len(q.sparsity) > idx else -1.0:.4f}\r")
    with open(os.path.join(out_dir, "image_quality_images.csv"), "w") as c:
        c.write("mse,psnr,ssim,flip,samples,sparsity\r")
        for idx, m in enumerate(q.mse):
            c.write(f"{m},{q.psnr[idx] if 'psnr' in flags else -1.0},"
                    f"{q.ssim[idx] if 'ssim' in flags else -1.0},"
                    f"{q.flip[idx] if 'flip' in flags else -1.0},"
                    f"{q.samples[idx] if len(q.samples) > idx else default_samples},"
                    f"{q.sparsity[idx] if len(q.sparsity) > idx else -1.0}\r")
    return q


def load_reference_video(data_path):
    """Frames from <scene>/reference_video/*.png (evaluate.py:345-360)."""
    import imageio.v2 as imageio
    ref_path = os.path.join(data_path, "reference_video")
    if not os.path.exists(ref_path):
        return None
    frames = []
    for f in sorted(os.listdir(ref_path)):
        if f.lower().endswith((".png", ".jpg")):
            frames.append(imageio.imread(os.path.join(ref_path, f)))
    return frames or None


def generate_video_data(ts, flags, reference_video, out_dir=None):
    """Camera-path render vs a reference video: per-frame metrics +
    diff/square-diff/flip frame sequences + image_quality_video.{txt,csv}
    (reference: generate_data with reference_video, evaluate.py:164-342)."""
    import cv2

    from ..data.camera import PredefinedCamera

    out_dir = out_dir or getattr(ts, 'outDir', ts.logDir)
    h, w = ts.h, ts.w
    chunk = ts.config_file.inferenceChunkSize
    transforms = PredefinedCamera.import_camera_path(
        ts.config_file.data, "cam_path", len(reference_video))

    q = QualityContainer()
    n = min(len(transforms), len(reference_video))
    for i in range(n):
        t = transforms[i]
        imgs, _ = render_rays_chunked(ts, t[:3, 3], t[:3, :3], chunk,
                                      collect=[])
        test = np.clip(imgs[-1][:, :3], 0.0, 1.0).reshape(h, w, 3)
        ref = np.asarray(reference_video[i]).astype(np.float32)
        if ref.max() > 1.5:
            ref = ref / 255.0
        ref = ref[..., :3]
        if ref.shape[:2] != (h, w):
            ref = cv2.resize(ref, (w, h), interpolation=cv2.INTER_AREA)

        diff = np.abs(test - ref)
        q.mse.append(mse_fn(test, ref))
        if "psnr" in flags:
            q.psnr.append(psnr_fn(test, ref))
        if "ssim" in flags:
            q.ssim.append(iw_ssim(rgb_to_gray255(ref), rgb_to_gray255(test)))
        if "flip" in flags:
            fmap = np.asarray(flip_error_map(ref, test))
            q.flip.append(float(fmap.mean()))
            from matplotlib import colormaps
            q.flip_data.append(
                (colormaps.get_cmap("magma")(fmap)[..., :3] * 255).astype(np.uint8))
        q.diff_data.append((diff * 255).astype(np.uint8))
        q.square_diff_data.append((diff ** 2 * 255).astype(np.uint8))

    import imageio.v2 as imageio

    def write_video(name, frames):
        path = os.path.join(out_dir, name + ".mp4")
        try:
            imageio.mimwrite(path, frames, fps=30, quality=8)
        except Exception:
            frame_dir = os.path.join(out_dir, name + "_frames")
            os.makedirs(frame_dir, exist_ok=True)
            for fi, fr in enumerate(frames):
                imageio.imwrite(os.path.join(frame_dir, f"{fi:05d}.png"), fr)

    write_video("_diff", q.diff_data)
    write_video("_square_diff", q.square_diff_data)
    if "flip" in flags and q.flip_data:
        write_video("_flip", q.flip_data)

    default_samples = float(ts.config_file.numRaymarchSamples[-1])
    with open(os.path.join(out_dir, "image_quality_video.txt"), "w") as f:
        for idx, m in enumerate(q.mse):
            f.write(f"image={idx} mse={m:.4f} psnr="
                    f"{q.psnr[idx] if 'psnr' in flags else -1.0:.4f} "
                    f"ssim={q.ssim[idx] if 'ssim' in flags else -1.0:.4f} "
                    f"flip_loss={q.flip[idx] if 'flip' in flags else -1.0:.4f} "
                    f"samples={default_samples} sparsity=-1.0\r")
    with open(os.path.join(out_dir, "image_quality_video.csv"), "w") as c:
        c.write("mse,psnr,ssim,flip,samples,sparsity\r")
        for idx, m in enumerate(q.mse):
            c.write(f"{m},{q.psnr[idx] if 'psnr' in flags else -1.0},"
                    f"{q.ssim[idx] if 'ssim' in flags else -1.0},"
                    f"{q.flip[idx] if 'flip' in flags else -1.0},"
                    f"{default_samples},-1.0\r")
    return q


def evaluate(ts, reference_video, evaluations):
    """Evaluation driver (evaluate.py:388-440)."""
    if not hasattr(ts, 'outDir'):
        ts.outDir = ts.logDir

    if "opt" in evaluations and not ts.config_file.trainWithGTDepth:
        saved = (ts.config_file.camType, ts.config_file.camPath,
                 ts.config_file.videoFrames)
        ts.config_file.camPath = "cam_path"
        ts.config_file.camType = "PredefinedCamera"
        ts.config_file.videoFrames = -1
        try:
            render_video(ts, vid_name="_opt", out_dir=ts.outDir)
        except FileNotFoundError:
            print("no cam_path.json — skipping _opt video")
        (ts.config_file.camType, ts.config_file.camPath,
         ts.config_file.videoFrames) = saved

    if "complexity" in evaluations:
        get_network_size(ts, ts.outDir)

    q = None
    if "images" in evaluations:
        q = generate_data(ts, evaluations)

    if "videos" in evaluations and not ts.config_file.trainWithGTDepth:
        if reference_video is None:
            reference_video = load_reference_video(ts.config_file.data)
        if reference_video is not None:
            try:
                generate_video_data(ts, evaluations, reference_video)
            except FileNotFoundError:
                print("no cam_path.json — skipping video evaluation")

    if "output_videos" in evaluations and not ts.config_file.trainWithGTDepth:
        # render the requested camera paths (evaluate.py:421-433)
        cam_paths = getattr(ts, "evaluation_cam_path", None) or \
            ([ts.config_file.camPath] if ts.config_file.camPath else [])
        for cam_path in cam_paths:
            saved = (ts.config_file.camType, ts.config_file.camPath,
                     ts.config_file.videoFrames)
            ts.config_file.camPath = cam_path
            ts.config_file.camType = "PredefinedCamera"
            ts.config_file.videoFrames = -1
            try:
                render_video(ts, vid_name=cam_path, out_dir=ts.outDir)
            except FileNotFoundError:
                print(f"no {cam_path}.json — skipping output video")
            (ts.config_file.camType, ts.config_file.camPath,
             ts.config_file.videoFrames) = saved

    if "export" in evaluations:
        from ..export import export_artifacts
        export_artifacts(ts, os.path.join(ts.outDir, "exported_model"))

    if os.path.exists(os.path.join(ts.logDir, "opt.txt")):
        os.makedirs(os.path.join(ts.outDir, "eval"), exist_ok=True)
        copyfile(os.path.join(ts.logDir, "opt.txt"),
                 os.path.join(ts.outDir, "eval", "opt.txt"))
    return q


def get_optimal_epoch(path):
    """Parse the epoch out of opt.txt (evaluate.py:443-449)."""
    with open(os.path.join(path, "opt.txt")) as f:
        line = f.readline()
        m = re.search(r'\d+$', line)
        if m is None:
            line = f.readline()
            m = re.search(r'\d+$', line)
        return line[m.start():m.end()]


def load_config(data_path, device_id, path, evaluations, skip,
                cl_out_dir=None, skip_if_already_done_once=True,
                load_training_datasets=False):
    """Re-hydrate a TrainState from an experiment dir's echoed config.ini
    (evaluate.py:452-562). Returns (status, ts): 0 ok, 1 error, 2 skipped."""
    from ..config import Config
    from ..train_state import TrainState

    c_file = os.path.join(path, "config.ini")
    orig_path = os.path.join(path, '')
    if path.endswith("-D") or path.endswith(f"-D{os.path.sep}"):
        return 1, None
    if not os.path.exists(c_file):
        print("No config.ini found!")
        return 1, None

    try:
        optimal_epoch = get_optimal_epoch(orig_path)
    except (FileNotFoundError, AttributeError):
        optimal_epoch = None

    if len(evaluations) == 0:
        for e in ["complexity", "images", "flip", "psnr", "ssim",
                  "output_images"]:
            if e not in skip:
                evaluations.append(e)

    # strip the experiment + dataset dirs to find the base log dir
    base = path
    for _ in range(2):
        base, tail = os.path.split(base.rstrip(os.path.sep))

    config = Config.init(path=c_file, only_known_args=True, argv=[])
    config.data = data_path
    config.logDir = base
    config.device = device_id

    dataset_name = os.path.basename(os.path.normpath(config.data))
    experiment_name = os.path.basename(os.path.normpath(orig_path))
    out_dir = orig_path
    if cl_out_dir is not None:
        out_dir = os.path.join(cl_out_dir, dataset_name, experiment_name)
    os.makedirs(os.path.join(out_dir, "eval"), exist_ok=True)

    try:
        evaluated_epoch = get_optimal_epoch(os.path.join(out_dir, "eval"))
    except (FileNotFoundError, AttributeError):
        evaluated_epoch = None
    if evaluated_epoch is not None and optimal_epoch is not None and \
            optimal_epoch == evaluated_epoch and skip_if_already_done_once:
        print("Evaluation already performed for this optimal epoch!")
        return 2, None

    while len(config.lossWeights) < len(config.losses):
        config.lossWeights.append(1)

    ts = TrainState()
    ts.initialize(config, log_path=orig_path, training=load_training_datasets)
    ts.outDir = out_dir

    checkpoint_name = config.checkPointName.replace(".weights", "")
    cands = [f for f in os.listdir(orig_path) if checkpoint_name in f]
    if cands:
        ts.load_specific_weights(checkpoint_name)
    else:
        ts.load_latest_weights()
    return 0, ts
