#!/usr/bin/env python
"""Training entry point (reference: src/train.py).

Joint training of the sampling oracle and the shading network:
one fused jitted step per epoch (cascade + both losses + Adam + lr decay +
weight locking), periodic checkpoint / render / validate / video, best-val
tracking in opt.txt.
"""

import csv
import math
import os
import shutil
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from adanerf_tpu.config import Config
from adanerf_tpu.pipeline.keys import FSK, DatasetKeys
from adanerf_tpu.render import (calculate_mse, calculate_psnr, plot_training_stats,
                                render_img, render_rays_chunked, render_video)
from adanerf_tpu.train_state import TrainState
from adanerf_tpu.utils.saveimage import save_img, transform_img


def validate_batch(ts: TrainState, epoch, train_loss, model_idx=-1):
    """Full-image validation pass (reference: src/train.py:28-141)."""
    c = ts.config_file
    dataset = ts.valid_dataset
    chunk = c.inferenceChunkSize
    h, w = ts.h, ts.w

    losses = []
    accuracies = []
    validation_images = []

    for i in range(len(dataset)):
        imgs, extras = render_rays_chunked(
            ts, dataset.poses[i], dataset.rotations[i], chunk,
            collect=[FSK.nerf_weights_output])
        target = dataset.color_images[i].reshape(-1, 3)

        crit = ts.losses[model_idx]
        inference_dict = {FSK.nerf_weights_output:
                          jnp.asarray(extras.get(FSK.nerf_weights_output))
                          if FSK.nerf_weights_output in extras else None}
        try:
            loss_val = float(crit(jnp.asarray(imgs[-1]), jnp.asarray(target),
                                  inference_dict=inference_dict, epoch=epoch))
        except Exception:
            loss_val = calculate_mse(imgs[-1] - target)
        losses.append(loss_val)

        diff = np.abs(imgs[-1] - target)
        accuracies.append(float((diff < 0.001).sum()) / diff.size)

        mse = np.mean(diff ** 2)
        psnr = 10 * np.log10(1.0 / mse)

        class Dim:
            pass
        dim = Dim()
        dim.h, dim.w = h, w
        validation_images.append({
            "images": [transform_img(img, dim) for img in imgs],
            "psnr": psnr})

    loss = float(np.mean(losses))
    accuracy = float(np.mean(accuracies))

    print(f"\nvalidation epoch={epoch:<10} loss={loss:.8f} acc={accuracy:.8f}")
    with open(os.path.join(ts.logDir, "logs.txt"), "a") as f:
        f.write(f"epoch={epoch} loss={loss:.4f}  acc={accuracy:.8f} "
                f"train_loss={train_loss:.8f}\r")
    stats_path = os.path.join(ts.logDir, c.trainStatsName)
    add_header = not os.path.isfile(stats_path)
    with open(stats_path, "a", newline="") as csv_file:
        writer = csv.DictWriter(csv_file,
                                fieldnames=["epoch", "loss", "accuracy", "train_loss"])
        if add_header:
            writer.writeheader()
        writer.writerow({"epoch": f"{epoch}", "loss": f"{loss}",
                         "accuracy": f"{accuracy}", "train_loss": f"{train_loss}"})

    for y in ["loss", "train_loss", "accuracy",
              ["loss", "train_loss", "accuracy"], ["loss", "train_loss"]]:
        try:
            plot_training_stats(ts.logDir, c.trainStatsName, "epoch", y)
        except Exception:
            pass

    return loss, validation_images


def pre_train(ts: TrainState):
    """Optional per-net GT pretraining (reference: src/train.py:144-261).

    Like the reference, pretraining applies the loss to the RAW network
    output (no postprocess), so it is meaningful for nets whose loss acts on
    raw outputs (the oracle with ClassifiedDepth/BCE targets); the shipped
    AdaNeRF configs use epochsPretrain=[-1,-1].
    """
    c = ts.config_file
    if not c.epochsPretrain:
        return

    samples = c.samplesPretrain if c.samplesPretrain != -1 else c.samples
    batch_images = c.batchImagesPretrain if c.batchImagesPretrain != -1 \
        else c.batchImages
    ts.train_dataset.num_samples = samples

    for model_idx in range(len(ts.model_defs)):
        epoch_pretrain = c.epochsPretrain[model_idx]
        if ts.epoch0 >= epoch_pretrain:
            continue
        best_val_loss = sys.float_info.max
        if model_idx < len(ts.best_valid_loss_pretrain):
            best_val_loss = ts.best_valid_loss_pretrain[model_idx]

        step = ts.make_pretrain_step(model_idx)
        n_images = len(ts.train_dataset)
        perm = np.random.permutation(n_images)
        cursor = 0

        for epoch in range(ts.epoch0, epoch_pretrain + 1):
            if cursor + batch_images > n_images:
                perm = np.random.permutation(n_images)
                cursor = 0
            img_idx = perm[cursor:cursor + batch_images]
            cursor += batch_images

            batch, targets = ts.assemble_train_batch(ts.train_dataset, img_idx)
            ts.params, ts.opt_states = step(
                ts.params, ts.opt_states, batch, targets, jnp.asarray(epoch),
                jnp.asarray(ts.epoch0), jax.random.PRNGKey(epoch))

            if epoch > 0 and epoch % c.epochsCheckpoint == 0:
                ts.save_weights(name_suffix=f"{epoch:07d}",
                                params_only=bool(c.checkpointParamsOnly))
            if epoch % c.epochsValidate == 0 and epoch > 0:
                val_loss, _ = validate_batch(ts, epoch, 0.0, model_idx)
                if val_loss < best_val_loss:
                    best_val_loss = val_loss
                    with open(os.path.join(ts.logDir, "opt.txt"), "w") as f:
                        f.write(f"Optimal validation loss {best_val_loss} "
                                f"at epoch {epoch}")
                    ts.save_weights(name_suffix="_opt", model_idx=model_idx)

        ts.load_specific_weights(c.checkPointName, model_idx)
        ts.epoch0 = epoch_pretrain

    ts.train_dataset.num_samples = c.samples
    print("pre-training finished")


def train(ts: TrainState):
    """The 300k-epoch hot loop (reference: src/train.py:264-411)."""
    c = ts.config_file
    best_val_loss = sys.float_info.max if ts.best_valid_loss is None \
        else ts.best_valid_loss

    # multi-device: shard the ray axis over a 1-D mesh when requested and
    # more than one device is present (adanerf_tpu/parallel/mesh.py)
    place = None
    if c.meshDevices != 1 and len(jax.devices()) > 1:
        from adanerf_tpu.parallel.mesh import make_mesh, shard_train_step
        mesh = make_mesh(c.meshDevices, multi_host=True)
        step, place = shard_train_step(ts, mesh)
        print(f"data-parallel over {mesh.devices.size} devices (rays axis), "
              f"{jax.process_count()} host process(es)")
    else:
        step = ts.make_train_step()
    n_images = len(ts.train_dataset)
    batch_images = c.batchImages if c.batchImages != -1 else n_images

    # background batch assembly overlapping the jitted step (the 8-worker
    # DataLoader analog, adanerf_tpu/data/prefetch.py)
    from adanerf_tpu.data.prefetch import BatchPrefetcher, epoch_image_indices
    seed = c.randomSeed if c.randomSeed != -1 else 0
    prefetcher = BatchPrefetcher(
        lambda idx: ts.assemble_train_batch(ts.train_dataset, idx),
        epoch_image_indices(n_images, batch_images,
                            ts.epochs - ts.epoch0 + 1, seed))

    loss_host = 0.0
    from tqdm import tqdm
    tqdm_range = tqdm(range(ts.epoch0, ts.epochs))

    for epoch in tqdm_range:
        batch, targets = next(prefetcher)
        if place is not None:
            ts.params, ts.opt_states, batch, targets = place(
                ts.params, ts.opt_states, batch, targets)
        ts.params, ts.opt_states, per_net = step(
            ts.params, ts.opt_states, batch, targets, jnp.asarray(epoch),
            jax.random.PRNGKey(epoch))
        per_net_pending = per_net
        if c.dispatchSleepMs:
            time.sleep(c.dispatchSleepMs / 1e3)

        if not c.nonVerbose and c.verboseEvery > 0 \
                and epoch % c.verboseEvery == 0:
            vals = [float(x) for x in per_net]
            tqdm_range.set_description(
                "epoch={:<10} losses=[{}]".format(
                    epoch, ", ".join(f"{v:.8f}" for v in vals)))
            loss_host = vals[-1]

        if epoch % c.epochsCheckpoint == 0 and epoch > 0:
            # periodic saves may be params-only (--checkpointParamsOnly):
            # ~4x smaller device->host pull on flaky transports; the final
            # and best-val saves below always persist the full state
            ts.save_weights(name_suffix=f"{epoch:07d}",
                            params_only=bool(c.checkpointParamsOnly))

        if epoch % c.epochsRender == 0 and epoch > 0:
            render_img(ts, 0, ts.valid_dataset, img_name=f"{epoch:07d}")

        rendered_video = False
        if c.epochsVideo >= 0 and epoch % c.epochsVideo == 0 and epoch > 0:
            render_video(ts, vid_name=f"{epoch:07d}")
            rendered_video = True

        if epoch % c.epochsValidate == 0 and epoch > 0:
            val_loss = None
            img_data = None
            if c.adaptiveSamplingThreshold > 0.0 or \
                    epoch > c.lossBlendingStart + c.lossBlendingDuration or \
                    c.lossBlendingStart > ts.epochs:
                val_loss, img_data = validate_batch(ts, epoch, loss_host)

            if val_loss is not None and val_loss < best_val_loss:
                best_val_loss = val_loss
                with open(os.path.join(ts.logDir, "opt.txt"), "w") as f:
                    f.write(f"Optimal validation loss {best_val_loss} "
                            f"at epoch {epoch}")
                ts.save_weights(name_suffix="_opt")

                valid_dir = os.path.join(ts.logDir, "opt", "val")
                os.makedirs(valid_dir, exist_ok=True)
                psnrs = []
                for i, data in enumerate(img_data):
                    psnrs.append(data["psnr"])
                    print(f"Render all img psnr {i} {psnrs[i]}")
                    for net_index, img in enumerate(data["images"]):
                        save_img(img, ts.dataset_info,
                                 os.path.join(valid_dir, f"_{net_index}_{i}.png"),
                                 False)
                print(f"Average PSNR: {np.array(psnrs).mean()}")

                if not rendered_video and c.epochsVideo >= 0:
                    render_video(ts, vid_name="_opt")
                elif rendered_video:
                    for net_idx in range(len(ts.model_defs)):
                        src = os.path.join(ts.logDir, f"{epoch:07d}_{net_idx}.mp4")
                        if os.path.exists(src):
                            shutil.copy(src, os.path.join(
                                ts.logDir, f"_opt_{net_idx}.mp4"))

    prefetcher.close()


from adanerf_tpu.platform import apply_platform_env

def main():
    apply_platform_env()
    # join a multi-host cluster BEFORE any jax backend use (env-gated no-op
    # on single-process runs; recipe in adanerf_tpu/parallel/mesh.py:44-49)
    from adanerf_tpu.parallel.mesh import init_multi_host
    proc = init_multi_host()
    config = Config.init()
    # pay the per-process transfer-path init (first device->host readback
    # costs 10-530s on the axon tunnel, DEVNOTES) HERE, not at the epoch-100
    # loss log inside the hot loop where it reads as a training stall.
    # AFTER Config.init so --help / bad flags fail instantly instead of
    # behind a minutes-long backend init.
    import jax.numpy as _jnp
    float(_jnp.zeros(()))
    ts = TrainState()
    ts.initialize(config)

    print(f"Training config: {ts.logDir.rstrip('/').split('/')[-1]} "
          f"({config.config}) [process {proc}/{jax.process_count()}]")
    ts.load_latest_weights()
    pre_train(ts)
    train(ts)

    ts.save_weights(name_suffix=f"{ts.epochs - 1:07d}")

    if config.performEvaluation:
        from adanerf_tpu.evaluation import evaluate
        evaluations = ["complexity", "images", "flip", "psnr", "output_images"]
        ts.load_specific_weights(config.checkPointName.replace(".weights", ""))
        evaluate(ts, None, evaluations)


if __name__ == "__main__":
    main()
