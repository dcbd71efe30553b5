"""Iterative sample-placement training path, end-to-end: a tracker
checkpoint on disk (--samplePlacementDir) is loaded by the dataset,
threaded through assemble_train_batch as DatasetKeys.sample_placement, and
consumed by the FromIterativeSamplePlacement z-sampler inside the jitted
train step (reference: datasets.py:552-610 + nerf_raymarch_common.py:577-603;
note the shipped reference never constructs the tracker — :552 is commented
out — so this path is live here but dormant there)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adanerf_tpu.config import Config
from adanerf_tpu.ops.depth_transforms import LogTransform
from adanerf_tpu.ops.samplers import from_iterative_sample_placement
from adanerf_tpu.pipeline.keys import DatasetKeys
from adanerf_tpu.train_state import TrainState
from adanerf_tpu.utils.sample_placement_tracker import SamplePlacementTracker

from scene_utils import dense_config_args, make_scene


def _placement_args(scene_dir, log_dir):
    """dense args with net 1 on FromIterativeSamplePlacement and 128 oracle
    bins (the set_16_samples_test fixture is defined for 128 bins). The
    NerfA oracle component is dropped: with 16 placed samples vs 128 bins its
    L1 target shapes mismatch — the reference's l1Loss would fail the same
    way (losses.py:144-146), so placement training pairs with One/Zero-style
    oracle components."""
    args = dense_config_args(scene_dir, log_dir)
    for i, a in enumerate(args):
        if a == "FromClassifiedDepthAdaptive":
            args[i] = "FromIterativeSamplePlacement"
    out = []
    skip = 0
    nerf_a_at = args.index("NerfA")
    for i, a in enumerate(args):
        if skip:
            skip -= 1
            continue
        if a == "--multiDepthFeatures":
            out += ["--multiDepthFeatures", "128"]
            skip = 1
            continue
        if a == "--lossComponents" and args[i + 1] == "NerfA":
            skip = 1
            continue
        if a == "--accumulationMult":
            # the dense premultiply (alpha *= oracle bins) assumes sample
            # count == bin count; 16 placed samples vs 128 bins mismatches
            # in the reference too (nerf_raymarch_common.py:49-50)
            out += ["--accumulationMult", "none"]
            skip = 1
            continue
        out.append(a)
    # drop the matching third blending entry
    idx = [i for i, a in enumerate(out) if a == "--lossComponentBlending"]
    del out[idx[-1]:idx[-1] + 2]
    return out


def test_sampler_picks_active_cells():
    """set_16_samples_test semantics: byte 0b10000000 repeated -> every 8th
    of 128 cells active; the sampler must return exactly those cell centres
    in ascending order."""
    tracker = SamplePlacementTracker(1, 4, 4, max_sample_count=128)
    tracker.set_16_samples_test()
    unpacked = tracker.get_unpacked_image(0).reshape(16, 128)
    assert unpacked.sum(axis=1).tolist() == [16] * 16
    dr = (0.1, 8.0)
    z = from_iterative_sample_placement(jnp.asarray(unpacked, jnp.float32),
                                        16, dr, LogTransform)
    bins = np.arange(0, 128, 8)
    expect = LogTransform.to_world(
        jnp.asarray((bins + 0.5) / 128.0, jnp.float32)[None], dr)
    np.testing.assert_allclose(np.asarray(z),
                               np.broadcast_to(np.asarray(expect), (16, 16)),
                               rtol=1e-6)


def test_training_step_with_sample_placement(tmp_path):
    scene = make_scene(str(tmp_path / "scene"))

    # a reference-layout tracker checkpoint: {dir}/{set}/{S}.ckpt.npy
    sp_dir = tmp_path / "placement"
    for split, n in (("train", 4), ("val", 1)):
        tracker = SamplePlacementTracker(n, 24, 24, max_sample_count=128)
        tracker.set_16_samples_test()
        os.makedirs(sp_dir / split)
        tracker.save(str(sp_dir / split / "16.ckpt.npy"))

    args = _placement_args(scene, str(tmp_path / "logs"))
    args += ["--samplePlacementDir", str(sp_dir)]
    config = Config.init(argv=args)
    ts = TrainState()
    ts.initialize(config)

    assert ts.train_dataset.sample_placement_tracker is not None
    batch, targets = ts.assemble_train_batch(ts.train_dataset,
                                             np.array([0, 1]))
    sp = batch[DatasetKeys.sample_placement]
    assert sp.shape == (2 * ts.train_dataset.num_samples, 128)
    np.testing.assert_array_equal(np.asarray(sp).sum(axis=1), 16)

    step = ts.make_train_step()
    p, o, per = step(jax.tree.map(jnp.copy, ts.params),
                     jax.tree.map(jnp.copy, ts.opt_states),
                     batch, targets, jnp.asarray(3), jax.random.PRNGKey(0))
    assert np.isfinite(float(per[1]))
    # parameters moved under the placement-driven sampler
    delta = sum(float(jnp.sum(jnp.abs(a - b)))
                for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(ts.params)))
    assert delta > 0


def test_missing_checkpoint_defaults_to_all_active(tmp_path):
    """No ckpt file on disk: the tracker starts all-ones (every cell
    active), matching the reference tracker's initial state."""
    scene = make_scene(str(tmp_path / "scene"))
    args = _placement_args(scene, str(tmp_path / "logs"))
    args += ["--samplePlacementDir", str(tmp_path / "nonexistent")]
    config = Config.init(argv=args)
    ts = TrainState()
    ts.initialize(config)
    tracker = ts.train_dataset.sample_placement_tracker
    assert tracker is not None
    assert tracker.get_unpacked_image(0).all()
