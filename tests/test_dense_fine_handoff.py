"""Dense -> fine training bootstrap: the fine experiment must find the dense
run's checkpoints via the regex-derived experiment name
(train_data.py:347-354: `\\d+_LSfCDA_\\(\\d+\\.\\d+\\)` -> `128_LSfCDA_(0.0)`)."""

import os
import re

import jax
import numpy as np
import pytest

from adanerf_tpu.config import Config
from adanerf_tpu.train_state import TrainState

from scene_utils import dense_config_args, make_scene


def test_fine_loads_dense_opt_weights(tmp_path):
    scene = make_scene(str(tmp_path / "scene"))
    log = str(tmp_path / "logs")

    # dense run: train-free, just save an _opt checkpoint
    # (numRaymarchSamples=128 so the regex target name matches)
    dense_args = dense_config_args(scene, log, threshold=0.0, n_raymarch=128)
    dense_cfg = Config.init(argv=dense_args)
    dense = TrainState()
    dense.initialize(dense_cfg)
    assert "128_LSfCDA_(0.0)" in dense.experiment_name
    dense.save_weights("_opt")
    dense_params = jax.tree.map(lambda x: np.asarray(x).copy(), dense.params)

    # fine run: same nets, threshold 0.15, 16 samples, preTrained -> dense
    dataset_dir = os.path.join(log, os.path.basename(scene))
    fine_args = dense_config_args(scene, log, threshold=0.15, n_raymarch=16)
    fine_args += ["--preTrainedSuffix", "opt",
                  "--preTrained", dataset_dir, "--preTrained", dataset_dir]
    fine_cfg = Config.init(argv=fine_args)
    fine = TrainState()
    fine.initialize(fine_cfg)
    assert "16_LSfCDA_(0.15)" in fine.experiment_name
    # the regex handoff reconstructs the dense dir name
    assert re.sub(r"\d+_LSfCDA_\(\d+\.\d+\)", "128_LSfCDA_(0.0)",
                  fine.experiment_name) == dense.experiment_name

    fine.load_latest_weights()
    assert fine.epoch0 == 1
    for a, b in zip(jax.tree.leaves(dense_params), jax.tree.leaves(fine.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_weight_locking_schedule(tmp_path):
    """weights_locked truth table (train_data.py:378-400)."""
    scene = make_scene(str(tmp_path / "scene"))
    args = dense_config_args(scene, str(tmp_path / "logs"))
    cfg = Config.init(argv=args)
    ts = TrainState()
    ts.initialize(cfg)

    # dense preset semantics: net0 locked after 80000, net1 locked before 1001
    ts.config_file.epochsLockWeightsBefore = [-1, 1001]
    ts.config_file.epochsLockWeightsAfter = [80000, -1]
    assert not ts.weights_locked(0, 0)
    assert not ts.weights_locked(80000, 0)
    assert ts.weights_locked(80001, 0)
    assert ts.weights_locked(0, 1)
    assert ts.weights_locked(1000, 1)
    assert not ts.weights_locked(1001, 1)

    # fine preset: net0 locked after epoch 0 (always frozen)
    ts.config_file.epochsLockWeightsBefore = [-1, -1]
    ts.config_file.epochsLockWeightsAfter = [0, -1]
    assert ts.weights_locked(1, 0) and ts.weights_locked(299999, 0)
    assert not ts.weights_locked(1, 1)

    # both bounds: locked strictly between after and before
    ts.config_file.epochsLockWeightsBefore = [500, -1]
    ts.config_file.epochsLockWeightsAfter = [100, -1]
    assert not ts.weights_locked(100, 0)
    assert ts.weights_locked(101, 0)
    assert ts.weights_locked(499, 0)
    assert not ts.weights_locked(500, 0)


def test_loss_blending_schedule(tmp_path):
    """One->Zero->NerfA blend factors over the schedule (losses.py:111-153)."""
    import jax.numpy as jnp
    from types import SimpleNamespace
    from adanerf_tpu.pipeline.keys import FSK
    from adanerf_tpu.pipeline.losses import NeRFWeightMultiplicationLoss

    cfg = SimpleNamespace(lossComponents=["One", "Zero", "NerfA"],
                          lossComponentBlending=[-1.0, -1.0, -1.0],
                          lossBlendingStart=100, lossBlendingDuration=200)
    loss = NeRFWeightMultiplicationLoss(cfg, 0)
    out = jnp.full((4, 8), 0.5)
    dicts = [None, {FSK.nerf_weights_output: jnp.zeros((4, 8)),
                    FSK.nerf_alpha_output: jnp.full((4, 8), 0.25)}]

    # L1 components: One=|0.5-1|=0.5, Zero=0.5, NerfA=|0.5-0.25|=0.25
    # epoch<=start: factor 0 -> loss = One only = 0.5
    assert np.isclose(float(loss(out, None, dicts, epoch=50)), 0.5)
    # mid-schedule (epoch 200): factor 0.5 -> 0.5*0.5 + 0.5*0.5 + 0.5*0.25
    assert np.isclose(float(loss(out, None, dicts, epoch=200)), 0.625)
    # done (epoch >= 300): factor 1 -> Zero + NerfA = 0.75
    assert np.isclose(float(loss(out, None, dicts, epoch=1000)), 0.75)
