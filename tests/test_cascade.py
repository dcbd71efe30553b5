"""Integration tests: full cascade on a synthetic scene — dense training step,
adaptive (fine) inference, checkpoint round-trip, resume."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adanerf_tpu.config import Config
from adanerf_tpu.pipeline.keys import FSK, DatasetKeys
from adanerf_tpu.train_state import TrainState

from scene_utils import dense_config_args, make_scene


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene")
    return make_scene(str(d))


def _make_state(scene_dir, log_dir, threshold=0.0, epochs=50):
    args = dense_config_args(scene_dir, log_dir, threshold=threshold,
                             epochs=epochs)
    config = Config.init(argv=args)
    ts = TrainState()
    ts.initialize(config)
    return ts


class TestDenseCascade:
    def test_one_step_and_shapes(self, scene_dir, tmp_path):
        ts = _make_state(scene_dir, str(tmp_path / "logs"))
        step = ts.make_train_step()
        batch, targets = ts.assemble_train_batch(ts.train_dataset, np.array([0, 1]))
        params, opts, per_net = step(ts.params, ts.opt_states, batch, targets,
                                     jnp.asarray(0), jax.random.PRNGKey(0))
        assert len(per_net) == 2
        assert np.isfinite(float(per_net[0])) and np.isfinite(float(per_net[1]))

    def test_loss_decreases(self, scene_dir, tmp_path):
        ts = _make_state(scene_dir, str(tmp_path / "logs"))
        step = ts.make_train_step()
        losses = []
        for e in range(30):
            batch, targets = ts.assemble_train_batch(ts.train_dataset,
                                                     np.array([e % 4, (e + 1) % 4]))
            ts.params, ts.opt_states, per_net = step(
                ts.params, ts.opt_states, batch, targets, jnp.asarray(e),
                jax.random.PRNGKey(e))
            losses.append(float(per_net[1]))
        assert np.mean(losses[-5:]) < np.mean(losses[:5])

    def test_inference_dict_contents(self, scene_dir, tmp_path):
        ts = _make_state(scene_dir, str(tmp_path / "logs"))
        batch, _ = ts.assemble_train_batch(ts.train_dataset, np.array([0]))
        outs, dicts = ts.inference(batch)
        n_rays = 64
        assert outs[0].shape == (n_rays, 16)          # oracle bins
        assert outs[1].shape == (n_rays, 3)           # rgb
        assert dicts[1][FSK.nerf_weights_output].shape == (n_rays, 16)
        assert dicts[1][FSK.nerf_alpha_output].shape == (n_rays, 16)
        assert dicts[1][FSK.nerf_estimated_depth].shape == (n_rays, 1)
        rgb = np.asarray(outs[1])
        assert np.isfinite(rgb).all() and (rgb >= 0).all() and (rgb <= 1).all()


class TestAdaptiveCascade:
    def test_adaptive_inference(self, scene_dir, tmp_path):
        ts = _make_state(scene_dir, str(tmp_path / "logs"), threshold=0.2)
        batch, _ = ts.assemble_train_batch(ts.train_dataset, np.array([0]))
        outs, dicts = ts.inference(batch)
        d = dicts[1]
        assert FSK.adaptive_sample_mask in d
        mask = np.asarray(d[FSK.adaptive_sample_mask])
        assert mask.shape == (64, 16)
        # every ray keeps at least one sample (argmax fallback)
        assert (mask.sum(axis=1) >= 1).all()
        # z at dead slots must be inf, finite at active slots
        z = np.asarray(d[FSK.nerf_input_feature_z_vals])
        assert np.isinf(z[~mask]).all() and np.isfinite(z[mask]).all()
        # avg samples fraction recorded (features.py:561-563)
        frac = np.asarray(d[FSK.adaptive_sample_positions])
        np.testing.assert_allclose(frac, mask.sum(1) / 16.0, atol=1e-6)
        assert np.isfinite(np.asarray(outs[1])).all()

    def test_adaptive_train_step_grads_finite(self, scene_dir, tmp_path):
        ts = _make_state(scene_dir, str(tmp_path / "logs"), threshold=0.2)
        # fine schedule: oracle locked from epoch 0
        ts.config_file.epochsLockWeightsAfter = [0, -1]
        step = ts.make_train_step()
        batch, targets = ts.assemble_train_batch(ts.train_dataset, np.array([0, 1]))
        p0 = jax.tree.map(lambda x: x.copy(), ts.params[0])
        params, opts, per_net = step(ts.params, ts.opt_states, batch, targets,
                                     jnp.asarray(5), jax.random.PRNGKey(0))
        assert np.isfinite(float(per_net[1]))
        for leaf in jax.tree.leaves(params[1]):
            assert np.isfinite(np.asarray(leaf)).all()
        # oracle (net0) is locked -> unchanged
        for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(params[0])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestCheckpoint:
    def test_roundtrip_and_resume(self, scene_dir, tmp_path):
        log = str(tmp_path / "logs")
        ts = _make_state(scene_dir, log)
        ts.save_weights("0000010")
        # perturb params, then restore
        orig = jax.tree.map(lambda x: np.asarray(x).copy(), ts.params)
        ts.params = jax.tree.map(lambda x: x + 1.0, ts.params)
        ts.load_latest_weights()
        assert ts.epoch0 == 11
        for a, b in zip(jax.tree.leaves(orig), jax.tree.leaves(ts.params)):
            np.testing.assert_allclose(a, np.asarray(b), atol=1e-7)

    def test_config_echo_written(self, scene_dir, tmp_path):
        ts = _make_state(scene_dir, str(tmp_path / "logs"))
        assert os.path.exists(os.path.join(ts.logDir, "config.ini"))
        text = open(os.path.join(ts.logDir, "config.ini")).read()
        assert "inFeatures = [SpherePosDir, RayMarchFromPoses]" in text

    def test_experiment_name_format(self, scene_dir, tmp_path):
        ts = _make_state(scene_dir, str(tmp_path / "logs"))
        name = ts.experiment_name
        assert name.startswith("lo_")          # log depth transform
        assert "SpPoDi" in name and "relu0(32x4)" in name
        assert "LSfCDA_(0.0)" in name          # sampler print name
        assert "_acc_alpha" in name
        assert name.endswith("_O_Z_N")         # loss components
