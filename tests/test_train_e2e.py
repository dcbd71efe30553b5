"""End-to-end training smoke test: run the real train.py loop on the
synthetic scene for a few epochs, then render via test.py paths."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adanerf_tpu.config import Config
from adanerf_tpu.train_state import TrainState

from scene_utils import dense_config_args, make_scene


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    return make_scene(str(tmp_path_factory.mktemp("scene_e2e")))


def _load_repo_train():
    """Import the repo's root train.py BY PATH: the parity tests prepend
    /root/reference/src to sys.path (it also has a train.py), so a bare
    ``import train`` is test-order-dependent."""
    import importlib.util
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "adanerf_repo_train", os.path.join(root, "train.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_train_loop_and_render(scene_dir, tmp_path):
    train_mod = _load_repo_train()

    log_dir = str(tmp_path / "logs")
    args = dense_config_args(scene_dir, log_dir, samples=64, epochs=31)
    args += ["--epochsCheckpoint", "10", "--epochsRender", "15",
             "--epochsValidate", "20", "--lossBlendingStart", "2",
             "--lossBlendingDuration", "10", "--randomSeed", "7"]
    config = Config.init(argv=args)
    ts = TrainState()
    ts.initialize(config)
    ts.load_latest_weights()
    assert ts.epoch0 == 1

    train_mod.train(ts)

    # checkpoint written at epoch 10/20/30
    ckpts = [f for f in os.listdir(ts.logDir) if f.endswith(".weights")]
    assert any("0000030" in f for f in ckpts)
    # validation ran (blending done by epoch 20) and wrote stats + opt.txt
    assert os.path.exists(os.path.join(ts.logDir, "logs.csv"))
    assert os.path.exists(os.path.join(ts.logDir, "opt.txt"))
    # debug render artifacts at epoch 15/30
    renders = [f for f in os.listdir(ts.logDir) if f.startswith("0000015")]
    assert any(f.endswith("_1.png") for f in renders)

    # resume: a new state picks up epoch 31
    ts2 = TrainState()
    config2 = Config.init(argv=args)
    ts2.initialize(config2)
    ts2.load_latest_weights()
    assert ts2.epoch0 == 31

    # offline render of the test split
    from adanerf_tpu.render import render_all_imgs
    psnrs = render_all_imgs(ts2, "test_images/", dataset_name="test")
    assert len(psnrs) == 1 and np.isfinite(psnrs[0])
    out_dir = os.path.join(ts2.logDir, "test_images", "test")
    files = os.listdir(out_dir)
    assert any(f.endswith("_depth.npz") for f in files)
    assert any(f.endswith("_weights.trch.npy") for f in files)


def test_fine_adaptive_training_step(scene_dir, tmp_path):
    """Fine-config training (adaptive sampler, S<bins, oracle locked from
    epoch 0): the locked oracle's NeRFWeightMultiplicationLoss must be
    statically skipped (reference train.py:305-307 skips locked criteria;
    with S != multiDepthFeatures its shapes are incompatible by design) and
    only net1 may train."""
    import jax

    log_dir = str(tmp_path / "logs_fine")
    args = dense_config_args(scene_dir, log_dir, samples=32, epochs=3,
                             threshold=0.2)
    seen_after = 0
    for i, a in enumerate(args):
        if a == "--epochsLockWeightsAfter":
            args[i + 1] = "0" if seen_after == 0 else "-1"
            seen_after += 1
    config = Config.init(argv=args)
    assert config.numRaymarchSamples[0] != config.multiDepthFeatures[0] or \
        config.numRaymarchSamples[0] == 16  # scene_utils tiny preset
    ts = TrainState()
    ts.initialize(config)
    assert not ts.ever_unlocked(0) and ts.ever_unlocked(1)

    step = ts.make_train_step()
    batch, targets = ts.assemble_train_batch(ts.train_dataset,
                                             np.array([0, 1]))
    p0_before = jax.tree.map(lambda x: np.asarray(x).copy(), ts.params[0])
    p1_before = jax.tree.map(lambda x: np.asarray(x).copy(), ts.params[1])
    params, opts, per_net = step(ts.params, ts.opt_states, batch, targets,
                                 1, jax.random.PRNGKey(0))
    # locked oracle: loss reported 0, params bit-identical
    assert float(per_net[0]) == 0.0 and np.isfinite(float(per_net[1]))
    for a, b in zip(jax.tree.leaves(p0_before), jax.tree.leaves(params[0])):
        np.testing.assert_array_equal(a, np.asarray(b))
    # net1 trained
    changed = any(not np.array_equal(a, np.asarray(b)) for a, b in
                  zip(jax.tree.leaves(p1_before), jax.tree.leaves(params[1])))
    assert changed
