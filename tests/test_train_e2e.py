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


def test_train_loop_and_render(scene_dir, tmp_path):
    import train as train_mod

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
