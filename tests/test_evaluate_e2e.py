"""End-to-end evaluation pipeline on the synthetic scene: train briefly, save
an opt checkpoint, run evaluate.py's driver (re-hydrating from the echoed
config), and aggregate with comparison.py."""

import os
import subprocess
import sys

import numpy as np
import pytest

from adanerf_tpu.config import Config
from adanerf_tpu.train_state import TrainState

from scene_utils import dense_config_args, make_scene

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    scene = make_scene(str(tmp_path_factory.mktemp("scene_eval")))
    log = str(tmp_path_factory.mktemp("logs_eval"))
    args = dense_config_args(scene, log, samples=64, epochs=12)
    config = Config.init(argv=args)
    ts = TrainState()
    ts.initialize(config)
    step = ts.make_train_step()
    import jax
    import jax.numpy as jnp
    for e in range(10):
        batch, targets = ts.assemble_train_batch(ts.train_dataset,
                                                 np.array([e % 4, (e + 1) % 4]))
        ts.params, ts.opt_states, _ = step(ts.params, ts.opt_states, batch,
                                           targets, jnp.asarray(e),
                                           jax.random.PRNGKey(e))
    ts.save_weights("_opt")
    with open(os.path.join(ts.logDir, "opt.txt"), "w") as f:
        f.write("Optimal validation loss 0.01 at epoch 10")
    return scene, ts


def test_evaluate_driver(trained):
    scene, ts = trained
    from adanerf_tpu.evaluation.evaluate import evaluate, load_config

    status, ts2 = load_config(scene, 0, ts.logDir,
                              ["complexity", "images", "psnr", "ssim", "flip"],
                              [], skip_if_already_done_once=False)
    assert status == 0
    evaluate(ts2, None, ["complexity", "images", "psnr", "ssim", "flip"])

    out = ts2.outDir
    assert os.path.exists(os.path.join(out, "image_quality_images.csv"))
    assert os.path.exists(os.path.join(out, "complexity.txt"))
    assert os.path.exists(os.path.join(out, "network_description.txt"))
    # csv has header + one row per test image with 6 metrics
    lines = open(os.path.join(out, "image_quality_images.csv")).read() \
        .replace('\r', '\n').split('\n')
    lines = [l for l in lines if l.strip()]
    assert lines[0] == "mse,psnr,ssim,flip,samples,sparsity"
    assert len(lines) == 2
    vals = [float(x) for x in lines[1].split(',')]
    assert np.isfinite(vals).all() and vals[1] > 0  # psnr positive

    # complexity: analytic MACs present
    last = open(os.path.join(out, "complexity.txt")).read().strip().split('\n')[-1]
    assert ':' in last

    # comparison aggregation over the experiment dir's parent
    parent = os.path.dirname(os.path.normpath(ts.logDir))
    r = subprocess.run([sys.executable, os.path.join(REPO, "comparison.py"),
                        "-d", parent], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert os.path.exists(os.path.join(parent, "comparison.csv"))
    content = open(os.path.join(parent, "comparison.csv")).read()
    assert "PSNR_Average" in content and "LSfCDA" in content
