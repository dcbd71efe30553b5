"""CLI entry-point smoke tests via subprocess (ADANERF_PLATFORM=cpu)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from scene_utils import dense_config_args, make_scene

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(script, args, **kw):
    env = dict(os.environ)
    env["ADANERF_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    return subprocess.run([sys.executable, os.path.join(REPO, script)] + args,
                          capture_output=True, text=True, env=env,
                          timeout=600, **kw)


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    return make_scene(str(tmp_path_factory.mktemp("scene_cli")),
                      with_depth=True)


def test_train_cli(scene, tmp_path):
    log = str(tmp_path / "logs")
    args = dense_config_args(scene, log, samples=32, epochs=6)
    args += ["--epochsCheckpoint", "5", "--epochsRender", "100",
             "--epochsValidate", "100", "--nonVerbose"]
    r = run_cli("train.py", args)
    assert r.returncode == 0, r.stderr[-3000:]
    exp_dirs = []
    for root, dirs, files in os.walk(log):
        if any(f.endswith(".weights") for f in files):
            exp_dirs.append(root)
    assert exp_dirs, "no checkpoints written"


def test_prepare_dataset_cli(scene):
    r = run_cli("prepare_dataset.py", ["-data", scene])
    assert r.returncode == 0, r.stderr[-2000:]
    info = json.load(open(os.path.join(scene, "dataset_info.json")))
    assert "depth_range_warped_log" in info
    assert info["depth_range"][0] < info["depth_range"][1]


def test_test_cli(scene, tmp_path):
    log = str(tmp_path / "logs")
    args = dense_config_args(scene, log, samples=32, epochs=3)
    # initialize an experiment dir with weights via a 2-epoch train
    r = run_cli("train.py", args + ["--epochsCheckpoint", "2", "--nonVerbose",
                                    "--epochsRender", "100",
                                    "--epochsValidate", "100"])
    assert r.returncode == 0, r.stderr[-2000:]
    r = run_cli("test.py", args)
    assert r.returncode == 0, r.stderr[-3000:]
    # rendered split outputs exist
    found = False
    for root, dirs, files in os.walk(log):
        if root.endswith(os.path.join("test_images", "test")) and files:
            found = True
    assert found


def test_export_and_viewer_cli(scene, tmp_path):
    log = str(tmp_path / "logs")
    # small full-width nets so the viewer's posEnc-derived reconstruction works
    args = dense_config_args(scene, log, samples=32, epochs=3)
    args = [a if a != "4-2" else "10-4" for a in args]
    for i, a in enumerate(args):
        if a in ("--layerWidth", "--multiDepthFeatures"):
            args[i + 1] = {"--layerWidth": "256",
                           "--multiDepthFeatures": "128"}[a]
        if a == "--layers":
            args[i + 1] = "8"
        if a == "--numRaymarchSamples":
            args[i + 1] = "128"  # dense mode: bins == raymarch samples
        if a == "--rayMarchSamplingStep":
            args[i + 1] = "0.0078125"
    r = run_cli("train.py", args + ["--epochsCheckpoint", "2", "--nonVerbose",
                                    "--epochsRender", "100",
                                    "--epochsValidate", "100"])
    assert r.returncode == 0, r.stderr[-2000:]
    r = run_cli("export.py", args)
    assert r.returncode == 0, r.stderr[-2000:]
    export_dir = None
    for root, dirs, files in os.walk(log):
        if os.path.basename(root) == "exported_model":
            export_dir = root
    assert export_dir, "no exported_model dir"

    r = run_cli("viewer.py", [export_dir, "-s", "24", "24", "-bs", "288",
                              "-n", "3", "--logging_interval", "1"])
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
    assert "FPS" in r.stdout
