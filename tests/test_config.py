"""Config system tests: ini parsing, list expansion, CLI-over-ini precedence,
only_known_args, config echo."""

import os

import pytest

from adanerf_tpu.config import Config, write_config_echo


INI = """
[Data]
depthTransform = log

[Features]
inFeatures = [SpherePosDir, RayMarchFromPoses]
outFeatures = [RawSigmoid, RGBARayMarch]
posEnc = [nerf, nerf]
posEncArgs = [10-4, 10-4]

[Network]
activation = [relu, nerf]
layers = [8, 8]
layerWidth = [256, 256]
skips = [ , auto]

[Training]
epochs = 300001
samples = 2048
lrate = 5e-4
losses = [NeRFWeightMultiplicationLoss, MSE]
lossWeights = [0.025, 1.0]
; a comment line
adaptiveSamplingThreshold = 0.15
accumulationMult = alpha
deterministicSampling = True
"""


@pytest.fixture
def ini_path(tmp_path):
    p = tmp_path / "cfg.ini"
    p.write_text(INI)
    return str(p)


def test_ini_lists_and_scalars(ini_path):
    cfg = Config.init(argv=["-c", ini_path, "-data", "/d", "-log", "/l"])
    assert cfg.inFeatures == ["SpherePosDir", "RayMarchFromPoses"]
    assert cfg.losses == ["NeRFWeightMultiplicationLoss", "MSE"]
    assert cfg.layers == [8, 8]
    assert cfg.lossWeights == [0.025, 1.0]
    assert cfg.depthTransform == "log"
    assert cfg.epochs == 300001
    assert cfg.lrate == 5e-4
    assert cfg.adaptiveSamplingThreshold == 0.15
    assert cfg.deterministicSampling is True
    assert cfg.skips[0].strip() == "" and cfg.skips[1] == "auto"


def test_cli_overrides_ini(ini_path):
    cfg = Config.init(argv=["-c", ini_path, "-data", "/d", "-log", "/l",
                            "--epochs", "5", "--losses", "MSE"])
    assert cfg.epochs == 5
    assert cfg.losses == ["MSE"]  # CLI append list replaces ini list


def test_only_known_args(tmp_path, ini_path):
    with open(ini_path, "a") as f:
        f.write("someUnknownOption = 42\n")
    cfg = Config.init(path=ini_path, only_known_args=True,
                      argv=["-data", "/d", "-log", "/l"])
    assert cfg.epochs == 300001


def test_config_echo_roundtrip(tmp_path, ini_path):
    cfg = Config.init(argv=["-c", ini_path, "-data", "/d", "-log", "/l"])
    write_config_echo(cfg, str(tmp_path))
    echoed = Config.init(path=str(tmp_path / "config.ini"),
                         only_known_args=True, argv=[])
    assert echoed.inFeatures == cfg.inFeatures
    assert echoed.lossWeights == cfg.lossWeights
    assert echoed.adaptiveSamplingThreshold == cfg.adaptiveSamplingThreshold


def test_defaults():
    cfg = Config.init(argv=["-data", "/d", "-log", "/l"])
    assert cfg.epochs == 300001
    assert cfg.samples == 128
    assert cfg.inferenceChunkSize == 65536
    assert cfg.sampleGenerator == "PreGeneratedRSequenceGenerator"
