"""Loss-registry cross-validation against the reference implementation."""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

if "configargparse" not in sys.modules:
    stub = types.ModuleType("configargparse")
    stub.ArgParser = object
    sys.modules["configargparse"] = stub
sys.path.insert(0, "/root/reference/src")

import jax.numpy as jnp
from types import SimpleNamespace

import losses as ref_losses  # noqa: E402

from adanerf_tpu.pipeline import losses as my_losses
from adanerf_tpu.pipeline.keys import FSK


def t(x):
    return torch.from_numpy(np.asarray(x).copy())


CFG = SimpleNamespace(multiDepthIgnoreValue=[1.01, 1.01],
                      lossAlpha=[0.7, 0.7], lossBeta=[0.3, 0.3],
                      lossComponents=["One", "Zero", "NerfA"],
                      lossComponentBlending=[-1.0, -1.0, -1.0],
                      lossWeights=[1.0, 1.0],
                      lossBlendingStart=100, lossBlendingDuration=200)


def test_limited_depth_mse():
    rng = np.random.RandomState(0)
    out = rng.rand(64, 1).astype(np.float32)
    tgt = rng.rand(64, 1).astype(np.float32)
    tgt[::5] = 1.01  # ignored pixels
    ref = ref_losses.LimitedDepthMSELoss(config=CFG, net_idx=0)(t(out), t(tgt))
    mine = my_losses.LimitedDepthMSELoss(CFG, 0)(jnp.asarray(out),
                                                 jnp.asarray(tgt))
    assert np.isclose(float(mine), float(ref), rtol=1e-5)


def test_multi_depth_limited_mse():
    rng = np.random.RandomState(1)
    out = rng.rand(32, 4).astype(np.float32)
    tgt = rng.rand(32, 4).astype(np.float32)
    tgt[::4, 2] = 1.01
    ref = ref_losses.MultiDepthLimitedMSELoss(config=CFG, net_idx=0)(
        t(out), t(tgt))
    mine = my_losses.MultiDepthLimitedMSELoss(CFG, 0)(jnp.asarray(out),
                                                      jnp.asarray(tgt))
    assert np.isclose(float(mine), float(ref), rtol=1e-4)


def test_mse_plus_weight_accum():
    rng = np.random.RandomState(2)
    out = rng.rand(48, 3).astype(np.float32)
    tgt = rng.rand(48, 3).astype(np.float32)
    weights = rng.rand(48, 16).astype(np.float32)
    ref = ref_losses.MSEPlusWeightAccum(config=CFG, net_idx=0)(
        t(out), t(tgt),
        inference_dict={FSK.nerf_weights_output: t(weights)})
    mine = my_losses.MSEPlusWeightAccum(CFG, 0)(
        jnp.asarray(out), jnp.asarray(tgt),
        inference_dict={FSK.nerf_weights_output: jnp.asarray(weights)})
    assert np.isclose(float(mine), float(ref), rtol=1e-5)


@pytest.mark.parametrize("epoch", [0, 150, 250, 500])
def test_nerf_weight_multiplication_loss(epoch):
    rng = np.random.RandomState(3)
    out = rng.rand(40, 16).astype(np.float32)
    weights = rng.rand(40, 16).astype(np.float32)
    alpha = rng.rand(40, 16).astype(np.float32)
    inf = [None, {FSK.nerf_weights_output: t(weights),
                  FSK.nerf_alpha_output: t(alpha)}]
    ref = ref_losses.NeRFWeightMultiplicationLoss(config=CFG, net_idx=0)(
        t(out), None, inference_dict=inf, epoch=epoch)
    mine = my_losses.NeRFWeightMultiplicationLoss(CFG, 0)(
        jnp.asarray(out), None, epoch=epoch,
        inference_dicts=[None, {FSK.nerf_weights_output: jnp.asarray(weights),
                                FSK.nerf_alpha_output: jnp.asarray(alpha)}])
    assert np.isclose(float(mine), float(ref), rtol=1e-5)


def test_bce_with_logits():
    rng = np.random.RandomState(4)
    out = rng.randn(64, 16).astype(np.float32)
    tgt = (rng.rand(64, 16) > 0.5).astype(np.float32)
    ref = torch.nn.BCEWithLogitsLoss()(t(out), t(tgt))
    mine = my_losses.BCEWithLogitsLoss(CFG, 0)(jnp.asarray(out),
                                               jnp.asarray(tgt))
    assert np.isclose(float(mine), float(ref), rtol=1e-5)


def test_cross_entropy():
    rng = np.random.RandomState(5)
    out = rng.randn(64, 16).astype(np.float32)
    tgt = rng.randint(0, 16, 64)
    ref = torch.nn.CrossEntropyLoss()(t(out), torch.from_numpy(tgt))
    mine = my_losses.CrossEntropyLoss(CFG, 0)(jnp.asarray(out),
                                              jnp.asarray(tgt))
    assert np.isclose(float(mine), float(ref), rtol=1e-5)


def test_cross_entropy_weighted():
    rng = np.random.RandomState(6)
    n_cls = 17
    out = rng.randn(64, n_cls).astype(np.float32)
    tgt = rng.randint(0, n_cls, 64)
    w = np.ones(n_cls, np.float32)
    w[-1] = 0.0
    ref = torch.nn.CrossEntropyLoss(weight=t(w))(t(out), torch.from_numpy(tgt))
    mine = my_losses.CrossEntropyLoss(CFG, 0, weights=jnp.asarray(w))(
        jnp.asarray(out), jnp.asarray(tgt))
    assert np.isclose(float(mine), float(ref), rtol=1e-4)
