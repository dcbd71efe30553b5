"""Fused megakernel vs the XLA realtime pipeline (interpret mode, fp32)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adanerf_tpu.config import Config
from adanerf_tpu.ops.pallas.megakernel import (make_megakernel,
                                               pack_oracle_weights,
                                               prep_inputs)
from adanerf_tpu.ops.pallas.megakernel import pack_nerf_weights
from adanerf_tpu.realtime import RealtimeRenderer
from adanerf_tpu.train_state import TrainState

from scene_utils import dense_config_args, make_scene


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    scene = make_scene(str(tmp_path_factory.mktemp("scene_mk")))
    log = str(tmp_path_factory.mktemp("logs_mk"))
    args = dense_config_args(scene, log, threshold=0.2)
    config = Config.init(argv=args)
    ts = TrainState()
    ts.initialize(config)
    return ts


def test_megakernel_matches_pipeline(setup):
    ts = setup
    rt = RealtimeRenderer(ts.model_defs, ts.params, ts.scene, ts.config_file,
                          batch_size=128, dtype=None)
    build = make_megakernel(ts.model_defs[0], ts.model_defs[1], ts.scene,
                            ts.config_file, tile=64, interpret=True)
    po = pack_oracle_weights(ts.model_defs[0], ts.params[0],
                             dtype=jnp.float32)
    pn = pack_nerf_weights(ts.model_defs[1], ts.params[1], dtype=jnp.float32)
    run = build(po, pn)

    dataset = ts.test_dataset
    dirs = dataset.directions[:128]
    pose = dataset.poses[0]
    rot = dataset.rotations[0]

    out = np.asarray(run(*prep_inputs(jnp.asarray(dirs), jnp.asarray(pose),
                                      jnp.asarray(rot))))
    rgb_mk = out[:, :3]
    counts_mk = out[:, 3].astype(int)

    rgb_ref = rt.render_frame(pose, rot, dirs)
    packed, mask, n_act = rt._oracle_fn(rt.params[0], jnp.asarray(pose),
                                        jnp.asarray(rot), jnp.asarray(dirs))
    counts_ref = np.asarray(mask).sum(axis=1)

    np.testing.assert_array_equal(counts_mk, counts_ref)
    np.testing.assert_allclose(rgb_mk, rgb_ref, atol=2e-4)


@pytest.mark.parametrize("threshold,n_raymarch", [(0.15, 3), (0.5, 4),
                                                  (0.9, 8)])
def test_pair_harvested_select_matches_pipeline(tmp_path_factory, threshold,
                                                n_raymarch):
    """The pair-harvested select + Batcher slot sort across regimes: odd S
    (non-power-of-2 network), mid threshold, and a high threshold where
    most rays take the argmax fallback."""
    scene = make_scene(str(tmp_path_factory.mktemp("scene_mkp")))
    log = str(tmp_path_factory.mktemp("logs_mkp"))
    args = dense_config_args(scene, log, threshold=threshold,
                             n_raymarch=n_raymarch)
    config = Config.init(argv=args)
    ts = TrainState()
    ts.initialize(config)

    rt = RealtimeRenderer(ts.model_defs, ts.params, ts.scene, ts.config_file,
                          batch_size=128, dtype=None)
    build = make_megakernel(ts.model_defs[0], ts.model_defs[1], ts.scene,
                            ts.config_file, tile=64, interpret=True)
    po = pack_oracle_weights(ts.model_defs[0], ts.params[0],
                             dtype=jnp.float32)
    pn = pack_nerf_weights(ts.model_defs[1], ts.params[1], dtype=jnp.float32)
    run = build(po, pn)

    dataset = ts.test_dataset
    dirs = dataset.directions[:128]
    pose = dataset.poses[0]
    rot = dataset.rotations[0]

    out = np.asarray(run(*prep_inputs(jnp.asarray(dirs), jnp.asarray(pose),
                                      jnp.asarray(rot))))
    rgb_ref = rt.render_frame(pose, rot, dirs)
    _, mask, _ = rt._oracle_fn(rt.params[0], jnp.asarray(pose),
                               jnp.asarray(rot), jnp.asarray(dirs))
    counts_ref = np.asarray(mask).sum(axis=1)
    assert counts_ref.min() >= 1  # fallback rays present and kept
    np.testing.assert_array_equal(out[:, 3].astype(int), counts_ref)
    np.testing.assert_allclose(out[:, :3], rgb_ref, atol=2e-4)
