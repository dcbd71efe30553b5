"""Ragged (count-sorted + slot-skipping) megakernel pipeline vs the XLA
realtime pipeline (interpret mode, fp32)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adanerf_tpu.config import Config
from adanerf_tpu.ops.pallas.megakernel import pack_oracle_weights, prep_inputs
from adanerf_tpu.ops.pallas.megakernel2 import make_ragged_pipeline
from adanerf_tpu.ops.pallas.mlp_kernels import pack_nerf_weights
from adanerf_tpu.realtime import RealtimeRenderer
from adanerf_tpu.train_state import TrainState

from scene_utils import dense_config_args, make_scene


def test_ragged_pipeline_matches_xla(tmp_path):
    scene = make_scene(str(tmp_path / "scene"))
    config = Config.init(argv=dense_config_args(
        scene, str(tmp_path / "logs"), threshold=0.2))
    ts = TrainState()
    ts.initialize(config)

    rt = RealtimeRenderer(ts.model_defs, ts.params, ts.scene, ts.config_file,
                          batch_size=128, dtype=None)
    build = make_ragged_pipeline(ts.model_defs[0], ts.model_defs[1], ts.scene,
                                 ts.config_file, tile=64, shade_tile=64, interpret=True)
    po = pack_oracle_weights(ts.model_defs[0], ts.params[0],
                             dtype=jnp.float32)
    pn = pack_nerf_weights(ts.model_defs[1], ts.params[1], dtype=jnp.float32)
    run = build(po, pn)

    dataset = ts.test_dataset
    dirs = dataset.directions[:192]
    pose = dataset.poses[0]
    rot = dataset.rotations[0]

    rgb, counts = run(*prep_inputs(jnp.asarray(dirs), jnp.asarray(pose),
                                   jnp.asarray(rot)))
    rgb = np.asarray(rgb)

    rgb_ref = rt.render_frame(pose, rot, dirs)
    packed, mask, n_act = rt._oracle_fn(rt.params[0], jnp.asarray(pose),
                                        jnp.asarray(rot), jnp.asarray(dirs[:128]))
    # counts parity on the first batch
    np.testing.assert_array_equal(np.asarray(counts)[:128],
                                  np.asarray(mask).sum(axis=1))
    np.testing.assert_allclose(rgb, rgb_ref, atol=2e-4)

    # slot-grouped shading (batched MLP, group-granular skipping) is exact
    for g in (2, 8):
        build_g = make_ragged_pipeline(
            ts.model_defs[0], ts.model_defs[1], ts.scene, ts.config_file,
            tile=64, shade_tile=64, slot_group=g, interpret=True)
        rgb_g, counts_g = build_g(po, pn)(*prep_inputs(
            jnp.asarray(dirs), jnp.asarray(pose), jnp.asarray(rot)))
        np.testing.assert_array_equal(np.asarray(counts_g),
                                      np.asarray(counts))
        np.testing.assert_allclose(np.asarray(rgb_g), rgb, atol=1e-5)
