"""Rays-sharded multi-chip frame rendering (adanerf_tpu/parallel/render.py)
on the 8-virtual-CPU-device mesh: the sharded megakernel frame must match
the single-device kernel BIT-exactly (sharding rays is pure data placement
— every pipeline stage is per-ray independent, zero collectives).

Reference analog: the CUDA viewer scales a frame by looping 80k-ray batches
through one GPU (imagegenerator.cpp:247-394); here the batches are device
shards instead.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adanerf_tpu.config import Config
from adanerf_tpu.ops.pallas.megakernel import (pack_nerf_weights,
                                               pack_oracle_weights,
                                               prep_inputs)
from adanerf_tpu.ops.pallas.megakernel3 import make_megakernel_compact
from adanerf_tpu.parallel.render import (devices_mesh, frame_pad,
                                         place_frame_inputs,
                                         shard_megakernel)
from adanerf_tpu.train_state import TrainState

from scene_utils import dense_config_args, make_scene


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    scene = make_scene(str(tmp_path_factory.mktemp("scene_pr")))
    log = str(tmp_path_factory.mktemp("logs_pr"))
    config = Config.init(argv=dense_config_args(scene, log, threshold=0.2))
    ts = TrainState()
    ts.initialize(config)
    return ts


def test_frame_pad():
    # 800x800 over 8 devices at tile 256: whole tiles per shard, <0.2% pad
    assert frame_pad(640_000, 256, 8) == 641_024
    assert frame_pad(640_000, 256, 1) == 640_000
    assert frame_pad(512, 64, 4) == 512
    assert frame_pad(513, 64, 4) == 768


@pytest.mark.parametrize("n_devices", [2, 4, 8])
def test_sharded_megakernel_bit_exact(setup, n_devices):
    ts = setup
    dataset = ts.test_dataset
    n = 512  # 8 tiles of 64: divisible by every mesh size tested
    dirs = dataset.directions[:n]
    pose = dataset.poses[0]
    rot = dataset.rotations[0]

    po = pack_oracle_weights(ts.model_defs[0], ts.params[0],
                             dtype=jnp.float32)
    pn = pack_nerf_weights(ts.model_defs[1], ts.params[1], dtype=jnp.float32)
    mk = make_megakernel_compact(ts.model_defs[0], ts.model_defs[1],
                                 ts.scene, ts.config_file, tile=64, chunk=64,
                                 interpret=True)(po, pn)
    dirs_pad, pose8, rot_pad = prep_inputs(jnp.asarray(dirs),
                                           jnp.asarray(pose),
                                           jnp.asarray(rot))
    ref = np.asarray(mk(dirs_pad, pose8, rot_pad))

    mesh = devices_mesh(n_devices)
    sharded = jax.jit(shard_megakernel(mesh, mk))
    d_s, p_s, r_s = place_frame_inputs(mesh, dirs_pad, pose8, rot_pad)
    out = np.asarray(sharded(d_s, p_s, r_s))

    np.testing.assert_array_equal(out, ref)


def test_sharded_via_viewer_builder(setup):
    """The viewer/bench wiring path: build_megakernel_renderer(mesh=...)
    matches the unsharded build on the same frame, including the ray
    padding to whole per-shard tiles (viewer frames are rarely divisible)."""
    from adanerf_tpu.realtime import RealtimeRenderer
    from viewer import build_megakernel_renderer

    ts = setup
    rt = RealtimeRenderer(ts.model_defs, ts.params, ts.scene, ts.config_file,
                          batch_size=128, dtype=None)
    dataset = ts.test_dataset
    dirs = np.asarray(dataset.directions[:576])  # 24x24: 9 tiles, pad to 12
    pose = dataset.poses[0]
    rot = dataset.rotations[0]

    r1 = build_megakernel_renderer(rt, ts.scene, dirs, variant="v5", tile=64)
    rgb1, counts1 = r1(rt.params[0], rt.params[1], jnp.asarray(pose),
                       jnp.asarray(rot), None)

    mesh = devices_mesh(4)
    r4 = build_megakernel_renderer(rt, ts.scene, dirs, variant="v5", tile=64,
                                   mesh=mesh)
    rgb4, counts4 = r4(rt.params[0], rt.params[1], jnp.asarray(pose),
                       jnp.asarray(rot), None)

    np.testing.assert_array_equal(np.asarray(counts4), np.asarray(counts1))
    np.testing.assert_array_equal(np.asarray(rgb4), np.asarray(rgb1))
