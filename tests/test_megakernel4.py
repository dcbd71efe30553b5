"""v6 supertile megakernel correctness: must reproduce v5 exactly in fp32
interpret mode (the supertile/window/dyn-loop restructure is pure data
movement), across thresholds, chunk sizes, window widths, and both loop
modes, including tiles where some chunks are dead."""

import numpy as np
import jax.numpy as jnp
import pytest

from adanerf_tpu.config import Config
from adanerf_tpu.ops.pallas.megakernel import (pack_nerf_weights,
                                               pack_oracle_weights,
                                               prep_inputs)
from adanerf_tpu.ops.pallas.megakernel3 import make_megakernel_compact
from adanerf_tpu.ops.pallas.megakernel4 import make_megakernel_supertile
from adanerf_tpu.train_state import TrainState

from scene_utils import dense_config_args, make_scene


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    scene = make_scene(str(tmp_path_factory.mktemp("scene_mk4")))
    log = str(tmp_path_factory.mktemp("logs_mk4"))
    config = Config.init(argv=dense_config_args(scene, log, threshold=0.2))
    ts = TrainState()
    ts.initialize(config)
    return ts


def _packed(ts):
    po = pack_oracle_weights(ts.model_defs[0], ts.params[0],
                             dtype=jnp.float32)
    pn = pack_nerf_weights(ts.model_defs[1], ts.params[1], dtype=jnp.float32)
    return po, pn


def _inputs(ts, n):
    dataset = ts.test_dataset
    dirs = dataset.directions[:n]
    return prep_inputs(jnp.asarray(dirs), jnp.asarray(dataset.poses[0]),
                       jnp.asarray(dataset.rotations[0]))


def _v5(ts, inp, **kw):
    build = make_megakernel_compact(ts.model_defs[0], ts.model_defs[1],
                                    ts.scene, ts.config_file, interpret=True,
                                    **kw)
    return np.asarray(build(*_packed(ts))(*inp))


def _v6(ts, inp, **kw):
    build = make_megakernel_supertile(ts.model_defs[0], ts.model_defs[1],
                                      ts.scene, ts.config_file,
                                      interpret=True, **kw)
    return np.asarray(build(*_packed(ts))(*inp))


def test_supertile_matches_v5(setup):
    ts = setup
    inp = _inputs(ts, 256)
    out5 = _v5(ts, inp, tile=64, chunk=64)
    # supertile 4x the v5 tile, block-hierarchical cum, windowed chunks
    out6 = _v6(ts, inp, tile=256, chunk=64, block=64, hybrid=False)
    np.testing.assert_array_equal(out6[:, 3], out5[:, 3])
    # reduction-order (1-ulp class) differences only
    np.testing.assert_allclose(out6[:, :3], out5[:, :3], atol=2e-7, rtol=0)


def test_hybrid_dense_fast_path_matches(setup):
    """Count-uniform(ish) tiles take the dense v3-style sub-path, which
    skips the scatter's hi/lo round-trip — agreement with the compaction
    path is at the 2^-17 payload-split level, not bitwise."""
    ts = setup
    inp = _inputs(ts, 256)
    ref = _v6(ts, inp, tile=64, chunk=64, block=64, hybrid=False)
    hyb = _v6(ts, inp, tile=64, chunk=64, block=64, hybrid=True)
    np.testing.assert_array_equal(hyb[:, 3], ref[:, 3])
    np.testing.assert_allclose(hyb[:, :3], ref[:, :3], atol=2e-5, rtol=0)
    # force the compaction path on every tile (beta=0 disables dense)
    off = _v6(ts, inp, tile=64, chunk=64, block=64, hybrid=True,
              hybrid_beta=0.0)
    np.testing.assert_array_equal(off[:, 3], ref[:, 3])
    # same compaction math; the extra pl.when structure reorders one CPU
    # reduction -> 1-ulp jitter only
    np.testing.assert_allclose(off, ref, atol=2e-7, rtol=0)


@pytest.mark.parametrize("dyn_loop,pipelined", [(True, True), (True, False),
                                                (False, False)])
def test_supertile_loop_modes_identical(setup, dyn_loop, pipelined):
    ts = setup
    inp = _inputs(ts, 128)
    out = _v6(ts, inp, tile=128, chunk=64, block=64, dyn_loop=dyn_loop,
              pipelined=pipelined, hybrid=False)
    out5 = _v5(ts, inp, tile=64, chunk=64)
    np.testing.assert_array_equal(out[:, 3], out5[:, 3])
    np.testing.assert_allclose(out[:, :3], out5[:, :3], atol=2e-7, rtol=0)


@pytest.mark.parametrize("window", [0, 80, 128, 192])
def test_supertile_window_widths(setup, window):
    """The ray window is pure tiling: any W >= chunk+16 must be exact, and
    window=0 (full-tile masks, no dynamic slicing) must agree too."""
    ts = setup
    inp = _inputs(ts, 128)
    ref = _v6(ts, inp, tile=128, chunk=64, block=64, hybrid=False)
    out = _v6(ts, inp, tile=128, chunk=64, block=64, window=window,
              hybrid=False)
    np.testing.assert_array_equal(out, ref)


def test_supertile_dense_threshold0(setup, tmp_path_factory):
    """threshold=0 (dense path, every ray at cap S) exercises the max-chunk
    trip count."""
    scene_dir = make_scene(str(tmp_path_factory.mktemp("scene_mk4d")))
    log = str(tmp_path_factory.mktemp("logs_mk4d"))
    config = Config.init(argv=dense_config_args(scene_dir, log,
                                                threshold=0.0))
    ts = TrainState()
    ts.initialize(config)
    inp = _inputs(ts, 128)
    out5 = _v5(ts, inp, tile=64, chunk=64)
    out6 = _v6(ts, inp, tile=128, chunk=64, block=64, hybrid=False)
    np.testing.assert_array_equal(out6[:, 3], out5[:, 3])
    np.testing.assert_allclose(out6[:, :3], out5[:, :3], atol=2e-7, rtol=0)
