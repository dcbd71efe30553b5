"""The bucketed-compaction realtime renderer must reproduce the cascade's
masked-dense adaptive rendering exactly (the compaction is a reshuffle, not an
approximation)."""

import jax.numpy as jnp
import numpy as np
import pytest

from adanerf_tpu.config import Config
from adanerf_tpu.ops.compaction import compact_indices, scatter_back
from adanerf_tpu.realtime import FrameStats, RealtimeRenderer
from adanerf_tpu.render import render_rays_chunked
from adanerf_tpu.train_state import TrainState

from scene_utils import dense_config_args, make_scene


@pytest.fixture(scope="module")
def adaptive_state(tmp_path_factory):
    scene = make_scene(str(tmp_path_factory.mktemp("scene_rt")))
    log = str(tmp_path_factory.mktemp("logs_rt"))
    args = dense_config_args(scene, log, threshold=0.2)
    config = Config.init(argv=args)
    ts = TrainState()
    ts.initialize(config)
    return ts


@pytest.fixture(scope="module")
def ndc_state(tmp_path_factory):
    """Adaptive cascade on an NDC (forward-facing) config."""
    scene = make_scene(str(tmp_path_factory.mktemp("scene_rt_ndc")))
    log = str(tmp_path_factory.mktemp("logs_rt_ndc"))
    args = dense_config_args(scene, log, threshold=0.2)
    args[args.index("FromClassifiedDepthAdaptive")] = \
        "FromClassifiedDepthAdaptiveNoDepthRange"
    k = args.index("InverseSqrtDistCentered")
    args[args.index("InverseSqrtDistCentered", k + 1)] = "None"
    args[args.index("log")] = "linear"
    args += ["--useNDC"]
    config = Config.init(argv=args)
    ts = TrainState()
    ts.initialize(config)
    return ts


class TestCompactionOps:
    def test_compact_roundtrip(self):
        rng = np.random.RandomState(0)
        mask = jnp.array(rng.rand(64) > 0.6)
        vals = jnp.array(rng.randn(64, 4).astype(np.float32))
        cap = 32
        src, n_act = compact_indices(mask, cap)
        assert int(n_act) == int(mask.sum())
        gathered = vals[src]
        restored = scatter_back(gathered, src, n_act, 64)
        expected = np.where(np.asarray(mask)[:, None], np.asarray(vals), 0.0)
        np.testing.assert_allclose(np.asarray(restored), expected, atol=1e-6)

    def test_compact_capacity_clip(self):
        mask = jnp.ones(16, bool)
        src, n_act = compact_indices(mask, 8)
        assert int(n_act) == 16  # count reports the truth
        np.testing.assert_array_equal(np.asarray(src), np.arange(8))


class TestRealtimeRenderer:
    def test_matches_cascade(self, adaptive_state):
        ts = adaptive_state
        rt = RealtimeRenderer(ts.model_defs, ts.params, ts.scene,
                              ts.config_file, batch_size=128,
                              dtype=None)  # fp32 for exact comparison
        dataset = ts.test_dataset
        stats = FrameStats()
        img_rt = rt.render_frame(dataset.poses[0], dataset.rotations[0],
                                 dataset.directions, stats)

        imgs, _ = render_rays_chunked(ts, dataset.poses[0],
                                      dataset.rotations[0], 128)
        np.testing.assert_allclose(img_rt, imgs[-1], atol=2e-5)
        assert stats.n_rays >= dataset.directions.shape[0]
        assert 1.0 <= stats.avg_samples_per_pixel <= 16.0

    def test_ndc_matches_cascade(self, ndc_state):
        """NDC path: realtime must reproduce the training-semantics NDC
        renderer exactly (ndc_rays + raw [0,1] z + normalized-dir encode,
        the rayMarchFromPosesAdaptiveNDC analog)."""
        ts = ndc_state
        rt = RealtimeRenderer(ts.model_defs, ts.params, ts.scene,
                              ts.config_file, batch_size=128, dtype=None)
        assert rt.use_ndc and rt.z_no_range
        dataset = ts.test_dataset
        img_rt = rt.render_frame(dataset.poses[0], dataset.rotations[0],
                                 dataset.directions)
        imgs, _ = render_rays_chunked(ts, dataset.poses[0],
                                      dataset.rotations[0], 128)
        np.testing.assert_allclose(img_rt, imgs[-1], atol=2e-5)

    def test_dense_fallback_matches(self, adaptive_state):
        ts = adaptive_state
        rt = RealtimeRenderer(ts.model_defs, ts.params, ts.scene,
                              ts.config_file, batch_size=128, dtype=None,
                              compaction=False)
        dataset = ts.test_dataset
        img_rt = rt.render_frame(dataset.poses[0], dataset.rotations[0],
                                 dataset.directions)
        imgs, _ = render_rays_chunked(ts, dataset.poses[0],
                                      dataset.rotations[0], 128)
        np.testing.assert_allclose(img_rt, imgs[-1], atol=2e-5)

    def test_bf16_close(self, adaptive_state):
        ts = adaptive_state
        rt = RealtimeRenderer(ts.model_defs, ts.params, ts.scene,
                              ts.config_file, batch_size=128,
                              dtype=jnp.bfloat16)
        dataset = ts.test_dataset
        img_rt = rt.render_frame(dataset.poses[0], dataset.rotations[0],
                                 dataset.directions)
        imgs, _ = render_rays_chunked(ts, dataset.poses[0],
                                      dataset.rotations[0], 128)
        # bf16 matmuls with fp32 accumulation: small error on [0,1] outputs
        assert np.abs(img_rt - imgs[-1]).max() < 0.05
