"""GT-depth training paths (trainWithGTDepth + ClassifiedDepth oracle
targets + SpherePosDir depth warp) and the NDC pipeline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adanerf_tpu.config import Config
from adanerf_tpu.pipeline.keys import FSK, DatasetKeys
from adanerf_tpu.train_state import TrainState

from scene_utils import dense_config_args, make_scene


@pytest.fixture(scope="module")
def depth_scene(tmp_path_factory):
    return make_scene(str(tmp_path_factory.mktemp("scene_gt")), with_depth=True)


class TestGTDepth:
    def _state(self, scene, log, extra):
        args = dense_config_args(scene, log) + extra
        config = Config.init(argv=args)
        ts = TrainState()
        ts.initialize(config)
        return ts

    def test_depth_images_loaded_and_warped(self, depth_scene, tmp_path):
        ts = self._state(depth_scene, str(tmp_path / "l1"),
                         ["--trainWithGTDepth"])
        assert ts.train_dataset.depth_images is not None
        d = ts.train_dataset.depth_images
        assert d.shape[1:] == (24, 24, 1)
        assert np.isfinite(d).all() and (d >= 0).all() and (d <= 1.0).all()

    def test_gt_depth_drives_sampler_in_training(self, depth_scene, tmp_path):
        """With trainWithGTDepth, the shading net's z samples come from the
        GT depth, not the oracle (features.py:402-405)."""
        args = dense_config_args(depth_scene, str(tmp_path / "l2"))
        args[args.index("FromClassifiedDepthAdaptive")] = "LinearlySpacedFromDepth"
        args += ["--trainWithGTDepth"]
        config = Config.init(argv=args)
        ts = TrainState()
        ts.initialize(config)
        # sampler list was overridden (CLI wins over the helper's defaults)
        assert ts.f_in[1].sampler_name == "LinearlySpacedFromDepth"
        batch, targets = ts.assemble_train_batch(ts.train_dataset,
                                                 np.array([0, 1]))
        assert DatasetKeys.depth_image_samples in batch
        step = ts.make_train_step()
        p, o, per = step(ts.params, ts.opt_states, batch, targets,
                         jnp.asarray(0), jax.random.PRNGKey(0))
        assert np.isfinite(float(per[1]))

    def test_classified_depth_oracle_target(self, depth_scene, tmp_path):
        """ClassifiedDepth out-feature: windowed depth-bin targets built on
        host via the native kernel feed a BCE oracle loss."""
        args = dense_config_args(depth_scene, str(tmp_path / "l3"))
        # swap oracle loss+target: ClassifiedDepth + BCE
        i = args.index("RawSigmoid")
        args[i] = "ClassifiedDepth"
        j = args.index("NeRFWeightMultiplicationLoss")
        args[j] = "BCEWithLogitsLoss"
        args += ["--trainWithGTDepth", "--multiDepthWindowSize", "3",
                 "--multiDepthWindowSize", "3"]
        config = Config.init(argv=args)
        ts = TrainState()
        ts.initialize(config)
        batch, targets = ts.assemble_train_batch(ts.train_dataset,
                                                 np.array([0, 1]))
        assert 0 in targets
        t = np.asarray(targets[0])
        assert t.shape == (128, 16)  # 2 img x 64 rays, 16 bins
        assert (t >= 0).all() and (t <= 1).all() and t.sum() > 0
        step = ts.make_train_step()
        p, o, per = step(ts.params, ts.opt_states, batch, targets,
                         jnp.asarray(0), jax.random.PRNGKey(0))
        assert np.isfinite(float(per[0])) and float(per[0]) > 0


class TestNDC:
    def test_ndc_cascade_runs(self, depth_scene, tmp_path):
        args = dense_config_args(depth_scene, str(tmp_path / "ndc"),
                                 threshold=0.2)
        args[args.index("FromClassifiedDepthAdaptive")] = \
            "FromClassifiedDepthAdaptiveNoDepthRange"
        k = args.index("InverseSqrtDistCentered")
        args[args.index("InverseSqrtDistCentered", k + 1)] = "None"
        args[args.index("log")] = "linear"
        args += ["--useNDC"]
        config = Config.init(argv=args)
        ts = TrainState()
        ts.initialize(config)
        assert ts.experiment_name.startswith("ndc_")
        batch, _ = ts.assemble_train_batch(ts.train_dataset, np.array([0]))
        outs, dicts = ts.inference(batch)
        rgb = np.asarray(outs[1])
        assert np.isfinite(rgb).all()
        # NDC: estimated depth is NOT re-warped (features.py:573-577)
        assert FSK.nerf_estimated_depth in dicts[1]
        d = dicts[1]
        z = np.asarray(d[FSK.nerf_input_feature_z_vals])
        mask = np.asarray(d[FSK.adaptive_sample_mask])
        # NoDepthRange sampler: z stays in [0,1] cells (no to_world)
        assert (z[mask] >= 0).all() and (z[mask] <= 1.0).all()
