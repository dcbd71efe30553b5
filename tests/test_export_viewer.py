"""Export -> viewer roundtrip: export artifacts from a trained state, rebuild
the renderer from the artifact directory, and verify it reproduces the
training-side renderer's output."""

import os

import numpy as np
import pytest

from adanerf_tpu.config import Config
from adanerf_tpu.export import export_artifacts
from adanerf_tpu.train_state import TrainState

from scene_utils import dense_config_args, make_scene


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    scene = make_scene(str(tmp_path_factory.mktemp("scene_exp")))
    log = str(tmp_path_factory.mktemp("logs_exp"))
    # full-width nets so the viewer's reconstruction logic (posEnc-derived
    # input widths) applies; tiny images keep it fast
    args = dense_config_args(scene, log, threshold=0.2)
    args = [a if a != "4-2" else "10-4" for a in args]
    for i, a in enumerate(args):
        if a == "--layerWidth":
            args[i + 1] = "256"
        if a == "--multiDepthFeatures":
            args[i + 1] = "128"
        if a == "--rayMarchSamplingStep":
            args[i + 1] = "0.0078125"
        if a == "--layers":
            args[i + 1] = "8"
    config = Config.init(argv=args)
    ts = TrainState()
    ts.initialize(config)
    out = export_artifacts(ts, os.path.join(ts.logDir, "exported_model"),
                           aot=False)
    return scene, ts, out


def test_artifacts_present(exported):
    _, ts, out = exported
    for f in ("dataset_info.txt", "config.ini", "model0.weights",
              "model1.weights", "pos_enc.txt"):
        assert os.path.exists(os.path.join(out, f)), f


def test_viewer_reconstruction_matches(exported):
    scene, ts, out = exported
    import viewer as viewer_mod

    rt, vscene = viewer_mod.build_renderer_from_export(out, batch_size=128,
                                                       dtype_str="fp32")
    assert vscene.depth_max == ts.scene.depth_max
    np.testing.assert_allclose(vscene.view_cell_center,
                               ts.scene.view_cell_center)

    # weights round-tripped exactly
    import jax
    for a, b in zip(jax.tree.leaves(rt.params), jax.tree.leaves(ts.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the export-reconstructed renderer reproduces the training-side renderer
    from adanerf_tpu.realtime import RealtimeRenderer
    rt_train = RealtimeRenderer(ts.model_defs, ts.params, ts.scene,
                                ts.config_file, batch_size=128, dtype=None)
    dirs = ts.test_dataset.directions[:128]
    pose = ts.test_dataset.poses[0]
    rot = ts.test_dataset.rotations[0]
    img1 = rt.render_frame(pose, rot, dirs)
    img2 = rt_train.render_frame(pose, rot, dirs)
    # note: the exported depth_range is the warped range the shading net uses
    np.testing.assert_allclose(img1, img2, atol=1e-5)


def test_viewer_reconstruction_ndc_none_normalization(tmp_path_factory):
    """A stored `rayMarchNormalization = [..., None]` must reconstruct the
    explicit "None" (identity) normalization, not the MaxDepth default:
    parse_kv_file literal-evals the bare token to Python None, which
    get_normalization maps to MaxDepth (normalization.py _SWITCH) —
    regression for the NDC export path shading positions/max_depth
    (~25 dB loss) while the megakernel path treated None as identity."""
    scene = make_scene(str(tmp_path_factory.mktemp("scene_exp_ndc")))
    log = str(tmp_path_factory.mktemp("logs_exp_ndc"))
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
    out = export_artifacts(ts, os.path.join(ts.logDir, "exported_model"),
                           aot=False)

    import viewer as viewer_mod
    from adanerf_tpu.ops.normalization import normalization_none
    from adanerf_tpu.realtime import RealtimeRenderer

    rt, _ = viewer_mod.build_renderer_from_export(out, batch_size=128,
                                                  dtype_str="fp32")
    assert rt.use_ndc and rt.z_no_range
    assert rt.normalization is normalization_none

    rt_train = RealtimeRenderer(ts.model_defs, ts.params, ts.scene,
                                ts.config_file, batch_size=128, dtype=None)
    dirs = ts.test_dataset.directions[:128]
    pose = ts.test_dataset.poses[0]
    rot = ts.test_dataset.rotations[0]
    np.testing.assert_allclose(rt.render_frame(pose, rot, dirs),
                               rt_train.render_frame(pose, rot, dirs),
                               atol=1e-5)
