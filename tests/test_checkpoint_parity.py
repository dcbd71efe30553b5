"""Reference-checkpoint ingestion: torch ``.weights`` files written exactly
the way the reference writes them (torch.save of the module state_dict,
models.py:87-88/279-281) must load into the TPU stack and produce the same
forwards and the same rendered image (0.00 dB, far inside the 0.1 dB
quality-parity bar)."""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/src"
if not os.path.isdir(REF):
    pytest.skip("reference not available", allow_module_level=True)

if "configargparse" not in sys.modules:
    stub = types.ModuleType("configargparse")

    class _P:
        pass
    stub.ArgParser = _P
    sys.modules["configargparse"] = stub

sys.path.insert(0, REF)

import jax
import jax.numpy as jnp

import models as ref_models                                # noqa: E402

from adanerf_tpu.config import Config
from adanerf_tpu.models.mlp import BaseNetDef, NeRFDef
from adanerf_tpu.train_state import TrainState, load_tree
from adanerf_tpu.utils.torch_ckpt import (convert_experiment_dir,
                                          convert_torch_checkpoint)

from scene_utils import dense_config_args, make_scene


def _ref_basenet(depth, width, n_in, n_out, skip="", seed=0):
    from types import SimpleNamespace
    torch.manual_seed(seed)
    cfg = SimpleNamespace(posEnc=None, posEncArgs=None, inFeatures=["X"])
    return ref_models.BaseNet(depth, width, skip, n_in, n_out, cfg, 0)


def _ref_nerf(depth, width, seed=1):
    from types import SimpleNamespace
    torch.manual_seed(seed)
    cfg = SimpleNamespace(posEnc=["nerf", "nerf"], posEncArgs=["10-4", "10-4"],
                          inFeatures=["SpherePosDir", "RayMarchFromPoses"])
    return ref_models.NeRF(D=depth, W=width, n_in=90, n_out=4, skips=["4"],
                           use_viewdirs=True, net_idx=1, config=cfg)


def test_convert_basenet_forward(tmp_path):
    ref = _ref_basenet(4, 64, 90, 32, skip="0::63-2:63:")
    # saved exactly like models.py:87-88
    src = str(tmp_path / f"{ref.name}_0.weights")
    torch.save(ref.state_dict(), src)

    my_def = BaseNetDef(depth=4, width=64, n_in=90, n_out=32,
                        skip="0::63-2:63:", net_idx=0)
    params = my_def.init(jax.random.PRNGKey(0))
    convert_torch_checkpoint(src)
    params = load_tree(src, params)

    x = np.random.RandomState(3).randn(16, 90).astype(np.float32)
    ref_out = ref(torch.from_numpy(x)).detach().numpy()
    my_out = np.asarray(my_def.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(my_out, ref_out, rtol=1e-4, atol=1e-5)


def test_convert_nerf_forward(tmp_path):
    ref = _ref_nerf(8, 64)
    src = str(tmp_path / f"{ref.name}_0.weights")
    torch.save(ref.state_dict(), src)

    my_def = NeRFDef(depth=8, width=64, input_ch=63, input_ch_views=27,
                     n_out=4, skips=(4,), net_idx=1)
    params = my_def.init(jax.random.PRNGKey(1))
    convert_torch_checkpoint(src)
    params = load_tree(src, params)

    x = np.random.RandomState(4).randn(16, 90).astype(np.float32)
    ref_out = ref(torch.from_numpy(x)).detach().numpy()
    my_out = np.asarray(my_def.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(my_out, ref_out, rtol=1e-4, atol=1e-5)


def test_convert_module_pickle(tmp_path):
    """The reference sometimes torch.saves the whole module, not the
    state_dict (models.py:106-112 tolerates both); so do we."""
    ref = _ref_basenet(3, 32, 30, 16)
    src = str(tmp_path / f"{ref.name}_5.weights")
    torch.save(ref, src)

    my_def = BaseNetDef(depth=3, width=32, n_in=30, n_out=16, net_idx=0)
    params = my_def.init(jax.random.PRNGKey(2))
    convert_torch_checkpoint(src)
    params = load_tree(src, params)
    x = np.random.RandomState(5).randn(8, 30).astype(np.float32)
    np.testing.assert_allclose(np.asarray(my_def.apply(params, jnp.asarray(x))),
                               ref(torch.from_numpy(x)).detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def test_reference_experiment_render_parity(tmp_path):
    """End-to-end: a reference-format experiment directory (torch .weights
    for both nets, reference model names and suffixes) is converted, picked
    up by TrainState.load_latest_weights, and renders a pose IDENTICALLY to
    the same weights synced in memory — 0.00 dB on the 0.1 dB parity bar."""
    scene = make_scene(str(tmp_path / "scene"))
    args = dense_config_args(scene, str(tmp_path / "logs"), threshold=0.2)
    config = Config.init(argv=args)
    ts = TrainState()
    ts.initialize(config)
    o_def, n_def = ts.model_defs

    # reference-side experiment dir with reference-trained(-format) weights
    ref_o = _ref_basenet(o_def.depth, o_def.width, o_def.n_in, o_def.n_out,
                         skip=o_def.skip, seed=7)
    ref_n = _ref_nerf_like(n_def, seed=8)
    ref_dir = tmp_path / "ref_experiment"
    ref_dir.mkdir()
    torch.save(ref_o.state_dict(), str(ref_dir / f"{ref_o.name}_2000.weights"))
    torch.save(ref_n.state_dict(), str(ref_dir / f"{ref_n.name}_2000.weights"))
    # our defs generate the same reference names — required for pickup
    assert o_def.name == ref_o.name and n_def.name == ref_n.name

    convert_experiment_dir(str(ref_dir), ts.logDir)
    ts.load_latest_weights()
    assert ts.epoch0 == 2001  # epoch parsed from the reference suffix

    from adanerf_tpu.render import render_rays_chunked
    pose = ts.test_dataset.poses[0]
    rot = ts.test_dataset.rotations[0]
    imgs, _ = render_rays_chunked(ts, pose, rot, chunk_size=256)
    img_converted = np.asarray(imgs[-1])

    # ground truth: same weights loaded via the in-memory sync used by the
    # (already reference-validated) forward-parity tests
    params = [_basenet_tree_from_torch(ref_o), _nerf_tree_from_torch(ref_n)]
    ts.params = [jax.tree.map(jnp.asarray, p) for p in params]
    imgs2, _ = render_rays_chunked(ts, pose, rot, chunk_size=256)
    img_synced = np.asarray(imgs2[-1])

    np.testing.assert_allclose(img_converted, img_synced, atol=0, rtol=0)


def _ref_nerf_like(n_def, seed):
    from types import SimpleNamespace
    torch.manual_seed(seed)
    cfg = SimpleNamespace(posEnc=["nerf", "nerf"], posEncArgs=["4-2", "4-2"],
                          inFeatures=["SpherePosDir", "RayMarchFromPoses"])
    return ref_models.NeRF(D=n_def.depth, W=n_def.width, n_in=90, n_out=4,
                           skips=[str(s) for s in n_def.skips],
                           use_viewdirs=True, net_idx=1, config=cfg)


def _basenet_tree_from_torch(ref):
    return [{"w": ref.layers[i].weight.detach().numpy().T,
             "b": ref.layers[i].bias.detach().numpy()}
            for i in range(len(ref.layers))]


def _nerf_tree_from_torch(ref):
    tree = {"pts": [], "views": []}
    for l in ref.pts_linears:
        tree["pts"].append({"w": l.weight.detach().numpy().T,
                            "b": l.bias.detach().numpy()})
    for l in ref.views_linears:
        tree["views"].append({"w": l.weight.detach().numpy().T,
                              "b": l.bias.detach().numpy()})
    for name, key in (("feature_linear", "feature"), ("alpha_linear", "alpha"),
                      ("rgb_linear", "rgb")):
        l = getattr(ref, name)
        tree[key] = {"w": l.weight.detach().numpy().T,
                     "b": l.bias.detach().numpy()}
    return tree
