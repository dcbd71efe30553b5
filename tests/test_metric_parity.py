"""Numerical cross-validation of the evaluation metrics against the ACTUAL
reference implementations (read-only import, torch CPU; VERDICT r2 missing
#5): FLIP vs /root/reference/src/util/flip_loss.py and IW-SSIM vs
/root/reference/src/util/IW_SSIM_PyTorch.py.

The reference IW-SSIM needs pyrtools only for the Laplacian-pyramid front
end (IW_SSIM_PyTorch.py:91-92); pyrtools is absent here, so the test injects
a minimal stand-in backed by our own Burt-Adelson pyramid and feeds BOTH
implementations the same bands — this cross-validates the entire metric
downstream (per-scale CS/luminance maps, GSM information weights, exponent
combination) while holding the one intentionally-replaced component fixed.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_UTIL = "/root/reference/src/util"
if not os.path.isdir(REF_UTIL):
    pytest.skip("reference not available", allow_module_level=True)

sys.path.insert(0, os.path.dirname(REF_UTIL))

from adanerf_tpu.evaluation.flip import flip_error_map, flip_value   # noqa: E402
from adanerf_tpu.evaluation.iw_ssim import iw_ssim, laplacian_pyramid  # noqa: E402


def _smooth_images(seed, h, w, c=3):
    """Band-limited random image pair in [0,1] (pure noise is outside both
    metrics' operating range; renders are smooth-ish)."""
    rng = np.random.default_rng(seed)
    import cv2
    a = rng.random((h, w, c)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.standard_normal((h, w, c)).astype(np.float32),
                0, 1)
    a = cv2.GaussianBlur(a, (0, 0), 2.0).reshape(h, w, c)
    b = cv2.GaussianBlur(b, (0, 0), 2.0).reshape(h, w, c)
    return np.clip(a, 0, 1), np.clip(b, 0, 1)


# ---------------------------------------------------------------------------
# CPU shims: the reference hard-codes .cuda() tensors (flip_loss.py:152-277)
# and the long-removed torch.eig (IW_SSIM_PyTorch.py:222) — run its exact
# logic on CPU / modern torch without editing the read-only tree.


class _TorchCPUProxy:
    """Module-global stand-in for `torch` inside the reference modules:
    drops device='cuda' from factory calls, provides old-format eig."""

    def __getattr__(self, name):
        return getattr(torch, name)

    @staticmethod
    def zeros(*args, device=None, **kwargs):
        return torch.zeros(*args, **kwargs)

    @staticmethod
    def eig(a, eigenvectors=False):
        w, v = torch.linalg.eig(a)
        return torch.stack([w.real, w.imag], dim=1), v.real


@pytest.fixture()
def ref_cpu(monkeypatch):
    import util.flip_loss as flip_mod
    monkeypatch.setattr(flip_mod, "torch", _TorchCPUProxy())
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    _install_pyrtools_stub()
    import util.IW_SSIM_PyTorch as iw_mod
    monkeypatch.setattr(iw_mod, "torch", _TorchCPUProxy())
    return flip_mod, iw_mod


# ---------------------------------------------------------------------------
# FLIP


def _ref_flip(reference, test):
    from util.flip_loss import FLIP
    model = FLIP()
    ref_t = torch.from_numpy(
        np.ascontiguousarray(reference.transpose(2, 0, 1))[None])
    test_t = torch.from_numpy(
        np.ascontiguousarray(test.transpose(2, 0, 1))[None])
    err = model.compute_flip(ref_t, test_t, model.pixels_per_degree)
    return np.asarray(err.squeeze().numpy())


@pytest.mark.parametrize("seed", [0, 1])
def test_flip_matches_reference(seed, ref_cpu):
    ref_img, test_img = _smooth_images(seed, 96, 128)
    ours = np.asarray(flip_error_map(ref_img, test_img))
    theirs = _ref_flip(ref_img, test_img)
    assert ours.shape == theirs.shape
    # identical algorithm, different conv/colour plumbing (jnp channel-last
    # vs torch NCHW) — demand agreement far below perceptual resolution
    assert abs(float(ours.mean()) - float(theirs.mean())) < 1e-3
    assert np.abs(ours - theirs).max() < 5e-3


def test_flip_identical_images_zero_both(ref_cpu):
    img, _ = _smooth_images(2, 64, 64)
    assert flip_value(img, img) < 1e-6
    assert _ref_flip(img, img).mean() < 1e-6


# ---------------------------------------------------------------------------
# IW-SSIM


def _install_pyrtools_stub():
    """pyrtools stand-in exposing exactly what IW_SSIM_PyTorch.py uses:
    pt.pyramids.LaplacianPyramid(img, height=5).pyr_coeffs[(k, 0)]."""
    if "pyrtools" in sys.modules and not getattr(sys.modules["pyrtools"],
                                                 "_adanerf_stub", False):
        return  # real pyrtools present: use it

    class _LapPyr:
        def __init__(self, image, height=5):
            bands = laplacian_pyramid(np.asarray(image, np.float64), height)
            self.pyr_coeffs = {(k, 0): b for k, b in enumerate(bands)}

    pyramids = types.ModuleType("pyrtools.pyramids")
    pyramids.LaplacianPyramid = _LapPyr
    stub = types.ModuleType("pyrtools")
    stub.pyramids = pyramids
    stub._adanerf_stub = True
    sys.modules["pyrtools"] = stub
    sys.modules["pyrtools.pyramids"] = pyramids


@pytest.mark.parametrize("seed", [3, 4])
def test_iw_ssim_matches_reference(seed, ref_cpu):
    IW_SSIM = ref_cpu[1].IW_SSIM

    a, b = _smooth_images(seed, 192, 192, c=1)
    imgo = (a[..., 0] * 255.0).astype(np.float64)
    imgd = (b[..., 0] * 255.0).astype(np.float64)

    theirs = float(IW_SSIM(use_double=True).test(imgo, imgd))
    ours = iw_ssim(imgo, imgd)
    assert abs(ours - theirs) < 1e-4, (ours, theirs)


def test_iw_ssim_identical_images_one(ref_cpu):
    IW_SSIM = ref_cpu[1].IW_SSIM

    a, _ = _smooth_images(5, 192, 192, c=1)
    imgo = (a[..., 0] * 255.0).astype(np.float64)
    theirs = float(IW_SSIM(use_double=True).test(imgo, imgo.copy()))
    ours = iw_ssim(imgo, imgo.copy())
    assert abs(ours - 1.0) < 1e-6
    assert abs(theirs - 1.0) < 1e-6
