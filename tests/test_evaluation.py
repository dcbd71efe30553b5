"""Metric sanity tests: FLIP and IW-SSIM behave like perceptual metrics
(0/1 at identity, monotone under increasing distortion) and the comparison
aggregator round-trips the CSV format."""

import os

import numpy as np
import pytest

from adanerf_tpu.evaluation.flip import flip_value
from adanerf_tpu.evaluation.iw_ssim import iw_ssim, rgb_to_gray255
from adanerf_tpu.evaluation.metrics import mse, psnr


def _test_image(h=64, w=64, seed=0):
    rng = np.random.RandomState(seed)
    y, x = np.mgrid[0:h, 0:w] / max(h, w)
    img = np.stack([0.5 + 0.4 * np.sin(6 * x),
                    0.5 + 0.4 * np.cos(5 * y),
                    0.4 + 0.3 * np.sin(4 * (x + y))], axis=-1)
    img += rng.rand(h, w, 3) * 0.05
    return np.clip(img, 0, 1).astype(np.float32)


class TestPSNR:
    def test_identity_and_known(self):
        img = _test_image()
        assert psnr(img, img) == float("inf")
        noisy = np.clip(img + 0.1, 0, 1)
        m = mse(img, noisy)
        assert abs(psnr(img, noisy) - 10 * np.log10(1 / m)) < 1e-9


class TestFLIP:
    def test_identity_near_zero(self):
        img = _test_image()
        assert flip_value(img, img) < 1e-4

    def test_monotone_in_distortion(self):
        img = _test_image()
        rng = np.random.RandomState(1)
        noise = rng.randn(*img.shape).astype(np.float32)
        small = np.clip(img + 0.03 * noise, 0, 1)
        large = np.clip(img + 0.2 * noise, 0, 1)
        v_small = flip_value(img, small)
        v_large = flip_value(img, large)
        assert 0 < v_small < v_large < 1

    def test_range(self):
        img = _test_image()
        inverted = 1.0 - img
        v = flip_value(img, inverted)
        assert 0 < v <= 1


class TestIWSSIM:
    def test_identity_is_one(self):
        img = rgb_to_gray255(_test_image(96, 96))
        assert abs(iw_ssim(img, img) - 1.0) < 1e-6

    def test_monotone_in_distortion(self):
        img = rgb_to_gray255(_test_image(96, 96))
        rng = np.random.RandomState(2)
        noise = rng.randn(*img.shape)
        v1 = iw_ssim(img, img + 5 * noise)
        v2 = iw_ssim(img, img + 40 * noise)
        assert v2 < v1 < 1.0
        assert v2 > 0.0


class TestComparison:
    def test_csv_roundtrip(self, tmp_path):
        import comparison as cmp
        exp = tmp_path / "lo_16_LSfCDA_(0.15)_whatever"
        exp.mkdir()
        (exp / "network_description.txt").write_text("123456 total params\n")
        (exp / "complexity.txt").write_text("0 - 1e9 - 100.0\n123.5 : 45.25\n")
        (exp / "opt.txt").write_text("Optimal validation loss 0.002 at epoch 250000")
        (exp / "image_quality_images.csv").write_text(
            "mse,psnr,ssim,flip,samples,sparsity\r"
            "0.001,30.0,0.95,0.05,3.2,-1.0\r"
            "0.003,28.0,0.93,0.07,3.8,-1.0\r")
        r = cmp.ExperimentResults(str(exp))
        assert r.completed
        assert r.thresholds == "0.15"
        assert r.params == "123456"
        assert r.epoch == "250000"
        assert abs(r.ims["psnr"][0] - 29.0) < 1e-9
        assert r.flops == 123.5 * 2

        lines = list(cmp.csv_lines([r]))
        assert "0.15" in lines[1] and "123456" in lines[1]
