"""LLFF loading + conversion tests on a synthetic poses_bounds scene."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_llff_scene(d, n=10, h=32, w=40, focal=30.0):
    import imageio.v2 as imageio
    os.makedirs(os.path.join(d, "images"), exist_ok=True)
    rng = np.random.RandomState(0)
    poses = np.zeros((n, 3, 5), np.float64)
    for i in range(n):
        # forward-facing cameras near z=4 looking at the origin-ish
        c = np.array([0.2 * np.sin(i), 0.1 * np.cos(i), 4.0 + 0.05 * i])
        z = c / np.linalg.norm(c)
        up = np.array([0.0, 1.0, 0.0])
        x = np.cross(up, z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        # llff disk layout: [down right back] columns
        m = np.stack([-y, x, z, c], axis=1)
        poses[i, :, :4] = m
        poses[i, :, 4] = [h, w, focal]
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        imageio.imwrite(os.path.join(d, "images", f"{i:03d}.png"), img)
    bds = np.stack([np.full(n, 2.0), np.full(n, 8.0)], axis=1)
    arr = np.concatenate([poses.reshape(n, -1), bds], axis=1)
    np.save(os.path.join(d, "poses_bounds.npy"), arr)
    return d


def test_load_llff_data(tmp_path):
    from adanerf_tpu.data.llff import load_llff_data
    d = make_llff_scene(str(tmp_path))
    images, poses, bds, render_poses, i_test = load_llff_data(
        str(d), factor=1, recenter=True, bd_factor=0.75)
    assert images.shape == (10, 32, 40, 3)
    assert poses.shape == (10, 3, 5)
    assert render_poses.shape[0] == 120
    assert 0 <= i_test < 10
    # recentred: mean position near origin
    assert np.abs(poses[:, :3, 3].mean(0)).max() < 0.5
    # bd rescale: min(bds)*bd_factor == 1
    assert np.isclose(bds.min() * 0.75, 1.0, atol=1e-6)


def test_convert_llff_end_to_end(tmp_path):
    d = make_llff_scene(str(tmp_path))
    r = subprocess.run([sys.executable, os.path.join(REPO, "convert_llff.py"),
                        "-dir", str(d), "-factor", "1"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr

    info = json.load(open(os.path.join(d, "dataset_info.json")))
    for k in ("camera_angle_x", "view_cell_center", "view_cell_size",
              "resolution", "depth_range", "depth_range_warped_log"):
        assert k in info
    assert os.path.exists(os.path.join(d, "cam_path_spiral.json"))
    for s in ("train", "val", "test"):
        t = json.load(open(os.path.join(d, f"transforms_{s}.json")))
        assert len(t["frames"]) > 0
        first = t["frames"][0]["file_path"]
        assert os.path.exists(os.path.join(d, first[2:] + ".png"))

    # the converted scene loads through the standard data layer
    from adanerf_tpu.config import Config
    from adanerf_tpu.data.dataset import DatasetInfo, ViewCellDataset
    cfg = Config.init(argv=[
        "-data", str(d), "-log", str(tmp_path / "logs"),
        "--depthTransform", "linear", "--scale", "1", "--useNDC",
        "--inFeatures", "SpherePosDir", "--inFeatures", "RayMarchFromPoses",
        "--outFeatures", "RawSigmoid", "--outFeatures", "RGBARayMarch"])
    di = DatasetInfo(cfg)
    ds = ViewCellDataset(cfg, di, "test", 64)
    assert ds.color_images.shape[1:] == (32, 40, 3)


def test_nex_variant(tmp_path):
    from adanerf_tpu.data.llff import load_llff_data_nex
    d = make_llff_scene(str(tmp_path))
    np.save(os.path.join(d, "hwf_cxcy.npy"),
            np.array([32.0, 40.0, 30.0, 20.0, 16.0]))
    images, poses, bds, rp, i_test, intrinsic = load_llff_data_nex(
        str(d), factor=1)
    assert intrinsic.shape[0] == 5
    np.testing.assert_allclose(intrinsic[:3], [32, 40, 30])
