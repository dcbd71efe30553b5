"""Windowed discretized-depth features — the TPU-native equivalent of the
reference's ``disc_depth_multiclass`` CUDA torch extension
(src/native/disc_depth_multiclass_cuda.cu:40-272).

For each sampled pixel, scan a window_size^2 neighborhood of the depth map,
discretize each neighbor's depth into ``n_feat`` bins and keep the maximum
distance weight per bin (the CUDA kernel's float atomicMax scatter).

This runs on the HOST during target assembly (the reference also runs it at
batch-build time), so the native implementation is a C shared library
(disc_depth.c) loaded via ctypes, with a vectorized numpy fallback mirroring
the reference's PyTorch fallback (features.py:199-221).
"""

from __future__ import annotations

import ctypes
import math
import os

import numpy as np

_LIB = None
_LIB_TRIED = False


def _load_lib():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = os.path.join(os.path.dirname(__file__), "libadanerf_native.so")
    if os.path.exists(path):
        try:
            lib = ctypes.CDLL(path)
            lib.disc_depth_features.argtypes = [
                ctypes.POINTER(ctypes.c_float),   # depth map (h*w)
                ctypes.POINTER(ctypes.c_int64),   # sample indices (n)
                ctypes.POINTER(ctypes.c_float),   # out features (n, n_feat)
                ctypes.c_int, ctypes.c_int,       # h, w
                ctypes.c_int,                     # n samples
                ctypes.c_int,                     # window_size
                ctypes.c_int,                     # n_feat
                ctypes.c_float,                   # ignore value
            ]
            lib.r_sequence_discrete.argtypes = [
                ctypes.c_double,                  # seed
                ctypes.POINTER(ctypes.c_double),  # alpha (dims)
                ctypes.c_int,                     # dims
                ctypes.c_int64, ctypes.c_int64,   # start, count
                ctypes.POINTER(ctypes.c_int64),   # minv (dims)
                ctypes.POINTER(ctypes.c_int64),   # maxv (dims)
                ctypes.POINTER(ctypes.c_int64),   # out (count, dims)
            ]
            _LIB = lib
        except OSError:
            _LIB = None
    return _LIB


def disc_depth_features_numpy(depth_map: np.ndarray, sample_indices: np.ndarray,
                              window_size: int, n_feat: int,
                              ignore_value: float) -> np.ndarray:
    """Vectorized numpy fallback (reference fallback: features.py:199-221)."""
    h, w = depth_map.shape
    n = sample_indices.shape[0]
    step = 1.0 / n_feat
    center = window_size // 2
    feats = np.zeros((n, n_feat), np.float32)
    if window_size == 1:
        sel = depth_map.reshape(-1)[sample_indices]
        mask = sel < ignore_value
        disc = np.minimum((sel[mask] / step).astype(np.int64), n_feat - 1)
        feats[np.nonzero(mask)[0], disc] = 1.0
        return feats

    cx = sample_indices % w
    cy = sample_indices // w
    max_dist = (window_size // 2 + 1) * math.sqrt(2.0)
    for i in range(window_size):
        for j in range(window_size):
            weight = 1.0 - math.sqrt((i - center) ** 2 + (j - center) ** 2) / max_dist
            x = np.clip(cx - center + i, 0, w - 1)
            y = np.clip(cy - center + j, 0, h - 1)
            val = depth_map[y, x]
            disc = (val / step).astype(np.int64)
            mask = (val < ignore_value) & (disc >= 0)
            rows = np.nonzero(mask)[0]
            cols = np.minimum(disc[mask], n_feat - 1)
            np.maximum.at(feats, (rows, cols), weight)
    return feats


def disc_depth_features(depth_map: np.ndarray, sample_indices: np.ndarray,
                        window_size: int, n_feat: int,
                        ignore_value: float) -> np.ndarray:
    """Native C path when built, numpy otherwise."""
    lib = _load_lib()
    depth_map = np.ascontiguousarray(depth_map, np.float32)
    sample_indices = np.ascontiguousarray(sample_indices, np.int64)
    if lib is not None:
        h, w = depth_map.shape
        n = sample_indices.shape[0]
        out = np.zeros((n, n_feat), np.float32)
        lib.disc_depth_features(
            depth_map.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            sample_indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            h, w, n, window_size, n_feat, ignore_value)
        return out
    return disc_depth_features_numpy(depth_map, sample_indices, window_size,
                                     n_feat, ignore_value)
