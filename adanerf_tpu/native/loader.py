"""ctypes wrapper for the native dataset loader (dataloader.cpp)."""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

from .disc_depth import _load_lib

_DECL = False


def _lib():
    global _DECL
    lib = _load_lib()
    if lib is None or not hasattr(lib, "load_images_parallel"):
        return None
    if not _DECL:
        lib.load_images_parallel.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int]
        lib.load_images_parallel.restype = ctypes.c_int
        lib.gather_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int, ctypes.c_int, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
        _DECL = True
    return lib


def load_images_parallel(paths: List[str], h: int, w: int, scale: int = 1,
                         n_threads: int = 0) -> Optional[np.ndarray]:
    """Decode PNGs into (N, h, w, 3) float32 [0,1] with a native thread pool.
    Returns None (caller falls back to imageio) if the library is missing or
    any decode fails."""
    lib = _lib()
    if lib is None:
        return None
    n = len(paths)
    out = np.zeros((n, h, w, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.load_images_parallel(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h, w, scale, n_threads)
    if failures:
        return None
    return out


def gather_batch(images: np.ndarray, dirs: np.ndarray,
                 image_indices: np.ndarray, pix: np.ndarray):
    """Native batched pixel gather: images (N, h*w, 3) f32 contiguous,
    dirs (h*w, 3), image_indices (k,), pix (k, samples) ->
    (colors (k, samples, 3), dirs (k, samples, 3)). None if unavailable."""
    lib = _lib()
    if lib is None:
        return None
    k, samples = pix.shape
    colors = np.empty((k, samples, 3), np.float32)
    out_dirs = np.empty((k, samples, 3), np.float32)
    lib.gather_batch(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dirs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        np.ascontiguousarray(image_indices, np.int64).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int64)),
        np.ascontiguousarray(pix, np.int64).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int64)),
        k, samples, images.shape[1],
        colors.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_dirs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return colors, out_dirs
