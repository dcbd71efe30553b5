"""Low-discrepancy pixel sampling.

Reference semantics: ``src/sampled_sequence.py`` — the Martin Roberts
R-sequence ``val_i = (seed + alpha * (i+1)) mod 1``. The reference
pregenerates 30M values and caches them in a ``.tar``; here the sequence is
evaluated analytically for any index window (identical values, no 30M cache,
no disk state). ``get_discrete_tensor_subset`` keeps the reference's
``floor(val * range * 0.99999)`` discretization so pixel picks match exactly.
"""

from __future__ import annotations

import numpy as np


def phi(d: int) -> float:
    x = 2.0
    for _ in range(10):
        x = pow(1 + x, 1 / (d + 1))
    return x


class RSequence:
    """PreGeneratedRSequenceGenerator equivalent (sampled_sequence.py:67-151)."""
    name = "PreGeneratedRSequenceGenerator"

    def __init__(self, dims=2, seed=0.5, num_pregeneration=30_000_000, **_):
        self.dims = dims
        self.seed = seed
        self.num_pregeneration = num_pregeneration
        g = phi(dims)
        self.alpha = np.array([pow(1 / g, j + 1) % 1 for j in range(dims)])
        self.offset_start = 0

    def _values(self, start: int, count: int) -> np.ndarray:
        idx = np.arange(start, start + count, dtype=np.float64)[:, None]
        return (self.seed + self.alpha[None, :] * (idx + 1)) % 1.0

    def _discrete_native(self, start, count, minv, maxv):
        """Native C evaluation (native/disc_depth.c r_sequence_discrete)."""
        import ctypes

        from ..native.disc_depth import _load_lib
        lib = _load_lib()
        if lib is None or not hasattr(lib, "r_sequence_discrete"):
            return None
        alpha = np.ascontiguousarray(self.alpha, np.float64)
        minv_a = np.ascontiguousarray(np.broadcast_to(minv, (self.dims,)), np.int64)
        maxv_a = np.ascontiguousarray(np.broadcast_to(maxv, (self.dims,)), np.int64)
        out = np.empty((count, self.dims), np.int64)
        lib.r_sequence_discrete(
            ctypes.c_double(self.seed),
            alpha.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_int(self.dims), ctypes.c_int64(start),
            ctypes.c_int64(count),
            minv_a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            maxv_a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return out

    def get_discrete_subset(self, num_elements: int, minv=0, maxv=(400, 400)):
        """Next window of the sequence discretized into [minv, maxv) ints,
        wrapping at num_pregeneration like the reference's cache."""
        offset_end = self.offset_start + num_elements
        if offset_end > self.num_pregeneration:
            offset_end = num_elements
            self.offset_start = 0
        if type(self) is RSequence:
            native = self._discrete_native(self.offset_start, num_elements,
                                           np.asarray(minv), np.asarray(maxv))
            if native is not None:
                self.offset_start = offset_end
                return native
        vals = self._values(self.offset_start, num_elements).astype(np.float32)
        self.offset_start = offset_end
        value_range = np.asarray(maxv) - np.asarray(minv)
        return (np.floor(vals * value_range * 0.99999)).astype(np.int64) + np.asarray(minv)

    def set_offset(self, offset: int):
        self.offset_start = offset

    def pixel_indices(self, num: int, h: int, w: int) -> np.ndarray:
        """(num,) flat pixel indices: idx = y + h * x (datasets.py:346-356
        keeps this y + h*x convention)."""
        px = self.get_discrete_subset(num, 0, (h, w))
        return px[:, 0] + h * px[:, 1]


class UniformSequence(RSequence):
    """PreGeneratedUniformRandomSequenceGenerator equivalent
    (sampled_sequence.py:153-177)."""
    name = "PreGeneratedUniformRandomSequenceGenerator"

    def __init__(self, dims=2, seed=0, num_pregeneration=30_000_000, **_):
        self.dims = dims
        self.num_pregeneration = num_pregeneration
        self.rng = np.random.default_rng(seed if isinstance(seed, int) else 0)
        self.pregen = self.rng.random((num_pregeneration, dims), dtype=np.float32)
        self.offset_start = 0

    def _values(self, start, count):
        return self.pregen[start:start + count]


def get_sequence_generator(name: str, **kwargs):
    if name == "PreGeneratedRSequenceGenerator":
        return RSequence(**kwargs)
    if name == "PreGeneratedUniformRandomSequenceGenerator":
        # the uniform generator would eagerly allocate 30M values; cap unless
        # explicitly requested
        kwargs.setdefault("num_pregeneration", 1_000_000)
        return UniformSequence(**kwargs)
    raise ValueError(f"Unknown sample generator {name}")
