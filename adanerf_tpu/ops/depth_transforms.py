"""Depth warps between normalized [0,1] depth and world-space depth.

Reference semantics: ``src/util/depth_transformations.py:13-68``. The log
transform compresses far depth logarithmically; ``depth_range`` is a
``(min, max)`` pair. All functions are pure (no in-place mutation) and work
on jnp or numpy arrays.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def _mod(x):
    """Pick the array module matching the input (numpy for np arrays/scalars)."""
    return np if isinstance(x, (np.ndarray, float, int, np.floating)) else jnp


class LogTransform:
    name = "log"

    @classmethod
    def from_world(cls, depth, depth_range):
        m = _mod(depth)
        min_d, max_d = depth_range[0], depth_range[1]
        max_v = max_d - min_d
        d = depth - min_d
        d = m.where(d <= 0, 0.001, d)
        return m.log(d + 1.0) / math.log(max_v + 1.0)

    @classmethod
    def to_world(cls, depth, depth_range):
        min_d, max_d = depth_range[0], depth_range[1]
        max_v = max_d - min_d
        return (max_v + 1.0) ** depth - 1.0 + min_d


class LinearTransform:
    name = "linear"

    @classmethod
    def from_world(cls, depth, depth_range):
        return (depth - depth_range[0]) / (depth_range[1] - depth_range[0])

    @classmethod
    def to_world(cls, depth, depth_range):
        return depth * (depth_range[1] - depth_range[0]) + depth_range[0]


class NoneTransform:
    name = "none"

    @classmethod
    def from_world(cls, depth, depth_range):
        return depth

    @classmethod
    def to_world(cls, depth, depth_range):
        return depth


def get_depth_transform(name: str):
    """Config string -> transform class (reference: src/datasets.py:202-213)."""
    if name == "log":
        return LogTransform
    if name == "linear":
        return LinearTransform
    return NoneTransform
