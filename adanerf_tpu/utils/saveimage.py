"""Image output helpers (reference: src/util/saveimage.py:13-56):
single-channel tiling, multi-depth top-3-argmax visualization, clipping."""

from __future__ import annotations

import numpy as np


def transform_img(img, dim):
    """Normalize an arbitrary network output into an (h, w, 3) image."""
    img = np.asarray(img, dtype=np.float32)

    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)

    if img.shape[-1] < 3:
        new_shape = list(img.shape)
        new_shape[-1] = 3
        new_img = np.zeros(new_shape, np.float32)
        for i in range(min(3, img.shape[-1])):
            new_img[..., i] = img[..., i]
        img = new_img

    if img.shape[-1] == dim.h * dim.w:
        maxim = img.max() + 1
        step = 1.0 / maxim
        img = 0.5 * step + img * step
        img = np.repeat(img[:, np.newaxis], 3, axis=1)

    # multi-depth (oracle bins) to a top-3-argmax RGB visualization
    if img.shape[-1] > 4:
        step = 1.0 / img.shape[-1]
        ids = np.argsort(img)[..., -3:]
        r = range(dim.h * dim.w)
        new_img = np.zeros((dim.h * dim.w, 3), np.float32)
        min_val = np.amin(img)
        for i in range(3):
            mask = img[r, ids[:, i]] > min_val
            new_img[mask, i] = 0.5 * step + ids[mask, i] * step
        img = new_img

    return np.clip(img.reshape(dim.h, dim.w, -1)[:, :, :3], 0.0, 1.0)


def save_img(img, dim, path, transform=True):
    if path is None:
        return
    if transform:
        img = transform_img(img, dim)
    from matplotlib import pyplot as plt
    plt.imsave(path, np.asarray(img))
