"""FLIP perceptual difference metric (Andersson et al., HPG 2020).

Independent jnp implementation of the algorithm the reference vendors at
``src/util/flip_loss.py`` (NVIDIA's public FLIP): opponent-space CSF
filtering, Hunt-adjusted L*a*b*, HyAB color error with redistribution, and a
Gaussian-derivative edge/point feature error that exponent-modulates the
color error. Channel-LAST (h, w, 3) images in [0, 1] sRGB; convolutions are
depthwise ``lax.conv_general_dilated`` with replicate padding.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

# D65 sRGB -> XYZ (row-major), the exact rational matrix of the sRGB spec
_A_XYZ = np.array([
    [10135552 / 24577794, 8788810 / 24577794, 4435075 / 24577794],
    [2613072 / 12288897, 8788810 / 12288897, 887015 / 12288897],
    [1425312 / 73733382, 8788810 / 73733382, 70074185 / 73733382],
], np.float64)
_A_XYZ_INV = np.linalg.inv(_A_XYZ)
_WHITE = _A_XYZ @ np.ones(3)  # reference illuminant = linrgb ones in XYZ

_QC, _QF, _PC, _PT = 0.7, 0.5, 0.4, 0.95


def default_pixels_per_degree(monitor_distance=0.7, monitor_width=0.7,
                              monitor_resolution_x=3840) -> float:
    return monitor_distance * (monitor_resolution_x / monitor_width) * (math.pi / 180)


def srgb_to_linear(c):
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c > 0.04045, ((c + 0.055) / 1.055) ** 2.4, c / 12.92)


def linear_to_xyz(c):
    return jnp.einsum('ij,hwj->hwi', jnp.asarray(_A_XYZ, jnp.float32), c)


def xyz_to_linear(c):
    return jnp.einsum('ij,hwj->hwi', jnp.asarray(_A_XYZ_INV, jnp.float32), c)


def xyz_to_ycxcz(c):
    n = c / jnp.asarray(_WHITE, jnp.float32)
    y = 116.0 * n[..., 1] - 16.0
    cx = 500.0 * (n[..., 0] - n[..., 1])
    cz = 200.0 * (n[..., 1] - n[..., 2])
    return jnp.stack([y, cx, cz], axis=-1)


def ycxcz_to_xyz(c):
    y = (c[..., 0] + 16.0) / 116.0
    x = y + c[..., 1] / 500.0
    z = y - c[..., 2] / 200.0
    return jnp.stack([x, y, z], axis=-1) * jnp.asarray(_WHITE, jnp.float32)


def xyz_to_lab(c):
    n = c / jnp.asarray(_WHITE, jnp.float32)
    delta = 6.0 / 29.0
    f = jnp.where(n > 0.00885, jnp.cbrt(n), n / (3 * delta * delta) + 4.0 / 29.0)
    l = 116.0 * f[..., 1] - 16.0
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    return jnp.stack([l, a, b], axis=-1)


def _conv2d_replicate(img, kernel):
    """Depthwise 2D convolution with replicate padding.
    img: (h, w, C); kernel: (k, k) shared across channels."""
    k = kernel.shape[0]
    r = k // 2
    x = jnp.pad(img, ((r, r), (r, r), (0, 0)), mode='edge')
    x = x.transpose(2, 0, 1)[:, None]            # (C, 1, H, W)
    w = kernel[None, None]                       # (1, 1, k, k)
    out = jax.lax.conv_general_dilated(x, w, (1, 1), 'VALID')
    return out[:, 0].transpose(1, 2, 0)


def _csf_kernel(pixels_per_degree, a1, b1, a2, b2, radius):
    delta_x = 1.0 / pixels_per_degree
    rng = np.arange(-radius, radius + 1)
    x, y = np.meshgrid(rng, rng)
    z = (x * delta_x) ** 2 + (y * delta_x) ** 2
    g = a1 * np.sqrt(np.pi / b1) * np.exp(-np.pi ** 2 * z / b1) \
        + a2 * np.sqrt(np.pi / b2) * np.exp(-np.pi ** 2 * z / b2)
    return (g / g.sum()).astype(np.float32)


def _csf_filter_bank(pixels_per_degree):
    params = {"A": (1.0, 0.0047, 0.0, 1e-5),
              "RG": (1.0, 0.0053, 0.0, 1e-5),
              "BY": (34.1, 0.04, 13.5, 0.025)}
    max_b = max(max(p[1], p[3]) for p in params.values())
    radius = int(np.ceil(3 * np.sqrt(max_b / (2 * np.pi ** 2)) * pixels_per_degree))
    return {ch: _csf_kernel(pixels_per_degree, *p, radius)
            for ch, p in params.items()}, radius


def _spatial_filter(ycxcz, kernels):
    """CSF-filter each opponent channel, then clamp in linear RGB."""
    filtered = jnp.stack([
        _conv2d_replicate(ycxcz[..., 0:1], jnp.asarray(kernels["A"]))[..., 0],
        _conv2d_replicate(ycxcz[..., 1:2], jnp.asarray(kernels["RG"]))[..., 0],
        _conv2d_replicate(ycxcz[..., 2:3], jnp.asarray(kernels["BY"]))[..., 0],
    ], axis=-1)
    lin = xyz_to_linear(ycxcz_to_xyz(filtered))
    return jnp.clip(lin, 0.0, 1.0)


def hunt_adjust(lab):
    l = lab[..., 0:1]
    return jnp.concatenate([l, 0.01 * l * lab[..., 1:3]], axis=-1)


def hyab(a, b):
    d = a - b
    return jnp.abs(d[..., 0]) + jnp.linalg.norm(d[..., 1:3], axis=-1)


def _redistribute(p, cmax, pc=_PC, pt=_PT):
    pccmax = pc * cmax
    return jnp.where(p < pccmax, (pt / pccmax) * p,
                     pt + ((p - pccmax) / (cmax - pccmax)) * (1.0 - pt))


def _feature_kernels(pixels_per_degree):
    w = 0.082
    sd = 0.5 * w * pixels_per_degree
    radius = int(np.ceil(3 * sd))
    rng = np.arange(-radius, radius + 1)
    x, y = np.meshgrid(rng, rng)
    g = np.exp(-(x ** 2 + y ** 2) / (2 * sd * sd))

    def normalize(gx):
        neg = -gx[gx < 0].sum()
        pos = gx[gx > 0].sum()
        return np.where(gx < 0, gx / neg, gx / pos).astype(np.float32)

    edge = normalize(-x * g)
    point = normalize((x ** 2 / (sd * sd) - 1) * g)
    return edge, point


def _feature_mag(y_img, kernel):
    kx = jnp.asarray(kernel)
    fx = _conv2d_replicate(y_img[..., None], kx)[..., 0]
    fy = _conv2d_replicate(y_img[..., None], kx.T)[..., 0]
    return jnp.sqrt(fx ** 2 + fy ** 2)


def flip_error_map(reference, test, pixels_per_degree=None):
    """Per-pixel FLIP error in [0,1]. reference/test: (h, w, 3) sRGB [0,1]."""
    if pixels_per_degree is None:
        pixels_per_degree = default_pixels_per_degree()
    reference = jnp.asarray(reference, jnp.float32)
    test = jnp.asarray(test, jnp.float32)

    ref_yc = xyz_to_ycxcz(linear_to_xyz(srgb_to_linear(reference)))
    test_yc = xyz_to_ycxcz(linear_to_xyz(srgb_to_linear(test)))

    kernels, _ = _csf_filter_bank(pixels_per_degree)
    ref_f = hunt_adjust(xyz_to_lab(linear_to_xyz(_spatial_filter(ref_yc, kernels))))
    test_f = hunt_adjust(xyz_to_lab(linear_to_xyz(_spatial_filter(test_yc, kernels))))

    delta_hyab = hyab(ref_f, test_f) ** _QC
    green = hunt_adjust(xyz_to_lab(linear_to_xyz(
        jnp.asarray([[[0.0, 1.0, 0.0]]], jnp.float32))))
    blue = hunt_adjust(xyz_to_lab(linear_to_xyz(
        jnp.asarray([[[0.0, 0.0, 1.0]]], jnp.float32))))
    cmax = float(hyab(green, blue)[0, 0]) ** _QC
    delta_c = _redistribute(delta_hyab, cmax)

    ref_y = (ref_yc[..., 0] + 16.0) / 116.0
    test_y = (test_yc[..., 0] + 16.0) / 116.0
    edge_k, point_k = _feature_kernels(pixels_per_degree)
    delta_f = jnp.maximum(
        jnp.abs(_feature_mag(ref_y, edge_k) - _feature_mag(test_y, edge_k)),
        jnp.abs(_feature_mag(test_y, point_k) - _feature_mag(ref_y, point_k)))
    delta_f = jnp.clip(((1.0 / math.sqrt(2.0)) * delta_f) ** _QF, 0.0, 1.0)

    return delta_c ** (1.0 - delta_f)


def flip_value(reference, test, pixels_per_degree=None) -> float:
    return float(jnp.mean(flip_error_map(reference, test, pixels_per_degree)))
