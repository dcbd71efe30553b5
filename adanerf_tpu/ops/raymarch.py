"""Volume rendering core: alpha compositing, NDC warp, inverse-CDF sampling,
ray helpers (rotation, ray-sphere offset).

Reference semantics: ``src/nerf_raymarch_common.py:19-192`` and the ray-sphere
offset from ``src/features.py:768-791``. Everything here is a pure jnp
function with static shapes; the masked adaptive compositing reproduces the
reference's flatten/gather/scatter-restore path (``adaptive_raw2outputs``,
nerf_raymarch_common.py:91-144) without any dynamic shapes: invalid sample
slots carry zeroed contributions, which is numerically identical to the
reference's zero-filled ``restored`` buffer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def raw2alpha(raw_sigma: jnp.ndarray, dists: jnp.ndarray) -> jnp.ndarray:
    """1 - exp(-relu(sigma) * dist) (nerf_raymarch_common.py:33)."""
    return 1.0 - jnp.exp(-jax.nn.relu(raw_sigma) * dists)


def _composite_weights(alpha: jnp.ndarray) -> jnp.ndarray:
    """w_i = a_i * prod_{j<i} (1 - a_j + 1e-10) (nerf_raymarch_common.py:52)."""
    ones = jnp.ones_like(alpha[..., :1])
    trans = jnp.cumprod(jnp.concatenate([ones, 1.0 - alpha + 1e-10], axis=-1), axis=-1)[..., :-1]
    return alpha * trans


def nerf_raw2outputs(raw, z_vals, rays_d, raw_noise_std=0.0, white_bkgd=False,
                     depth=None, accumulation_mult=None, noise_key=None):
    """Classic NeRF compositing (nerf_raymarch_common.py:19-68).

    raw: (rays, S, 4) network output; z_vals: (rays, S); rays_d: (rays, 3).
    ``depth``/``accumulation_mult`` implement AdaNeRF's oracle-density
    premultiply (alpha *= oracle) used in dense training.
    Returns (rgb_map, disp_map, acc_map, weights, depth_map, alpha).
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate([dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1)
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    rgb = jax.nn.sigmoid(raw[..., :3])
    sigma = raw[..., 3]
    if raw_noise_std > 0.0 and noise_key is not None:
        sigma = sigma + jax.random.normal(noise_key, sigma.shape) * raw_noise_std

    alpha = raw2alpha(sigma, dists)
    if depth is not None and accumulation_mult == "alpha":
        alpha = alpha * depth

    weights = _composite_weights(alpha)
    if depth is not None and accumulation_mult == "weights":
        weights = weights * depth

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / acc_map)

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
    return rgb_map, disp_map, acc_map, weights, depth_map, alpha


def adaptive_raw2outputs_masked(raw, z_vals, mask, depth=None,
                                accumulation_mult=None, white_bkgd=False):
    """AdaNeRF adaptive compositing, fixed-shape masked form.

    Reference (nerf_raymarch_common.py:91-144) flattens surviving samples and
    scatter-restores them into a zero buffer before compositing; here the
    (rays, S) layout never leaves its static shape and invalid slots are
    zeroed, which is bit-equivalent: sigmoid outputs of dead slots never enter
    the buffer, so alpha == 0 and rgb == 0 there.

    raw: (rays, S, 4) raw outputs at ALL slots; z_vals: (rays, S) (may hold
    inf at dead slots); mask: (rays, S) bool validity; depth: (rays, S)
    oracle probabilities (z_probs) for the 'alpha' premultiply.
    Returns (rgb_map, disp_map, acc_map, weights, depth_map, alpha).
    """
    m = mask.astype(raw.dtype)
    sigmoided = jax.nn.sigmoid(raw) * m[..., None]
    z_restored = jnp.where(mask, z_vals, 0.0)

    alpha = sigmoided[..., 3]
    rgb = sigmoided[..., :3]

    if depth is not None and accumulation_mult == "alpha":
        alpha = alpha * depth

    weights = _composite_weights(alpha)
    if depth is not None and accumulation_mult == "weights":
        weights = weights * depth

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_restored, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / acc_map)

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
    return rgb_map, disp_map, acc_map, weights, depth_map, alpha


def ndc_rays(H, W, focal, near, rays_o, rays_d):
    """Shift origins to the near plane and project into NDC
    (nerf_raymarch_common.py:71-88)."""
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (W / (2.0 * focal)) * (rays_d[..., 0] / rays_d[..., 2]
                                       - rays_o[..., 0] / rays_o[..., 2])
    d1 = -1.0 / (H / (2.0 * focal)) * (rays_d[..., 1] / rays_d[..., 2]
                                       - rays_o[..., 1] / rays_o[..., 2])
    d2 = -2.0 * near / rays_o[..., 2]

    return jnp.stack([o0, o1, o2], axis=-1), jnp.stack([d0, d1, d2], axis=-1)


def sample_pdf(bins, weights, n_samples, det=False, key=None):
    """Inverse-CDF hierarchical sampling (nerf_raymarch_common.py:160-192).

    bins: (rays, B+1) bin edges; weights: (rays, B); returns (rays, n_samples).
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)

    if det or key is None:
        u = jnp.linspace(0.0, 1.0, n_samples)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,))

    # searchsorted right over the per-ray cdf
    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, below, axis=-1)
    bins_above = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def rotate_ray_dirs(rotations: jnp.ndarray, directions: jnp.ndarray) -> jnp.ndarray:
    """Camera-space dirs -> world-space dirs (nerf_raymarch_common.py:147-152).

    rotations: (n_img, 3, 3); directions: (n_img, n_rays, 3);
    returns (n_img * n_rays, 3).
    """
    rd = jnp.einsum('bij,bnj->bni', rotations, directions)
    return rd.reshape(-1, 3)


def ray_sphere_offset(dirs, origins, center, radius):
    """Distance along each ray to its exit from the view-cell sphere
    (features.py:768-791 ``SpherePosDir.compute_ray_offset``).

    dirs: (N, 3) unit dirs; origins: (N, 3); center: (3,); radius: scalar.
    Returns (N,) distances (the '+sqrt(delta)' root, clamped >= 0 inside).
    """
    omc = origins - center
    u_dot = jnp.sum(omc * dirs, axis=-1)
    delta = u_dot ** 2 - (jnp.sum(omc ** 2, axis=-1) - radius ** 2)
    return -u_dot + jnp.sqrt(jnp.clip(delta, min=0.0))
