"""Z-samplers: where along each ray the shading network is evaluated.

Functional ports of the ten sampler classes in
``src/nerf_raymarch_common.py:261-855``. Each sampler is a pure function over
static shapes; the adaptive sampler returns a fixed-width ``(z_vals, z_probs,
mask)`` triple instead of the reference's ragged flatten+gather — inactive
slots hold ``inf`` z (exactly like the reference's inf-masking at
nerf_raymarch_common.py:752) and ``mask=False``.

TPU notes: the adaptive select is a ``top_k`` over 128 oracle bins followed by
an ascending per-ray sort — both map onto cheap VPU sort networks; the result
feeds fixed-shape batched MXU matmuls (masked in training, compacted/bucketed
in inference, see ops/compaction.py).
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
import numpy as np

from .depth_transforms import LinearTransform, LogTransform
from .raymarch import sample_pdf

INF = jnp.inf


def linspace_midpoints(n_samples: int) -> np.ndarray:
    """t in (0,1): linspace(0,1,S+1)[:-1] + 0.5/S (nerf_raymarch_common.py:278)."""
    return (np.linspace(0.0, 1.0, n_samples + 1)[:-1] + 0.5 / n_samples).astype(np.float32)


def linearly_spaced_z(n_rays: int, z_near: float, z_far: float, n_samples: int,
                      z_step: float = 0.0, noise_amplitude: float = 0.0,
                      det: bool = True, key=None) -> jnp.ndarray:
    """LinearlySpacedZNearZFarNoDepthRange (nerf_raymarch_common.py:261-292)."""
    t = jnp.asarray(linspace_midpoints(n_samples))
    z = z_near * (1.0 - t) + z_far * t
    z = jnp.broadcast_to(z, (n_rays, n_samples))
    if not det and noise_amplitude > 0.0 and key is not None:
        noise = -z_step / 2 + z_step * jax.random.uniform(key, z.shape)
        z = z + noise_amplitude * noise
    return z


def linearly_spaced_z_world(n_rays, z_near, z_far, n_samples, depth_range,
                            depth_transform, z_step=0.0, noise_amplitude=0.0,
                            det=True, key=None):
    """LinearlySpacedZNearZFar (nerf_raymarch_common.py:295-329)."""
    z = linearly_spaced_z(n_rays, z_near, z_far, n_samples, z_step,
                          noise_amplitude, det, key)
    return depth_transform.to_world(z, depth_range)


def linearly_spaced_from_depth(depth, n_samples, z_step, noise_amplitude=0.0,
                               depth_range=None, depth_transform=None,
                               to_world=True, key=None):
    """LinearlySpacedFromDepth[NoDepthRange] (nerf_raymarch_common.py:404-474).

    depth: (rays, 1) normalized depth around which S samples are placed,
    spaced z_step apart, centred at depth (minus floor(S/2) steps).
    """
    depth = jax.lax.stop_gradient(depth)
    if noise_amplitude > 0.0 and key is not None:
        noise = noise_amplitude * (-z_step / 2 + z_step * jax.random.uniform(key, depth.shape))
        depth = depth + noise
    z_near = depth - z_step * math.floor(n_samples / 2)
    steps = jnp.linspace(0.0, z_step * (n_samples - 1), n_samples, dtype=jnp.float32)
    z = (z_near[..., None] + steps).reshape(depth.shape[0], n_samples)
    if to_world:
        return depth_transform.to_world(z, depth_range)
    return z


def from_depth_cells(depth, n_samples, z_step, disc=128, noise_amplitude=0.0,
                     depth_range=None, depth_transform=None, key=None):
    """FromDepthCells (nerf_raymarch_common.py:476-518): discretize depth to
    cell centres first, then place linearly spaced samples around it."""
    depth = jax.lax.stop_gradient(depth)
    depth_disc = (jnp.floor(depth * disc) + 0.5) / disc
    if noise_amplitude > 0.0 and key is not None:
        noise = noise_amplitude * (-z_step / 2 + z_step * jax.random.uniform(key, depth.shape))
        depth_disc = depth_disc + noise
    z_near = depth_disc - z_step * math.floor(n_samples / 2)
    steps = jnp.linspace(0.0, z_step * (n_samples - 1), n_samples, dtype=jnp.float32)
    z = (z_near[..., None] + steps).reshape(depth.shape[0], n_samples)
    return depth_transform.to_world(z, depth_range)


def linearly_spaced_from_multi_depth(depth, n_samples, z_step,
                                     noise_amplitude=0.0, depth_range=None,
                                     depth_transform=None, key=None):
    """LinearlySpacedFromMultiDepth (nerf_raymarch_common.py:521-574):
    cluster samples around several sorted reference depths, pushing starts
    apart so clusters do not overlap."""
    sorted_depth = jnp.sort(depth, axis=-1)
    sorted_depth = jnp.clip(sorted_depth, 0.0, 1.0)
    if noise_amplitude > 0.0 and key is not None:
        noise = noise_amplitude * (-z_step / 2 + z_step * jax.random.uniform(key, sorted_depth.shape))
        sorted_depth = sorted_depth + noise

    starting_points = depth.shape[-1]
    samples_per_point = (n_samples + starting_points - 1) // starting_points
    z_nears = sorted_depth - z_step * samples_per_point / 2

    min_dist = z_step * (samples_per_point + 1)
    # sequential right-to-left separation pass (tiny static loop)
    cols = [z_nears[:, i] for i in range(starting_points)]
    for i in range(starting_points - 1):
        hi = starting_points - i - 1
        lo = starting_points - i - 2
        off = jnp.clip(cols[hi] - cols[lo] - min_dist, max=0.0)
        cols[lo] = cols[lo] + off
    z_nears = jnp.stack(cols, axis=1)

    z_base = jnp.repeat(z_nears, samples_per_point, axis=1)
    steps = jnp.linspace(0.0, z_step * samples_per_point, samples_per_point, dtype=jnp.float32)
    steps_rep = jnp.tile(steps, (1, starting_points))
    z = (z_base + steps_rep).reshape(depth.shape[0], starting_points * samples_per_point)
    return depth_transform.to_world(z, depth_range)


def unit_sphere_linear_outside_log(ray_origins, ray_directions, n_rays, z_near,
                                   z_far, n_samples, depth_range, **_):
    """UnitSphereLinearOutsideLog (nerf_raymarch_common.py:332-401): half the
    samples linear inside the unit sphere, half logarithmic outside."""
    u = ray_directions
    o = ray_origins
    u_dot_o = jnp.sum(o * u.reshape(-1, 3), axis=1)
    delta = u_dot_o ** 2 - (jnp.sum(o ** 2, axis=-1) - 1.0)
    t1 = -u_dot_o + jnp.sqrt(delta)
    t2 = -u_dot_o - jnp.sqrt(delta)
    t_int = jnp.maximum(t1, t2)

    half = n_samples // 2
    t_int = jnp.broadcast_to(t_int[:, None], (n_rays, half))

    t_in = jnp.asarray(linspace_midpoints(half))
    t_in = z_near * (1.0 - t_in) + z_far * t_in
    t_in = jnp.broadcast_to(t_in, (n_rays, half))
    z_inside = LinearTransform.to_world(
        t_in, [jnp.full_like(t_in, depth_range[0]), t_int])

    t_out = (np.linspace(0.0 + 0.5 / half, 1.0, half + 1)[:-1] + 0.5 / half).astype(np.float32)
    t_out = jnp.broadcast_to(jnp.asarray(t_out) * z_far, (n_rays, half))
    z_outside = LogTransform.to_world(
        t_out, [t_int, jnp.full_like(t_in, depth_range[1])])

    return jnp.concatenate([z_inside, z_outside], axis=1)


def from_iterative_sample_placement(sample_placement, n_ray_samples,
                                    depth_range, depth_transform):
    """FromIterativeSamplePlacement (nerf_raymarch_common.py:577-603):
    active-cell bitmask -> cell-centre z values.

    sample_placement: (rays, disc) 0/1 with exactly n_ray_samples active per
    ray. Fixed-shape version: top_k over (mask * cell_t) sorted ascending.
    """
    disc = sample_placement.shape[-1]
    t_vals = jnp.linspace(0.0, 1.0, disc + 1)[:-1] + (1.0 / disc) * 0.5
    cand = jnp.where(sample_placement > 0, t_vals, jnp.inf)
    z, _ = jax.lax.top_k(-cand, n_ray_samples)
    z = -z  # ascending actives
    return depth_transform.to_world(z, depth_range)


def from_classified_depth(depth, n_samples, depth_range, depth_transform,
                          det=True, key=None, transform=None):
    """FromClassifiedDepth (nerf_raymarch_common.py:606-660): inverse-CDF
    sampling from the oracle's 128-bin probability profile."""
    depth = jax.lax.stop_gradient(depth)
    if transform is not None:
        depth = transform(depth)
    disc = depth.shape[-1]
    mids = jnp.broadcast_to(jnp.linspace(0.0, 1.0, disc + 1), (depth.shape[0], disc + 1))
    z = sample_pdf(mids, depth, n_samples + 2, det=det, key=key)
    z = z[:, 1:-1]
    z = jax.lax.stop_gradient(z)
    return depth_transform.to_world(z, depth_range)


def adaptive_select_reference(depth: jnp.ndarray, max_samples: int,
                              threshold: float, transform=None):
    """FromClassifiedDepthAdaptive, threshold > 0 path
    (nerf_raymarch_common.py:722-757), fixed-shape.

    depth: (rays, disc) oracle probabilities (already sigmoided upstream).
    Returns (z_unit, z_probs, mask):
      z_unit (rays, max_samples): ascending cell-centre depths in [0,1],
        ``inf`` at inactive slots (matches the reference's inf-masking);
      z_probs: oracle probability per kept sample (0 at inactive slots);
      mask: bool validity.

    Implementation: ``top_k`` (== stable descending sort prefix) + threshold
    test + empty-ray argmax fallback + ascending re-sort. No gather/scatter of
    dynamic extent — pure sort networks, TPU-friendly.
    """
    depth = jax.lax.stop_gradient(depth)
    if transform is not None:
        depth = transform(depth)
    disc = depth.shape[-1]
    cell_size = 1.0 / disc

    vals, idx = jax.lax.top_k(depth, max_samples)  # descending, ties by index
    test = (vals >= threshold)

    z = jnp.where(test, (idx.astype(depth.dtype) + 0.5) * cell_size, 0.0)
    z_probs = jnp.where(test, vals, 0.0)

    # rays where nothing exceeds the threshold keep their single best bin
    empty = jnp.logical_not(test[:, 0])
    z = z.at[:, 0].set(jnp.where(empty, (idx[:, 0].astype(depth.dtype) + 0.5) * cell_size,
                                 z[:, 0]))
    z_probs = z_probs.at[:, 0].set(jnp.where(empty, vals[:, 0], z_probs[:, 0]))

    z = jnp.where(z == 0.0, INF, z)

    order = jnp.argsort(z, axis=1)
    z = jnp.take_along_axis(z, order, axis=1)
    z_probs = jnp.take_along_axis(z_probs, order, axis=1)
    mask = jnp.isfinite(z)
    return z, z_probs, mask


def adaptive_select(depth: jnp.ndarray, max_samples: int, threshold: float,
                    transform=None):
    """Fast adaptive select — identical semantics to
    ``adaptive_select_reference`` without top_k / sorts / take_along_axis
    (all pathologically slow on TPU; see tools/profile_frame.py).

    Selection rule (= reference): keep the up-to-``max_samples``
    highest-valued bins with value >= threshold, ties broken toward lower bin
    index; if none pass, keep the argmax bin. Output slots are ascending in
    depth with inf/0/False padding at the tail.

    Implementation: the kept set equals ``{b : d_b >= max(threshold, v_K)}``
    with index-ordered tie capping, where v_K is the K-th largest value —
    found by K rounds of (argmax + first-occurrence mask), all VPU
    elementwise. The kept bins are already in ascending-depth (bin) order, so
    the (rays, K) slot arrays come from a fused one-hot compare-reduce
    instead of a sort.
    """
    depth = jax.lax.stop_gradient(depth)
    if transform is not None:
        depth = transform(depth)
    n_rays, disc = depth.shape
    cell_size = 1.0 / disc
    dt = depth.dtype
    bin_iota = jax.lax.broadcasted_iota(jnp.int32, (n_rays, disc), 1)

    # v_K: K-th largest per ray via iterative first-occurrence argmax
    d_work = depth
    v_k = None
    for _ in range(max_samples):
        idx = jnp.argmax(d_work, axis=1)
        v_k = jnp.max(d_work, axis=1)
        d_work = jnp.where(bin_iota == idx[:, None], -jnp.inf, d_work)

    # keep set: strictly above v_K always kept; ties at v_K kept in bin order
    # up to the remaining budget; everything must pass the threshold
    above = depth > v_k[:, None]
    n_above = jnp.sum(above, axis=1)
    ties = depth == v_k[:, None]
    tie_rank = jnp.cumsum(ties.astype(jnp.int32), axis=1)
    budget = (max_samples - n_above)[:, None]
    keep = above | (ties & (tie_rank <= budget))
    keep = keep & (depth >= threshold)

    # empty-ray fallback: single argmax bin (first occurrence)
    empty = jnp.logical_not(jnp.any(keep, axis=1))
    am = jnp.argmax(depth, axis=1)
    keep = keep | (empty[:, None] & (bin_iota == am[:, None]))

    # compact (rays, disc) -> (rays, K) in bin (= ascending z) order:
    # rowcum[b] = #kept bins <= b; slot s holds the bin where rowcum == s+1
    rowcum = jnp.cumsum(keep.astype(jnp.int32), axis=1)
    n_per_ray = rowcum[:, -1]
    onehot = (keep[:, :, None]
              & (rowcum[:, :, None] == jnp.arange(1, max_samples + 1,
                                                  dtype=jnp.int32)[None, None, :]))
    oh = onehot.astype(dt)
    bin_of_slot = jnp.einsum('rds,rd->rs', oh, bin_iota.astype(dt))
    z_probs = jnp.einsum('rds,rd->rs', oh, depth)

    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (n_rays, max_samples), 1)
    mask = slot_iota < n_per_ray[:, None]
    z = jnp.where(mask, (bin_of_slot + 0.5) * cell_size, INF)
    z_probs = jnp.where(mask, z_probs, 0.0)
    return z, z_probs, mask


def perturb_z(z_vals: jnp.ndarray, key) -> jnp.ndarray:
    """Stratified jitter between sample midpoints (features.py:448-455)."""
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
    lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
    t_rand = jax.random.uniform(key, z_vals.shape)
    return lower + (upper - lower) * t_rand
