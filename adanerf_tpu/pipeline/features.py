"""The feature pipeline: turns (pose, rotation, per-pixel dirs) into encoded
MLP inputs, and network outputs into composited radiance.

Functional rebuild of ``src/features.py``. Feature sets are frozen dataclasses
of *static* scene constants whose ``batch``/``postprocess`` methods are pure
jnp functions, so an entire model cascade traces into a single XLA program
(the reference runs each stage eagerly on torch tensors).

Key structural change for TPU: the adaptive path
(``RayMarchFromPoses`` with ``FromClassifiedDepthAdaptive``, threshold > 0)
keeps the static shape (rays, max_samples) with a validity mask instead of the
reference's boolean-gather compaction (features.py:481-484) — numerically
identical compositing via ``adaptive_raw2outputs_masked``, and shape-stable
under jit. The ragged-compaction fast path for inference lives in
ops/compaction.py.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import samplers as S
from ..ops.encoding import get_encoder
from ..ops.normalization import get_normalization, get_normalization_abbr
from ..ops.raymarch import (adaptive_raw2outputs_masked, ndc_rays,
                            nerf_raw2outputs, ray_sphere_offset, sample_pdf)
from .keys import FSK, DatasetKeys


@dataclass(frozen=True)
class SceneStatic:
    """Per-scene constants every feature needs (reference: DatasetInfo,
    src/datasets.py:146-213)."""
    w: int
    h: int
    fov: float
    focal: float
    view_cell_center: Tuple[float, float, float]
    view_cell_radius: float
    depth_range: Tuple[float, float]
    depth_range_warped: Tuple[float, float]
    depth_transform: Any  # LogTransform / LinearTransform / NoneTransform
    depth_max: float


def _sampler_transform(config, net_idx: int):
    """Oracle-output transform keyed on the upstream loss
    (nerf_raymarch_common.py:685-697): BCE -> sigmoid, CE -> softmax."""
    if net_idx <= 0:
        return None
    loss = config.losses[net_idx - 1]
    if loss == "BCEWithLogitsLoss":
        return jax.nn.sigmoid
    if loss == "CrossEntropyLoss":
        return lambda d: jax.nn.softmax(d, axis=-1)
    if loss == "CrossEntropyLossWeighted":
        disc = config.multiDepthFeatures[net_idx] if config.multiDepthFeatures else 128
        return lambda d: jax.nn.softmax(d[..., :disc], axis=-1)
    return None


class FeatureSet:
    """Base protocol (features.py:44-85). ``batch`` consumes a DatasetKeys
    dict of jnp arrays, ``postprocess`` consumes/extends the inference dict."""
    abbr = "Unknown"
    n_feat = 0
    net_idx = -1

    def batch(self, data, prev_outs=None, is_inference=False, key=None):
        return None

    def postprocess(self, inference_dict, data):
        inference_dict[FSK.postprocessed_network_output] = \
            inference_dict[FSK.network_output]

    def get_string(self):
        return self.abbr


# ---------------------------------------------------------------------------
# output feature sets (training targets)
# ---------------------------------------------------------------------------

class RGBARayMarch(FeatureSet):
    """Target = ground-truth pixel colors (features.py:88-110)."""
    abbr = "RGBARayMarch"
    n_feat = 4

    def __init__(self, config=None, net_idx=-1, scene: SceneStatic = None):
        self.net_idx = net_idx

    def target(self, data):
        img = data[DatasetKeys.color_image_full]
        idx = data[DatasetKeys.image_sample_indices]
        flat = img.reshape(img.shape[0] * img.shape[1], img.shape[2]) \
            if img.ndim == 3 else img.reshape(-1, img.shape[-1])
        return flat[idx]


class Raw(FeatureSet):
    """No target; defines the oracle's output width (features.py:246-267)."""
    n_feat = 128

    def __init__(self, config=None, net_idx=-1, scene: SceneStatic = None):
        if config is not None and config.multiDepthFeatures:
            self.n_feat = config.multiDepthFeatures[net_idx]
        self.net_idx = net_idx
        self.abbr = f"R-{self.n_feat}"

    def target(self, data):
        return None


class RawSigmoid(Raw):
    """Same as Raw; sigmoid postprocess exists for API parity
    (features.py:270-278) but — exactly like the reference cascade, which only
    invokes f_in postprocess (train_data.py:294) — is not applied in the
    cascade: downstream consumers see the raw oracle output."""

    def __init__(self, config=None, net_idx=-1, scene: SceneStatic = None):
        super().__init__(config, net_idx, scene)
        self.abbr = f"S-{self.n_feat}"

    def postprocess(self, inference_dict, data):
        inference_dict[FSK.postprocessed_network_output] = \
            jax.nn.sigmoid(inference_dict[FSK.network_output])


class ClassifiedDepth(FeatureSet):
    """Windowed discretized-depth one-hot target (features.py:113-243).

    Per sampled pixel, scan a window_size^2 neighborhood of the GT depth map,
    discretize into n_feat bins and keep the max distance weight per bin.
    The hot loop has a native C implementation (native/disc_depth.c) mirroring
    the reference's CUDA extension; this jnp version is the in-graph variant.
    """
    n_feat = 128

    def __init__(self, config=None, net_idx=-1, scene: SceneStatic = None):
        self.window_size = 5
        self.d_window_size = 0
        self.ignore_depth_value = 1.0
        if config is not None:
            if config.multiDepthFeatures:
                self.n_feat = config.multiDepthFeatures[net_idx]
            if config.multiDepthWindowSize:
                sizes = config.multiDepthWindowSize[net_idx].split(':')
                self.window_size = int(sizes[0])
                if len(sizes) > 1:
                    self.d_window_size = int(sizes[1])
            if config.multiDepthIgnoreValue:
                self.ignore_depth_value = config.multiDepthIgnoreValue[net_idx]
        self.center_id = self.window_size // 2
        self.net_idx = net_idx
        self.w = scene.w if scene else 0
        self.h = scene.h if scene else 0
        self.d_kernel = None
        if self.d_window_size > 1:
            if self.d_window_size % 2 == 0:
                self.d_window_size += 1
            self.abbr = f"CD-{self.n_feat}-{self.window_size}-{self.d_window_size}"
            tri = np.linspace(0.0, 1.0, (self.d_window_size + 3) // 2)
            self.d_kernel = np.concatenate([tri[1:], tri[-2:0:-1]]).astype(np.float32)
        else:
            self.abbr = f"CD-{self.n_feat}-{self.window_size}"

    def target(self, data):
        depths = data[DatasetKeys.depth_image_full]  # (1, h, w, 1)
        idx = data[DatasetKeys.image_sample_indices]
        return self.features_from_depth(depths, idx)

    def features_from_depth(self, depths, sample_indices):
        n = sample_indices.shape[0]
        step = 1.0 / self.n_feat
        depth_map = depths.reshape(self.h, self.w)

        if self.window_size == 1:
            sel = depth_map.reshape(-1)[sample_indices]
            valid = sel < self.ignore_depth_value
            d_disc = jnp.minimum((sel / step).astype(jnp.int32), self.n_feat - 1)
            feats = jax.nn.one_hot(d_disc, self.n_feat) * valid[:, None]
            return feats

        cx = sample_indices % self.w
        cy = sample_indices // self.w
        max_dist = (self.window_size // 2 + 1) * math.sqrt(2.0)
        feats = jnp.zeros((n, self.n_feat), jnp.float32)
        for i in range(self.window_size):
            for j in range(self.window_size):
                weight = 1.0 - math.sqrt((i - self.center_id) ** 2
                                         + (j - self.center_id) ** 2) / max_dist
                x = jnp.clip(cx - self.center_id + i, 0, self.w - 1)
                y = jnp.clip(cy - self.center_id + j, 0, self.h - 1)
                val = depth_map[y, x]
                disc = (val / step).astype(jnp.int32)
                valid = (val < self.ignore_depth_value) & (disc >= 0)
                disc = jnp.minimum(disc, self.n_feat - 1)
                contrib = jax.nn.one_hot(disc, self.n_feat) * (weight * valid)[:, None]
                feats = jnp.maximum(feats, contrib)

        if self.d_kernel is not None:
            k = self.d_kernel.shape[0]
            pad = self.d_window_size // 2
            padded = jnp.pad(feats, ((0, 0), (pad, pad)))
            out = jnp.zeros_like(feats)
            for t in range(k):
                out = out + padded[:, t:t + self.n_feat] * self.d_kernel[k - 1 - t]
            feats = jnp.clip(out, 0.0, 1.0)
        return feats


# ---------------------------------------------------------------------------
# input feature sets
# ---------------------------------------------------------------------------

class SpherePosDir(FeatureSet):
    """Oracle input: ray direction encoding + view-cell-sphere entry point
    encoding (features.py:698-899)."""

    def __init__(self, config=None, net_idx=-1, scene: SceneStatic = None):
        self.net_idx = net_idx
        self.scene = scene
        self.abbr = "SpPoDi"

        if config.posEncArgs[net_idx] == "none":
            self.n_freq_pos, self.n_freq_dir = -1, -1
        else:
            args = [int(x) for x in config.posEncArgs[net_idx].split('-')]
            self.n_freq_pos, self.n_freq_dir = args[0], args[1]
        self.enc_type = config.posEnc[net_idx]
        self.pos_enc = get_encoder(self.enc_type, self.n_freq_pos)
        self.dir_enc = get_encoder(self.enc_type, self.n_freq_dir)

        self.additional_samples = 0
        if config.raySampleInput:
            self.additional_samples = config.raySampleInput[net_idx]

        if self.enc_type == "nerf":
            if self.additional_samples != 0:
                self.n_feat = ((self.additional_samples * 3 + 3)
                               * (self.n_freq_pos * 2 + 1)
                               + 3 + self.n_freq_dir * 3 * 2)
            else:
                self.n_feat = self.n_freq_pos * 6 + 3 + 3 + self.n_freq_dir * 6
        else:
            self.n_feat = 6 + self.additional_samples * 3
        if self.additional_samples != 0:
            self.abbr = f"SpPoDir[{self.additional_samples}]"

    def warp_depth_images(self, depths, rotations, poses, directions):
        """GT-depth warp (features.py:793-827): world depth minus the
        sphere-entry distance, re-normalized with the warped range.

        depths: (n, h, w, 1); rotations (n,3,3); poses (n,3);
        directions (h*w, 3).
        """
        sc = self.scene
        center = jnp.asarray(sc.view_cell_center)

        def per_image(depth, rotation, pose):
            nds = directions @ rotation.T
            dist = ray_sphere_offset(nds, jnp.broadcast_to(pose, nds.shape),
                                     center, sc.view_cell_radius)
            d = depth.reshape(-1)
            mask = d == 1.0
            dw = sc.depth_transform.to_world(d, sc.depth_range) - dist
            dw = jnp.where(mask, sc.depth_range[1], dw)
            mask2 = dw == sc.depth_range[1]
            dn = sc.depth_transform.from_world(dw, sc.depth_range_warped)
            dn = jnp.where(mask2, 1.0, dn)
            return dn.reshape(depth.shape)

        return jax.vmap(per_image)(depths, rotations, poses)

    def batch(self, data, prev_outs=None, is_inference=False, key=None):
        poses = data[DatasetKeys.image_pose]          # (n_img, 3)
        rotations = data[DatasetKeys.image_rotation]  # (n_img, 3, 3)
        directions = data[DatasetKeys.ray_directions_samples]  # (n_img, R, 3)
        sc = self.scene

        n_img, n_rays = directions.shape[0], directions.shape[1]
        nds = jnp.einsum('bij,bnj->bni', rotations, directions)
        nds_flat = nds.reshape(-1, 3)

        center = jnp.asarray(sc.view_cell_center)
        origins = jnp.repeat(poses, n_rays, axis=0)  # image-major tiling
        distance = ray_sphere_offset(nds_flat, origins, center, sc.view_cell_radius)
        proj_points = origins + nds_flat * distance[:, None]

        enc_dirs = self.dir_enc(nds_flat / jnp.linalg.norm(nds_flat, axis=-1, keepdims=True))
        enc_pos = self.pos_enc(proj_points)
        parts = [enc_dirs, enc_pos]

        if self.additional_samples != 0:
            step = 1.0 / self.additional_samples
            z_unit = jnp.linspace(step / 2, 1.0 - step / 2, self.additional_samples)
            z_world = sc.depth_transform.to_world(z_unit, sc.depth_range_warped)
            add = proj_points[:, None, :] + nds_flat[:, None, :] * z_world[None, :, None]
            enc_add = self.pos_enc(add / sc.depth_range_warped[1])
            enc_add = enc_add.at[:, :, :3].multiply(sc.depth_range_warped[1])
            parts.append(enc_add.reshape(add.shape[0], -1))

        x = jnp.concatenate(parts, axis=-1)

        ret = {FSK.input_feature_batch: x,
               FSK.input_feature_ray_origins: proj_points,
               FSK.input_feature_ray_directions: nds_flat,
               FSK.input_depth_range: jnp.asarray(sc.depth_range_warped)}

        if not is_inference and DatasetKeys.depth_image_samples in data:
            d = data[DatasetKeys.depth_image_samples]
            ret[FSK.input_depth_groundtruth] = d
            ret[FSK.input_depth_groundtruth_world] = \
                sc.depth_transform.to_world(d, sc.depth_range_warped)
        return ret


class CamPosDir(FeatureSet):
    """Oracle input for NDC scenes: camera position + direction encoding
    (features.py:902-1047); like SpherePosDir without the sphere projection."""

    def __init__(self, config=None, net_idx=-1, scene: SceneStatic = None):
        self.net_idx = net_idx
        self.scene = scene
        self.abbr = "CaPoDi"

        if config.posEncArgs[net_idx] == "none":
            self.n_freq_pos, self.n_freq_dir = -1, -1
        else:
            args = [int(x) for x in config.posEncArgs[net_idx].split('-')]
            self.n_freq_pos, self.n_freq_dir = args[0], args[1]
        self.enc_type = config.posEnc[net_idx]
        self.pos_enc = get_encoder(self.enc_type, self.n_freq_pos)
        self.dir_enc = get_encoder(self.enc_type, self.n_freq_dir)

        self.additional_samples = 0
        if config.raySampleInput:
            self.additional_samples = config.raySampleInput[net_idx]

        if self.enc_type == "nerf":
            if self.additional_samples != 0:
                self.n_feat = ((self.additional_samples * 3 + 3)
                               * (self.n_freq_pos * 2 + 1)
                               + 3 + self.n_freq_dir * 3 * 2)
            else:
                self.n_feat = self.n_freq_pos * 6 + 3 + 3 + self.n_freq_dir * 6
        else:
            self.n_feat = 6 + self.additional_samples * 3
        if self.additional_samples != 0:
            self.abbr = f"CaPoDi[{self.additional_samples}]"

    def batch(self, data, prev_outs=None, is_inference=False, key=None):
        poses = data[DatasetKeys.image_pose]
        rotations = data[DatasetKeys.image_rotation]
        directions = data[DatasetKeys.ray_directions_samples]
        sc = self.scene

        n_img, n_rays = directions.shape[0], directions.shape[1]
        nds = jnp.einsum('bij,bnj->bni', rotations, directions)
        nds_flat = nds.reshape(-1, 3)
        proj_points = jnp.repeat(poses, n_rays, axis=0)

        enc_dirs = self.dir_enc(nds_flat / jnp.linalg.norm(nds_flat, axis=-1, keepdims=True))
        enc_pos = self.pos_enc(proj_points)
        parts = [enc_dirs, enc_pos]

        if self.additional_samples != 0:
            step = 1.0 / self.additional_samples
            z_unit = jnp.linspace(step / 2, 1.0 - step / 2, self.additional_samples)
            z_world = sc.depth_transform.to_world(z_unit, sc.depth_range_warped)
            add = proj_points[:, None, :] + nds_flat[:, None, :] * z_world[None, :, None]
            enc_add = self.pos_enc(add / sc.depth_range_warped[1])
            enc_add = enc_add.at[:, :, :3].multiply(sc.depth_range_warped[1])
            parts.append(enc_add.reshape(add.shape[0], -1))

        x = jnp.concatenate(parts, axis=-1)
        ret = {FSK.input_feature_batch: x,
               FSK.input_feature_ray_origins: proj_points,
               FSK.input_feature_ray_directions: nds_flat,
               FSK.input_depth_range: jnp.asarray(sc.depth_range_warped)}
        if not is_inference and DatasetKeys.depth_image_samples in data:
            d = data[DatasetKeys.depth_image_samples]
            ret[FSK.input_depth_groundtruth] = d
            ret[FSK.input_depth_groundtruth_world] = \
                sc.depth_transform.to_world(d, sc.depth_range_warped)
        return ret


class RayMarchFromPoses(FeatureSet):
    """Shading-net input: place z samples (dense or adaptive), encode the ray
    sample positions + dirs; postprocess composites (features.py:281-577)."""
    abbr = "RayMarchFromPoses"

    def __init__(self, config=None, net_idx=-1, scene: SceneStatic = None):
        self.net_idx = net_idx
        self.scene = scene
        self.config = config
        self.n_ray_samples = config.numRaymarchSamples[net_idx]
        self.z_near = 0.001 if not config.zNear else config.zNear[net_idx]
        self.z_far = 1.0 if not config.zFar else config.zFar[net_idx]
        self.train_with_gt_depth = config.trainWithGTDepth
        self.deterministic_sampling = config.deterministicSampling
        self.noise_amplitude = 0.0 if not config.rayMarchSamplingNoise \
            else config.rayMarchSamplingNoise[net_idx]
        self.z_step = ((self.z_far - self.z_near) / self.n_ray_samples
                       if not config.rayMarchSamplingStep
                       else config.rayMarchSamplingStep[net_idx])
        self.sampler_name = config.rayMarchSampler[net_idx]
        self.use_ndc = config.useNDC is True
        self.adaptive = "Adaptive" in self.sampler_name
        self.threshold = config.adaptiveSamplingThreshold
        self.remapping = self.threshold > 0.0
        self.accumulation_mult = config.accumulationMult or None
        self.perturb = config.perturb
        self.norm_center = config.rayMarchNormalizationCenter
        self.disc = 128
        if config.multiDepthFeatures:
            self.disc = config.multiDepthFeatures[net_idx]
        self.oracle_transform = _sampler_transform(config, net_idx)
        self.is_first_loss_oracle = (len(config.losses) > 0
                                     and config.losses[0] == "NeRFWeightMultiplicationLoss")

        norm_name = config.rayMarchNormalization[net_idx] \
            if config.rayMarchNormalization else None
        self.normalization = get_normalization(norm_name)
        self.abbr = self.abbr + get_normalization_abbr(norm_name)

        if config.posEncArgs[net_idx] == "none":
            self.n_freq_pos, self.n_freq_dir = -1, -1
        else:
            args = [int(x) for x in config.posEncArgs[net_idx].split('-')]
            self.n_freq_pos, self.n_freq_dir = args[0], args[1]
        self.enc_type = config.posEnc[net_idx]
        self.pos_enc = get_encoder(self.enc_type, self.n_freq_pos)
        self.dir_enc = get_encoder(self.enc_type, self.n_freq_dir)
        if self.enc_type == "nerf":
            self.n_feat = self.n_freq_pos * 6 + 3 + 3 + self.n_freq_dir * 6
        else:
            self.n_feat = 6

        self.depth_range = (scene.depth_range_warped
                            if config.inFeatures and "SpherePosDir" in config.inFeatures[:net_idx + 1]
                            else scene.depth_range) if scene else None
        # reference: use_warped_depth_range is True from the first SpherePosDir
        # onward (datasets.py:154-159)
        if scene is not None:
            warped = any(f == "SpherePosDir" for f in config.inFeatures[:net_idx + 1])
            self.depth_range = scene.depth_range_warped if warped else scene.depth_range

    def sampler_print_name(self) -> str:
        """Reference sampler print names for the experiment dir
        (nerf_raymarch_common.py:272,489,533,622,679)."""
        n = self.sampler_name
        if n in ("FromClassifiedDepthAdaptive", "FromClassifiedDepthAdaptiveNoDepthRange"):
            return f"{self.n_ray_samples}_LSfCDA_({self.threshold})_{self.disc}_{self.noise_amplitude}"
        if n == "FromClassifiedDepth":
            return f"{self.n_ray_samples}_LSfCD_{self.disc}_{self.noise_amplitude}"
        if n == "LinearlySpacedFromMultiDepth":
            return f"{self.z_near}_{self.z_far}_{self.n_ray_samples}_LSfMD_{self.z_step}_{self.noise_amplitude}"
        if n == "FromDepthCells":
            return f"fDC_{self.n_ray_samples}_FromDepthCells_{self.z_step}_{self.noise_amplitude}"
        if n == "FromIterativeSamplePlacement":
            return f"Iter_{self.z_near}_{self.z_far}_{self.n_ray_samples}_{n}_{self.z_step}_{self.noise_amplitude}"
        if n in ("LinearlySpacedZNearZFar", "LinearlySpacedZNearZFarNoDepthRange",
                 "UnitSphereLinearOutsideLog"):
            if self.noise_amplitude > 0.0:
                return f"{self.z_near}_{self.z_far}_{self.n_ray_samples}_{n}_{self.z_step}_{self.noise_amplitude}"
            return f"{self.z_near}_{self.z_far}_{self.n_ray_samples}_{n}"
        return f"{self.z_near}_{self.z_far}_{self.n_ray_samples}_{n}_{self.z_step}_{self.noise_amplitude}"

    def get_string(self):
        ret = self.abbr + f"[{self.sampler_print_name()}]"
        if self.accumulation_mult:
            ret += f"_acc_{self.accumulation_mult}"
        return ret

    # -- z sampling dispatch ------------------------------------------------
    def _generate_z(self, n_rays, depth, det, key, ray_origins, ray_directions,
                    sample_placement=None):
        sc = self.scene
        dr = self.depth_range
        dtf = sc.depth_transform
        name = self.sampler_name
        if name == "LinearlySpacedZNearZFarNoDepthRange":
            return S.linearly_spaced_z(n_rays, self.z_near, self.z_far,
                                       self.n_ray_samples, self.z_step,
                                       self.noise_amplitude, det, key)
        if name == "LinearlySpacedZNearZFar":
            return S.linearly_spaced_z_world(n_rays, self.z_near, self.z_far,
                                             self.n_ray_samples, dr, dtf,
                                             self.z_step, self.noise_amplitude,
                                             det, key)
        if name == "UnitSphereLinearOutsideLog":
            return S.unit_sphere_linear_outside_log(
                ray_origins, ray_directions, n_rays, self.z_near, self.z_far,
                self.n_ray_samples, dr)
        if name == "LinearlySpacedFromDepthNoDepthRange":
            return S.linearly_spaced_from_depth(depth, self.n_ray_samples,
                                                self.z_step, self.noise_amplitude,
                                                dr, dtf, to_world=False, key=key)
        if name == "LinearlySpacedFromDepth":
            return S.linearly_spaced_from_depth(depth, self.n_ray_samples,
                                                self.z_step, self.noise_amplitude,
                                                dr, dtf, to_world=True, key=key)
        if name == "FromDepthCells":
            return S.from_depth_cells(depth, self.n_ray_samples, self.z_step,
                                      self.disc, self.noise_amplitude, dr, dtf, key)
        if name == "LinearlySpacedFromMultiDepth":
            return S.linearly_spaced_from_multi_depth(depth, self.n_ray_samples,
                                                      self.z_step,
                                                      self.noise_amplitude,
                                                      dr, dtf, key)
        if name == "FromIterativeSamplePlacement":
            return S.from_iterative_sample_placement(sample_placement,
                                                     self.n_ray_samples, dr, dtf)
        if name == "FromClassifiedDepth":
            return S.from_classified_depth(depth, self.n_ray_samples, dr, dtf,
                                           det=det, key=key,
                                           transform=self.oracle_transform)
        if name in ("FromClassifiedDepthAdaptive",
                    "FromClassifiedDepthAdaptiveNoDepthRange"):
            no_range = name.endswith("NoDepthRange")
            if self.threshold == 0.0:
                z = S.linearly_spaced_z(n_rays, self.z_near, self.z_far,
                                        self.n_ray_samples)
                return z if no_range else dtf.to_world(z, dr)
            d = depth
            if self.oracle_transform is not None:
                d = self.oracle_transform(jax.lax.stop_gradient(d))
            z_unit, z_probs, mask = S.adaptive_select(d, self.n_ray_samples,
                                                      self.threshold)
            z_world = z_unit if no_range else dtf.to_world(z_unit, dr)
            return z_world, z_probs, mask
        raise ValueError(f"Unknown sampler {name}")

    # -- batch --------------------------------------------------------------
    def batch(self, data, prev_outs=None, is_inference=False, key=None):
        poses = data[DatasetKeys.image_pose]
        rotations = data[DatasetKeys.image_rotation]
        directions = data[DatasetKeys.ray_directions_samples]
        sc = self.scene

        n_img, n_rays_per_img = directions.shape[0], directions.shape[1]
        n_rays = n_img * n_rays_per_img

        depth_image = data.get(DatasetKeys.depth_image_samples)
        sample_placement = data.get(DatasetKeys.sample_placement)

        depth = None
        z_probs = None
        if prev_outs and (not self.train_with_gt_depth or is_inference):
            depth = prev_outs[-1][FSK.postprocessed_network_output]
        elif depth_image is not None and (not is_inference or not prev_outs):
            depth = depth_image

        ray_origins = None
        ray_directions = None
        if prev_outs:
            p = prev_outs[-1]
            ray_origins = p.get(FSK.input_feature_ray_origins)
            ray_directions = p.get(FSK.input_feature_ray_directions)

        if ray_directions is None:
            ray_directions = jnp.einsum('bij,bnj->bni', rotations, directions).reshape(-1, 3)
        rays_d = ray_directions
        if ray_origins is None:
            ray_origins = jnp.repeat(poses, n_rays_per_img, axis=0)

        if self.use_ndc:
            ray_origins, rays_d = ndc_rays(sc.h, sc.w, sc.focal, 1.0,
                                           ray_origins, ray_directions)
            ray_directions = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

        det = self.deterministic_sampling or is_inference
        k_sample = k_perturb = None
        if key is not None:
            k_sample, k_perturb = jax.random.split(key)
        z_out = self._generate_z(n_rays, depth, det, k_sample,
                                 ray_origins, ray_directions, sample_placement)

        mask = None
        if isinstance(z_out, tuple):
            z_vals, z_probs, mask = z_out
        else:
            z_vals = z_out

        if self.perturb and not is_inference and k_perturb is not None:
            z_vals = S.perturb_z(z_vals, k_perturb)

        # positions; dead adaptive slots carry inf z -> substitute a finite
        # dummy so the (masked-out) MLP inputs stay NaN-free
        if mask is not None:
            z_pos = jnp.where(mask, z_vals, 1.0)
        else:
            z_pos = z_vals
        positions = (ray_origins[:, None, :]
                     + rays_d[:, None, :] * z_pos[..., None])

        if len(self.norm_center) == 3:
            center = jnp.asarray(self.norm_center)
        else:
            center = jnp.asarray(sc.view_cell_center)
        positions = self.normalization(positions, center, sc.depth_max)

        S_dim = positions.shape[1]
        pos_flat = positions.reshape(-1, 3)
        embedded = self.pos_enc(pos_flat)
        dirs_exp = jnp.broadcast_to(ray_directions[:, None, :], positions.shape)
        emb_dirs = self.dir_enc(dirs_exp.reshape(-1, 3))
        embedded = jnp.concatenate([embedded, emb_dirs], axis=-1)
        # keep XLA from fusing the transcendental encoding into the MLP's
        # matmul tiles (it recomputes sin/cos per tile otherwise; the barrier
        # is gradient-transparent)
        embedded = jax.lax.optimization_barrier(embedded)
        embedded = embedded.reshape(n_rays, S_dim, -1)

        ret = {FSK.input_feature_batch: embedded,
               FSK.nerf_input_feature_z_vals: z_vals,
               FSK.nerf_input_feature_ray_directions: rays_d,
               FSK.nerf_input_feature_ray_origins: ray_origins,
               FSK.input_depth_range: jnp.asarray(self.depth_range),
               FSK.input_depth: depth}

        if mask is not None:
            ret[FSK.adaptive_sample_mask] = mask

        if not is_inference and depth_image is not None:
            ret[FSK.input_depth_groundtruth] = depth_image
            ret[FSK.input_depth_groundtruth_world] = \
                sc.depth_transform.to_world(depth_image, self.depth_range)

        if self.is_first_loss_oracle:
            ret[FSK.oracle_weights] = depth if z_probs is None else z_probs
        return ret

    # -- postprocess --------------------------------------------------------
    def postprocess(self, inference_dict, data):
        raw = inference_dict[FSK.network_output]
        rays_d = inference_dict[FSK.nerf_input_feature_ray_directions]
        z_vals = inference_dict[FSK.nerf_input_feature_z_vals]
        sc = self.scene

        depth = inference_dict.get(FSK.oracle_weights)

        if self.adaptive:
            mask = inference_dict.get(FSK.adaptive_sample_mask)
            if mask is None:
                mask = jnp.ones(z_vals.shape, dtype=bool)
            rgb_map, disp, acc, weights, depth_map, alpha = \
                adaptive_raw2outputs_masked(raw, z_vals, mask, depth=depth,
                                            accumulation_mult=self.accumulation_mult)
            if self.remapping:
                # fraction of active samples per ray (features.py:561-563)
                inference_dict[FSK.adaptive_sample_positions] = \
                    jnp.sum(mask, axis=1) / self.n_ray_samples
        else:
            n_rays = rays_d.shape[0]
            rgb_map, disp, acc, weights, depth_map, alpha = nerf_raw2outputs(
                raw.reshape(n_rays, z_vals.shape[1], -1), z_vals, rays_d,
                depth=depth, accumulation_mult=self.accumulation_mult)

        inference_dict[FSK.postprocessed_network_output] = rgb_map
        inference_dict[FSK.nerf_weights_output] = weights
        inference_dict[FSK.nerf_alpha_output] = alpha
        if self.use_ndc:
            inference_dict[FSK.nerf_estimated_depth] = depth_map.reshape(-1, 1)
        else:
            inference_dict[FSK.nerf_estimated_depth] = \
                sc.depth_transform.from_world(depth_map, self.depth_range).reshape(-1, 1)


class RayMarchFromCoarse(FeatureSet):
    """Hierarchical fine-stage input for the baseline NeRF config
    (features.py:580-695): merge coarse z with inverse-CDF samples of the
    coarse weights."""
    abbr = "RayMarchFromCoarse"

    def __init__(self, config=None, net_idx=-1, scene: SceneStatic = None):
        self.net_idx = net_idx
        self.scene = scene
        self.n_ray_samples = config.numRaymarchSamples[net_idx]
        self.z_near = config.zNear[net_idx]
        self.z_far = config.zFar[net_idx]
        self.perturb = config.perturb
        norm_name = config.rayMarchNormalization[net_idx] \
            if config.rayMarchNormalization else None
        self.normalization = get_normalization(norm_name)
        self.abbr = self.abbr + get_normalization_abbr(norm_name)

        if config.posEncArgs[net_idx] == "none":
            self.n_freq_pos, self.n_freq_dir = -1, -1
        else:
            args = [int(x) for x in config.posEncArgs[net_idx].split('-')]
            self.n_freq_pos, self.n_freq_dir = args[0], args[1]
        self.enc_type = config.posEnc[net_idx]
        self.pos_enc = get_encoder(self.enc_type, self.n_freq_pos)
        self.dir_enc = get_encoder(self.enc_type, self.n_freq_dir)
        if self.enc_type == "nerf":
            self.n_feat = self.n_freq_pos * 6 + 3 + 3 + self.n_freq_dir * 6
        else:
            self.n_feat = 6
        self.depth_range = scene.depth_range if scene else (0.0, 1.0)

    def get_string(self):
        return self.abbr + f"[{self.z_near}_{self.z_far}_{self.n_ray_samples}]"

    def batch(self, data, prev_outs=None, is_inference=False, key=None):
        if not prev_outs:
            raise ValueError(f"feature {self.abbr} requires prev_outs")
        p = prev_outs[-1]
        prev_z = p[FSK.nerf_input_feature_z_vals]
        weights = p[FSK.nerf_weights_output]
        ray_origins = p[FSK.nerf_input_feature_ray_origins]
        ray_directions = p[FSK.nerf_input_feature_ray_directions]
        sc = self.scene

        z_mid = 0.5 * (prev_z[..., 1:] + prev_z[..., :-1])
        z_samples = sample_pdf(z_mid, weights[..., 1:-1], self.n_ray_samples,
                               det=(not self.perturb) or is_inference, key=key)
        z_samples = jax.lax.stop_gradient(z_samples)
        z_vals = jnp.sort(jnp.concatenate([prev_z, z_samples], axis=-1), axis=-1)

        positions = (ray_origins[..., None, :]
                     + ray_directions[..., None, :] * z_vals[..., :, None])
        positions = self.normalization(positions, jnp.asarray(sc.view_cell_center),
                                       sc.depth_max)
        S_dim = positions.shape[1]
        embedded = self.pos_enc(positions.reshape(-1, 3))
        dirs_exp = jnp.broadcast_to(ray_directions[:, None, :], positions.shape)
        emb_dirs = self.dir_enc(dirs_exp.reshape(-1, 3))
        embedded = jnp.concatenate([embedded, emb_dirs], axis=-1)
        embedded = embedded.reshape(ray_directions.shape[0], S_dim, -1)

        return {FSK.input_feature_batch: embedded,
                FSK.nerf_input_feature_z_vals: z_vals,
                FSK.nerf_input_feature_ray_directions: ray_directions,
                FSK.nerf_input_feature_ray_origins: ray_origins,
                FSK.input_depth_range: jnp.asarray(self.depth_range)}

    def postprocess(self, inference_dict, data):
        raw = inference_dict[FSK.network_output]
        rays_d = inference_dict[FSK.nerf_input_feature_ray_directions]
        z_vals = inference_dict[FSK.nerf_input_feature_z_vals]
        sc = self.scene
        rgb_map, disp, acc, weights, depth_map, alpha = nerf_raw2outputs(
            raw.reshape(rays_d.shape[0], z_vals.shape[1], -1), z_vals, rays_d)
        inference_dict[FSK.postprocessed_network_output] = rgb_map
        inference_dict[FSK.nerf_weights_output] = weights
        inference_dict[FSK.nerf_alpha_output] = alpha
        inference_dict[FSK.nerf_estimated_depth] = \
            sc.depth_transform.from_world(depth_map, self.depth_range).reshape(-1, 1)


_IN_FEATURES = {"SpherePosDir": SpherePosDir, "CamPosDir": CamPosDir,
                "RayMarchFromPoses": RayMarchFromPoses,
                "RayMarchFromCoarse": RayMarchFromCoarse}
_OUT_FEATURES = {"ClassifiedDepth": ClassifiedDepth, "RGBARayMarch": RGBARayMarch,
                 "Raw": Raw, "RawSigmoid": RawSigmoid}


def get_feature_sets(config, scene: SceneStatic):
    """Registry (features.py:76-85): config strings -> feature instances."""
    f_in, f_out = [], []
    for i in range(len(config.inFeatures)):
        f_in.append(_IN_FEATURES[config.inFeatures[i]](config=config, net_idx=i,
                                                       scene=scene))
        f_out.append(_OUT_FEATURES[config.outFeatures[i]](config=config, net_idx=i,
                                                          scene=scene))
    return f_in, f_out
