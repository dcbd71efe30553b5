"""Unit tests for pure math ops against hand-computed / independently derived
numpy values (reference-semantics oracles are re-derived in the tests, not
imported)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adanerf_tpu.ops import depth_transforms as dt
from adanerf_tpu.ops import encoding, normalization, raygen, raymarch, samplers


class TestDepthTransforms:
    def test_log_roundtrip(self):
        d = np.linspace(0.6, 9.5, 20).astype(np.float32)  # stay above min_d
        rng = [0.5, 10.0]
        norm = dt.LogTransform.from_world(d.copy(), rng)
        back = dt.LogTransform.to_world(norm, rng)
        np.testing.assert_allclose(back, d, rtol=1e-5)

    def test_log_known_value(self):
        # depth=min -> clamped to 0.001 -> log(1.001)/log(max_v+1)
        rng = [1.0, 11.0]
        out = dt.LogTransform.from_world(np.array([1.0], np.float32), rng)
        assert np.isclose(out[0], math.log(1.001) / math.log(11.0), rtol=1e-3)
        out = dt.LogTransform.from_world(np.array([11.0], np.float32), rng)
        assert np.isclose(out[0], 1.0, rtol=1e-5)

    def test_linear(self):
        rng = [2.0, 6.0]
        x = np.array([2.0, 4.0, 6.0], np.float32)
        np.testing.assert_allclose(dt.LinearTransform.from_world(x, rng), [0, 0.5, 1])
        np.testing.assert_allclose(dt.LinearTransform.to_world(np.array([0, 0.5, 1.0]), rng),
                                   [2, 4, 6])

    def test_jnp_inputs(self):
        rng = [0.0, 10.0]
        x = jnp.array([5.0])
        y = dt.LogTransform.from_world(x, rng)
        assert isinstance(y, jax.Array)
        assert np.isclose(float(y[0]), math.log(6.0) / math.log(11.0), rtol=1e-5)


class TestEncoding:
    def test_layout_and_values(self):
        x = jnp.array([[0.5, -0.25, 1.0]])
        out = encoding.positional_encode(x, 2)
        assert out.shape == (1, 3 * (2 * 2 + 1))
        expected = np.concatenate([
            np.array([[0.5, -0.25, 1.0]]),
            np.sin([[0.5, -0.25, 1.0]]), np.cos([[0.5, -0.25, 1.0]]),
            np.sin([[1.0, -0.5, 2.0]]), np.cos([[1.0, -0.5, 2.0]]),
        ], axis=-1)
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)

    def test_width_helper(self):
        assert encoding.encoded_width("nerf", 3, 10) == 63
        assert encoding.encoded_width("nerf", 3, 4) == 27
        assert encoding.encoded_width("none", 3, 0) == 3

    def test_none_encoder(self):
        f = encoding.get_encoder("none", 0)
        x = jnp.ones((4, 3))
        assert f(x) is x


class TestRaygen:
    def test_unit_norm_and_flips(self):
        dirs = raygen.generate_ray_directions(8, 6, fov=0.8, focal=4.0)
        assert dirs.shape == (6, 8, 3)
        np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0, rtol=1e-6)
        # z must be negative everywhere (camera looks down -z)
        assert (dirs[:, :, 2] < 0).all()
        # left-right x symmetry: mirrored pixels have opposite x
        np.testing.assert_allclose(dirs[:, 0, 0], -dirs[:, -1, 0], atol=1e-6)
        # top rows (small h index) have positive y after the flip
        assert (dirs[0, :, 1] > 0).all()

    def test_center_pixel_points_forward(self):
        w = h = 9
        dirs = raygen.generate_ray_directions(w, h, fov=0.6, focal=2.0)
        c = dirs[h // 2, w // 2]
        np.testing.assert_allclose(c, [0, 0, -1], atol=1e-6)


class TestNormalization:
    def test_inverse_sqrt_dist_centered(self):
        x = jnp.array([[3.0, 0.0, 0.0]])
        c = jnp.array([1.0, 0.0, 0.0])
        out = normalization.normalization_inverse_sqrt_dist_centered(x, c, 4.0)
        # localized=(2,0,0), |..|=2, sqrt=~1.414, res = 2/(2*1.414)
        assert np.isclose(float(out[0, 0]), 2.0 / (2.0 * math.sqrt(2.0)), rtol=1e-5)

    def test_factory(self):
        f = normalization.get_normalization("MaxDepth")
        out = f(jnp.array([2.0, 4.0]), None, 4.0)
        np.testing.assert_allclose(np.asarray(out), [0.5, 1.0])
        assert normalization.get_normalization_abbr("InverseSqrtDistCentered") == "_nSD"


class TestRaymarch:
    def _manual_composite(self, alpha):
        """Independent cumprod compositing oracle."""
        rays, S = alpha.shape
        w = np.zeros_like(alpha)
        for r in range(rays):
            trans = 1.0
            for s in range(S):
                w[r, s] = alpha[r, s] * trans
                trans *= (1.0 - alpha[r, s] + 1e-10)
        return w

    def test_dense_compositing(self):
        rng = np.random.RandomState(0)
        raw = rng.randn(4, 5, 4).astype(np.float32)
        z = np.sort(rng.rand(4, 5).astype(np.float32), axis=1)
        rd = rng.randn(4, 3).astype(np.float32)
        rgb_map, disp, acc, weights, depth_map, alpha = raymarch.nerf_raw2outputs(
            jnp.array(raw), jnp.array(z), jnp.array(rd))

        dists = np.diff(z, axis=1)
        dists = np.concatenate([dists, np.full((4, 1), 1e10, np.float32)], axis=1)
        dists = dists * np.linalg.norm(rd, axis=-1, keepdims=True)
        a_np = 1 - np.exp(-np.maximum(raw[..., 3], 0) * dists)
        w_np = self._manual_composite(a_np)
        rgb_np = (w_np[..., None] * (1 / (1 + np.exp(-raw[..., :3])))).sum(axis=1)

        np.testing.assert_allclose(np.asarray(alpha), a_np, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(weights), w_np, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(rgb_map), rgb_np, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(depth_map), (w_np * z).sum(1),
                                   rtol=1e-4, atol=1e-5)

    def test_dense_alpha_premultiply(self):
        """accumulation_mult='alpha' multiplies oracle density into alpha
        BEFORE the cumprod (nerf_raymarch_common.py:48-51)."""
        rng = np.random.RandomState(1)
        raw = rng.randn(3, 4, 4).astype(np.float32)
        z = np.sort(rng.rand(3, 4).astype(np.float32), axis=1)
        rd = np.ones((3, 3), np.float32)
        oracle = rng.rand(3, 4).astype(np.float32)
        _, _, _, weights, _, alpha = raymarch.nerf_raw2outputs(
            jnp.array(raw), jnp.array(z), jnp.array(rd),
            depth=jnp.array(oracle), accumulation_mult="alpha")
        dists = np.diff(z, axis=1)
        dists = np.concatenate([dists, np.full((3, 1), 1e10, np.float32)], axis=1)
        dists *= np.sqrt(3.0)
        a_np = (1 - np.exp(-np.maximum(raw[..., 3], 0) * dists)) * oracle
        np.testing.assert_allclose(np.asarray(alpha), a_np, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(weights), self._manual_composite(a_np),
                                   rtol=1e-4, atol=1e-5)

    def test_adaptive_masked_matches_scatter_restore(self):
        """Masked fixed-shape compositing == reference scatter-restore
        (nerf_raymarch_common.py:91-144)."""
        rng = np.random.RandomState(2)
        rays, S = 6, 4
        raw = rng.randn(rays, S, 4).astype(np.float32)
        z = np.sort(rng.rand(rays, S).astype(np.float32), axis=1)
        mask = rng.rand(rays, S) > 0.4
        mask[3] = False
        mask[3, 0] = True  # at least one valid sample like the ref fallback
        probs = rng.rand(rays, S).astype(np.float32) * mask

        rgb_map, disp, acc, weights, depth_map, alpha = \
            raymarch.adaptive_raw2outputs_masked(
                jnp.array(raw), jnp.array(z), jnp.array(mask),
                depth=jnp.array(probs), accumulation_mult="alpha")

        # independent oracle: emulate restore-into-zeros buffer
        sig = 1 / (1 + np.exp(-raw))
        restored = np.where(mask[..., None], sig, 0.0)
        restored_z = np.where(mask, z, 0.0)
        a_np = restored[..., 3] * probs
        w_np = self._manual_composite(a_np)
        rgb_np = (w_np[..., None] * restored[..., :3]).sum(axis=1)

        np.testing.assert_allclose(np.asarray(alpha), a_np, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(rgb_map), rgb_np, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(depth_map), (w_np * restored_z).sum(1),
                                   rtol=1e-4, atol=1e-5)

    def test_ndc_rays(self):
        o = jnp.array([[0.0, 0.0, -1.0]])
        d = jnp.array([[0.0, 0.0, -1.0]])
        no, nd = raymarch.ndc_rays(8, 8, 4.0, 1.0, o, d)
        # central forward ray maps to the NDC origin ray
        np.testing.assert_allclose(np.asarray(no), [[0.0, 0.0, -1.0]], atol=1e-6)
        np.testing.assert_allclose(np.asarray(nd), [[0.0, 0.0, 2.0]], atol=1e-6)

    def test_sample_pdf_deterministic_uniform(self):
        # uniform weights -> evenly spread samples
        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (2, 9))
        w = jnp.ones((2, 8))
        s = raymarch.sample_pdf(bins, w, 5, det=True)
        assert s.shape == (2, 5)
        np.testing.assert_allclose(np.asarray(s)[0], np.linspace(0, 1, 5), atol=1e-5)

    def test_sample_pdf_concentrates(self):
        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 5), (1, 5))
        w = jnp.array([[0.0, 0.0, 100.0, 0.0]])  # mass in bin [0.5, 0.75]
        s = np.asarray(raymarch.sample_pdf(bins, w, 7, det=True))
        inner = s[0][1:-1]  # endpoints land on neighbouring bin edges
        assert ((inner >= 0.5) & (inner <= 0.75)).all()

    def test_ray_sphere_offset(self):
        # origin at centre: offset == radius for any unit dir
        dirs = jnp.array([[1.0, 0, 0], [0, 1.0, 0]])
        orig = jnp.zeros((2, 3))
        d = raymarch.ray_sphere_offset(dirs, orig, jnp.zeros(3), 2.0)
        np.testing.assert_allclose(np.asarray(d), [2.0, 2.0], rtol=1e-6)
        # origin offset along -x, ray +x: exit at +r -> distance r + |x0|
        d = raymarch.ray_sphere_offset(jnp.array([[1.0, 0, 0]]),
                                       jnp.array([[-0.5, 0, 0]]), jnp.zeros(3), 2.0)
        np.testing.assert_allclose(np.asarray(d), [2.5], rtol=1e-6)


class TestSamplers:
    def test_linearly_spaced(self):
        z = samplers.linearly_spaced_z(3, 0.0, 1.0, 4)
        np.testing.assert_allclose(np.asarray(z)[0], [0.125, 0.375, 0.625, 0.875],
                                   atol=1e-6)

    def test_linearly_spaced_world(self):
        z = samplers.linearly_spaced_z_world(2, 0.0, 1.0, 2, [1.0, 3.0],
                                             dt.LinearTransform)
        np.testing.assert_allclose(np.asarray(z)[0], [1.5, 2.5], atol=1e-6)

    def test_adaptive_select_basic(self):
        """Threshold select: keep cells >= thr, ascending by depth, inf-mask."""
        disc = 8
        depth = np.zeros((2, disc), np.float32)
        depth[0, [1, 5]] = [0.9, 0.7]
        depth[0, 3] = 0.1  # below threshold
        depth[1, :] = 0.01  # empty ray -> argmax fallback
        depth[1, 6] = 0.05
        z, probs, mask = samplers.adaptive_select(jnp.array(depth), 4, 0.5)
        cell = 1.0 / disc
        z, probs, mask = np.asarray(z), np.asarray(probs), np.asarray(mask)
        # ray 0: cells 1 and 5 kept, ascending
        np.testing.assert_allclose(z[0, :2], [(1 + 0.5) * cell, (5 + 0.5) * cell], atol=1e-6)
        np.testing.assert_allclose(probs[0, :2], [0.9, 0.7], atol=1e-6)
        assert mask[0, :2].all() and not mask[0, 2:].any()
        assert np.isinf(z[0, 2:]).all()
        # ray 1: single fallback sample at argmax cell 6
        assert mask[1, 0] and not mask[1, 1:].any()
        np.testing.assert_allclose(z[1, 0], (6 + 0.5) * cell, atol=1e-6)
        np.testing.assert_allclose(probs[1, 0], 0.05, atol=1e-6)

    def test_adaptive_select_topk_overflow(self):
        """More cells above threshold than max_samples -> keep the top-k by
        probability (reference takes the first max_samples of the descending
        sort, nerf_raymarch_common.py:738)."""
        depth = np.array([[0.6, 0.9, 0.7, 0.95, 0.65, 0.8, 0.3, 0.2]], np.float32)
        z, probs, mask = samplers.adaptive_select(jnp.array(depth), 3, 0.5)
        # top-3 probabilities: 0.95 (cell 3), 0.9 (cell 1), 0.8 (cell 5)
        cell = 1.0 / 8
        np.testing.assert_allclose(np.sort(np.asarray(probs)[0])[::-1],
                                   [0.95, 0.9, 0.8], atol=1e-6)
        np.testing.assert_allclose(np.asarray(z)[0],
                                   [(1 + .5) * cell, (3 + .5) * cell, (5 + .5) * cell],
                                   atol=1e-6)
        assert np.asarray(mask).all()

    def test_adaptive_select_all_kept_dense_equiv(self):
        """threshold just above 0 with max_samples == disc keeps every cell
        whose value passes; probs gather follows the z re-sort."""
        rng = np.random.RandomState(3)
        depth = rng.rand(5, 16).astype(np.float32)
        z, probs, mask = samplers.adaptive_select(jnp.array(depth), 16, 1e-6)
        # every cell kept -> z strictly ascending cell centres
        expected = (np.arange(16) + 0.5) / 16
        np.testing.assert_allclose(np.asarray(z), np.broadcast_to(expected, (5, 16)),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(probs), depth, atol=1e-6)

    def test_from_classified_depth(self):
        depth = np.zeros((1, 8), np.float32)
        depth[0, 2] = 1.0
        z = samplers.from_classified_depth(jnp.array(depth), 4, [0.0, 1.0],
                                           dt.LinearTransform, det=True)
        zz = np.asarray(z)[0]
        assert ((zz >= 0.25 - 1e-4) & (zz <= 0.375 + 1e-4)).all()

    def test_linearly_spaced_from_depth(self):
        depth = jnp.array([[0.5]])
        z = samplers.linearly_spaced_from_depth(depth, 4, 0.1,
                                                depth_range=[0.0, 1.0],
                                                depth_transform=dt.LinearTransform)
        np.testing.assert_allclose(np.asarray(z)[0], [0.3, 0.4, 0.5, 0.6], atol=1e-6)

    def test_perturb_bounds(self):
        z = jnp.broadcast_to(jnp.linspace(0.1, 0.9, 8), (4, 8))
        zp = samplers.perturb_z(z, jax.random.PRNGKey(0))
        z_np = np.asarray(z)
        mids = 0.5 * (z_np[:, 1:] + z_np[:, :-1])
        upper = np.concatenate([mids, z_np[:, -1:]], axis=1)
        lower = np.concatenate([z_np[:, :1], mids], axis=1)
        zp = np.asarray(zp)
        assert (zp >= lower - 1e-6).all() and (zp <= upper + 1e-6).all()
