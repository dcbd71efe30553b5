"""Model-family tests: skip DSL parsing, architecture shapes, forward pass
semantics, init statistics."""

import jax
import jax.numpy as jnp
import numpy as np

from adanerf_tpu.models import BaseNetDef, NeRFDef, auto_skip, parse_skip_dsl


class TestSkipDSL:
    def test_default(self):
        assert parse_skip_dsl("", 90) == {0: (0, 90)}

    def test_full_input_at_layer(self):
        assert parse_skip_dsl("3", 90) == {3: (0, 90), 0: (0, 90)}

    def test_single_feature(self):
        locs = parse_skip_dsl("2:17", 90)
        assert locs[2] == (17, 18)

    def test_range_and_open_ends(self):
        locs = parse_skip_dsl("0::63-7:63:", 90)
        assert locs[0] == (0, 63)
        assert locs[7] == (63, 90)
        locs = parse_skip_dsl("1:5:40", 90)
        assert locs[1] == (5, 40)

    def test_auto_skip(self):
        # 10 pos freqs -> 63 positional inputs, 8-layer default skip layer 7
        assert auto_skip("auto", 8, "10-4") == "0::63-7:63:"
        assert auto_skip("auto4", 8, "10-4") == "0::63-4:63:"


class TestBaseNet:
    def test_shapes_plain(self):
        d = BaseNetDef(depth=8, width=256, n_in=90, n_out=128, skip="", net_idx=0)
        dims = d.layer_dims()
        assert dims[0] == (90, 256)
        assert all(x == (256, 256) for x in dims[1:-1])
        assert dims[-1] == (256, 128)
        p = d.init(jax.random.PRNGKey(0))
        out = d.apply(p, jnp.ones((7, 90)))
        assert out.shape == (7, 128)

    def test_shapes_skip(self):
        d = BaseNetDef(depth=8, width=256, n_in=90, n_out=4,
                       skip="0::63-7:63:", net_idx=1)
        dims = d.layer_dims()
        assert dims[0] == (63, 256)
        assert dims[7] == (256 + 27, 4)
        p = d.init(jax.random.PRNGKey(0))
        out = d.apply(p, jnp.ones((5, 90)))
        assert out.shape == (5, 4)

    def test_forward_manual(self):
        """2-layer net forward checked against a hand-rolled numpy pass."""
        d = BaseNetDef(depth=2, width=4, n_in=3, n_out=2, skip="")
        p = d.init(jax.random.PRNGKey(1))
        x = np.random.RandomState(0).randn(5, 3).astype(np.float32)
        w0, b0 = np.asarray(p[0]["w"]), np.asarray(p[0]["b"])
        w1, b1 = np.asarray(p[1]["w"]), np.asarray(p[1]["b"])
        ref = np.maximum(x @ w0 + b0, 0) @ w1 + b1
        np.testing.assert_allclose(np.asarray(d.apply(p, jnp.array(x))), ref,
                                   rtol=1e-5, atol=1e-5)

    def test_name(self):
        d = BaseNetDef(depth=8, width=256, n_in=90, n_out=128, skip="", net_idx=0)
        assert d.name == "relu0(256x8)"
        d = BaseNetDef(depth=8, width=256, n_in=90, n_out=4,
                       skip="0::63-7:63:", net_idx=1)
        assert d.name == "relu1(256x80..63-7.63.)"

    def test_init_stats(self):
        d = BaseNetDef(depth=2, width=512, n_in=256, n_out=4, skip="")
        p = d.init(jax.random.PRNGKey(2))
        std = float(jnp.std(p[0]["w"]))
        assert abs(std - np.sqrt(2.0 / 256)) < 0.01  # kaiming normal fan_in


class TestNeRF:
    def test_shapes(self):
        d = NeRFDef(depth=8, width=256, input_ch=63, input_ch_views=27, skips=(4,))
        p = d.init(jax.random.PRNGKey(0))
        out = d.apply(p, jnp.ones((9, 90)))
        assert out.shape == (9, 4)
        # skip layer widened
        assert p["pts"][5]["w"].shape == (256 + 63, 256)
        assert p["views"][0]["w"].shape == (27 + 256, 128)

    def test_name(self):
        d = NeRFDef(net_idx=1)
        assert d.name == "NeRF1(256x8[4])"

    def test_viewdir_isolation(self):
        """Alpha channel must not depend on view direction (alpha taken from
        the trunk before the view branch, models.py:263-273)."""
        d = NeRFDef(depth=2, width=8, input_ch=3, input_ch_views=3, skips=(5,))
        p = d.init(jax.random.PRNGKey(3))
        x1 = jnp.array([[0.1, 0.2, 0.3, 1.0, 0.0, 0.0]])
        x2 = jnp.array([[0.1, 0.2, 0.3, 0.0, 1.0, 0.0]])
        o1, o2 = d.apply(p, x1), d.apply(p, x2)
        assert np.isclose(float(o1[0, 3]), float(o2[0, 3]))  # alpha equal
        assert not np.allclose(np.asarray(o1[0, :3]), np.asarray(o2[0, :3]))

    def test_macs(self):
        d = NeRFDef(depth=8, width=256, input_ch=63, input_ch_views=27, skips=(4,))
        macs = d.macs_per_input()
        expected = 63 * 256 + 6 * 256 * 256 + (256 + 63) * 256 \
            + (27 + 256) * 128 + 256 * 256 + 256 + 128 * 3
        assert macs == expected


class TestGetModel:
    def test_factory(self):
        from types import SimpleNamespace
        from adanerf_tpu.models import get_model
        cfg = SimpleNamespace(
            activation=["relu", "nerf"], layers=[8, 8], layerWidth=[256, 256],
            skips=[" ", "auto"], posEnc=["nerf", "nerf"],
            posEncArgs=["10-4", "10-4"],
            inFeatures=["SpherePosDir", "RayMarchFromPoses"])
        m0 = get_model(cfg, 90, 128, 0)
        m1 = get_model(cfg, 90, 4, 1)
        assert isinstance(m0, BaseNetDef) and m0.skip == ""
        assert isinstance(m1, NeRFDef)
        assert m1.input_ch == 63 and m1.input_ch_views == 27 and m1.skips == (4,)
