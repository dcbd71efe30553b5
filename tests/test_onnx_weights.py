"""ONNX weight extraction (utils/onnx_weights.py): parse a hand-encoded
minimal ModelProto (no onnx/torch exporter exists in this env) plus the
reference's shipped sample models when the checkout is present."""

import os
import struct

import numpy as np
import pytest

from adanerf_tpu.utils.onnx_weights import load_onnx_weights


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wire: int, payload: bytes) -> bytes:
    return _varint((num << 3) | wire) + payload


def _len_delim(num: int, payload: bytes) -> bytes:
    return _field(num, 2, _varint(len(payload)) + payload)


def _tensor(name: str, arr: np.ndarray, packed_dims: bool,
            raw: bool) -> bytes:
    t = b""
    if packed_dims:
        t += _len_delim(1, b"".join(_varint(d) for d in arr.shape))
    else:
        for d in arr.shape:
            t += _field(1, 0, _varint(d))
    t += _field(2, 0, _varint(1))  # data_type FLOAT
    if raw:
        t += _len_delim(9, arr.astype("<f4").tobytes())
    else:
        t += _len_delim(4, arr.astype("<f4").tobytes())  # packed float_data
    t += _len_delim(8, name.encode())
    return t


def _model(tensors: bytes) -> bytes:
    return _len_delim(7, tensors)  # ModelProto.graph = GraphProto


def test_parse_hand_encoded_model(tmp_path):
    rng = np.random.default_rng(0)
    a = rng.normal(size=(3, 4)).astype(np.float32)
    b = rng.normal(size=(5,)).astype(np.float32)
    c = rng.normal(size=(2, 2, 2)).astype(np.float32)
    graph = (_len_delim(5, _tensor("layers.0.weight", a, True, True))
             + _len_delim(5, _tensor("layers.0.bias", b, False, True))
             + _len_delim(5, _tensor("float_data.t", c, True, False)))
    path = str(tmp_path / "hand.onnx")
    with open(path, "wb") as f:
        f.write(_model(graph))
    w = load_onnx_weights(path)
    assert set(w) == {"layers.0.weight", "layers.0.bias", "float_data.t"}
    np.testing.assert_array_equal(w["layers.0.weight"], a)
    np.testing.assert_array_equal(w["layers.0.bias"], b)
    np.testing.assert_array_equal(w["float_data.t"], c)


REF_SAMPLE = "/root/reference/adanerf_real_time_viewer/sample"


@pytest.mark.skipif(not os.path.isdir(REF_SAMPLE),
                    reason="reference checkout not present")
def test_reference_sample_models_parse():
    w0 = load_onnx_weights(os.path.join(REF_SAMPLE, "model0.onnx"))
    assert w0["layers.0.weight"].shape == (256, 90)
    assert w0["layers.7.weight"].shape == (128, 256)
    w1 = load_onnx_weights(os.path.join(REF_SAMPLE, "model1.onnx"))
    assert w1["pts_linears.0.weight"].shape == (256, 63)
    assert w1["pts_linears.5.weight"].shape == (256, 319)  # skip layer
    assert w1["views_linears.0.weight"].shape == (128, 283)
    # finite, non-degenerate trained weights
    for v in list(w0.values()) + list(w1.values()):
        assert np.isfinite(v).all()
    assert abs(float(w1["rgb_linear.weight"].std())) > 1e-3


@pytest.mark.skipif(not os.path.isdir(REF_SAMPLE),
                    reason="reference checkout not present")
def test_convert_reference_sample_loads_in_viewer(tmp_path):
    """tools/convert_reference_onnx.py output must load through the viewer's
    export reader (defs inferred from weights) and run the oracle forward."""
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "conv")
    r = subprocess.run(
        [sys.executable, os.path.join(root, "tools",
                                      "convert_reference_onnx.py"),
         REF_SAMPLE, out],
        capture_output=True, text=True, env={**os.environ,
                                             "ADANERF_PLATFORM": "cpu"})
    assert r.returncode == 0, r.stderr[-1500:]

    sys.path.insert(0, root)
    import jax.numpy as jnp

    from viewer import build_renderer_from_export

    rt, scene = build_renderer_from_export(out, batch_size=64,
                                           dtype_str="fp32")
    assert rt.max_samples == 4 and abs(rt.threshold - 0.15) < 1e-6
    assert rt.oracle_def.n_out == 128 and rt.nerf_def.skips == (4,)
    d = np.random.default_rng(0).normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    packed, mask, n_act = rt._oracle_fn(
        rt.params[0], jnp.asarray(scene.view_cell_center, jnp.float32),
        jnp.eye(3), jnp.asarray(d))
    assert np.isfinite(np.asarray(packed)).all()
    assert 0 < int(n_act) <= 64 * 4
