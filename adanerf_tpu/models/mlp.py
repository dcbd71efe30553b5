"""The two model families: a generic relu MLP with a textual skip-connection
DSL ("BaseNet", the sampling oracle) and the nerf-pytorch shading MLP with a
view-direction branch ("NeRF").

Reference semantics: ``src/models.py:18-372``. TPU-first design: models are
(static definition, parameter pytree) pairs applied by pure functions; all
matmuls take ``preferred_element_type=float32`` so the MXU accumulates in
fp32 even under bf16 inputs. Parameter initialization reproduces the
reference's torch init (kaiming-normal weights on the trunk layers, torch
Linear defaults elsewhere) so training dynamics match.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


Params = List[Dict[str, jnp.ndarray]]


def _dense(x, p, dtype=None):
    """Dense layer. dtype=None -> full fp32 (HIGHEST precision so the TPU MXU
    does not silently drop to bf16 passes); dtype=bfloat16 -> the fast MXU
    path with fp32 accumulation."""
    w, b = p["w"], p["b"]
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
        precision = None
    else:
        precision = jax.lax.Precision.HIGHEST
    return jnp.dot(x, w, preferred_element_type=jnp.float32,
                   precision=precision) + b


def _kaiming_normal(key, shape):
    """torch.nn.init.kaiming_normal_ default: fan_in, leaky_relu gain sqrt(2).

    shape is (n_in, n_out); torch stores (out, in) and fan_in = in.
    """
    fan_in = shape[0]
    std = math.sqrt(2.0 / fan_in)
    return jax.random.normal(key, shape, dtype=jnp.float32) * std


def _torch_linear_default(key, shape):
    """torch Linear default weight init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound,
                              dtype=jnp.float32)


def _torch_bias_default(key, n_out, fan_in):
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, (n_out,), minval=-bound, maxval=bound,
                              dtype=jnp.float32)


def parse_skip_dsl(skip: str, n_in: int) -> Dict[int, Tuple[int, int]]:
    """Parse the BaseNet skip DSL (models.py:43-68).

    Grammar per '-'-separated part: ``loc[:start][:end]``:
      "3"        -> layer 3 gets the full input (0, n_in)
      "3:17"     -> layer 3 gets the single input feature 17
      "3:5:40"   -> layer 3 gets input slice [5, 40)
      "0::63-7:63:" -> layer 0 gets [0,63), layer 7 gets [63, n_in)
    Layer 0 defaults to the full input if not mentioned.
    """
    locations: Dict[int, Tuple[int, int]] = {0: (0, n_in)}
    if skip:
        locations = {}
        for s in skip.split('-'):
            match = re.search(r'^([0-9]+)(:?)([0-9]*)(:?)([0-9]*)$', s)
            if not match:
                raise ValueError(f"could not decode skip info: {s!r}")
            loc = int(match.group(1))
            has_first = match.group(2)
            start_feat = match.group(3)
            has_between = match.group(4)
            end_feat = match.group(5)
            if has_first == '' and has_between == '':
                locations[loc] = (0, n_in)
            elif has_first == ':' and has_between == '':
                single = int(start_feat + end_feat)
                locations[loc] = (single, single + 1)
            else:
                istart = int(start_feat) if start_feat != '' else 0
                iend = int(end_feat) if end_feat != '' else n_in
                locations[loc] = (istart, iend)
        if 0 not in locations:
            locations[0] = (0, n_in)
    return locations


def auto_skip(skip: str, depth: int, pos_enc_args: str) -> str:
    """Resolve the 'auto' skip shorthand for RayMarch inputs
    (models.py:22-39): feed the positional part again at layer D*k//8."""
    skip_layer = 7
    if len(skip) > 4:
        skip_layer = int(skip[4:])
    freq = pos_enc_args.split('-')
    pos_inputs = int(freq[0]) * 6 + 3
    return f"0::{pos_inputs}-{depth * skip_layer // 8}:{pos_inputs}:"


@dataclass(frozen=True)
class BaseNetDef:
    """Static description of a BaseNet relu MLP (models.py:18-195)."""
    depth: int
    width: int
    n_in: int
    n_out: int
    skip: str = ""
    net_idx: int = 0

    @property
    def input_locations(self) -> Dict[int, Tuple[int, int]]:
        return parse_skip_dsl(self.skip, self.n_in)

    @property
    def name(self) -> str:
        """Checkpoint-compatible logical name (models.py:40)."""
        s = self.skip.replace(':', '.') if self.skip else ''
        return f"relu{self.net_idx}({self.width}x{self.depth}{s})"

    def layer_dims(self) -> List[Tuple[int, int]]:
        locs = self.input_locations
        dims = []
        in0 = locs[0][1] - locs[0][0]
        dims.append((in0, self.width))
        for i in range(1, self.depth):
            extra = (locs[i][1] - locs[i][0]) if i in locs else 0
            n_out = self.width if i != self.depth - 1 else self.n_out
            dims.append((self.width + extra, n_out))
        return dims

    def init(self, key) -> Params:
        params = []
        for (n_in, n_out) in self.layer_dims():
            key, kw, kb = jax.random.split(key, 3)
            params.append({"w": _kaiming_normal(kw, (n_in, n_out)),
                           "b": _torch_bias_default(kb, n_out, n_in)})
        return params

    def apply(self, params: Params, x: jnp.ndarray, dtype=None) -> jnp.ndarray:
        """Forward pass (models.py:183-195): relu trunk, skip concats, no
        activation on the last layer."""
        locs = self.input_locations
        out = x[..., locs[0][0]:locs[0][1]]
        n_layers = len(params)
        for i, p in enumerate(params):
            if i in locs and i != 0:
                out = jnp.concatenate([out, x[..., locs[i][0]:locs[i][1]]], axis=-1)
            out = _dense(out, p, dtype)
            if i + 1 < n_layers:
                out = jax.nn.relu(out)
        return out

    def macs_per_input(self) -> int:
        return sum(a * b for a, b in self.layer_dims())

    def param_count(self) -> int:
        return sum(a * b + b for a, b in self.layer_dims())


@dataclass(frozen=True)
class NeRFDef:
    """Static description of the nerf-pytorch shading MLP (models.py:199-277).

    Input layout: [input_ch positional feats | input_ch_views dir feats].
    Skip: input_pts re-concatenated AFTER the relu of each layer in `skips`.
    View branch: alpha from trunk; rgb from one W/2 layer over
    [feature, input_views].
    """
    depth: int = 8
    width: int = 256
    input_ch: int = 63
    input_ch_views: int = 27
    n_out: int = 4
    skips: Tuple[int, ...] = (4,)
    use_viewdirs: bool = True
    net_idx: int = 1

    @property
    def name(self) -> str:
        """Checkpoint-compatible logical name (models.py:215)."""
        return f"NeRF{self.net_idx}({self.width}x{self.depth}{list(self.skips)})"

    def init(self, key) -> Dict:
        W, D = self.width, self.depth
        pts_dims = [(self.input_ch, W)]
        for i in range(D - 1):
            pts_dims.append((W + self.input_ch, W) if i in self.skips else (W, W))

        params = {"pts": [], "views": []}
        for (n_in, n_out) in pts_dims:
            key, kw, kb = jax.random.split(key, 3)
            params["pts"].append({"w": _kaiming_normal(kw, (n_in, n_out)),
                                  "b": _torch_bias_default(kb, n_out, n_in)})
        # views branch: one layer (input_ch_views + W) -> W // 2, kaiming
        key, kw, kb = jax.random.split(key, 3)
        vin = self.input_ch_views + W
        params["views"].append({"w": _kaiming_normal(kw, (vin, W // 2)),
                                "b": _torch_bias_default(kb, W // 2, vin)})
        if self.use_viewdirs:
            # these three keep torch Linear defaults (models.py:239-242 get no
            # explicit init in the reference)
            key, k1, k2, k3, k4, k5, k6 = jax.random.split(key, 7)
            params["feature"] = {"w": _torch_linear_default(k1, (W, W)),
                                 "b": _torch_bias_default(k2, W, W)}
            params["alpha"] = {"w": _torch_linear_default(k3, (W, 1)),
                               "b": _torch_bias_default(k4, 1, W)}
            params["rgb"] = {"w": _torch_linear_default(k5, (W // 2, 3)),
                             "b": _torch_bias_default(k6, 3, W // 2)}
        else:
            key, k1, k2 = jax.random.split(key, 3)
            params["output"] = {"w": _torch_linear_default(k1, (W, self.n_out)),
                                "b": _torch_bias_default(k2, self.n_out, W)}
        return params

    def apply(self, params: Dict, x: jnp.ndarray, dtype=None) -> jnp.ndarray:
        """Forward pass (models.py:254-277)."""
        input_pts = x[..., :self.input_ch]
        input_views = x[..., self.input_ch:self.input_ch + self.input_ch_views]
        h = input_pts
        for i, p in enumerate(params["pts"]):
            h = _dense(h, p, dtype)
            h = jax.nn.relu(h)
            if i in self.skips:
                h = jnp.concatenate([input_pts.astype(h.dtype), h], axis=-1)

        if self.use_viewdirs:
            alpha = _dense(h, params["alpha"], dtype)
            feature = _dense(h, params["feature"], dtype)
            h = jnp.concatenate([feature, input_views.astype(feature.dtype)], axis=-1)
            for p in params["views"]:
                h = jax.nn.relu(_dense(h, p, dtype))
            rgb = _dense(h, params["rgb"], dtype)
            return jnp.concatenate([rgb, alpha], axis=-1)
        return _dense(h, params["output"], dtype)

    def macs_per_input(self) -> int:
        W, D = self.width, self.depth
        total = self.input_ch * W
        for i in range(D - 1):
            total += ((W + self.input_ch) if i in self.skips else W) * W
        total += (self.input_ch_views + W) * (W // 2)
        if self.use_viewdirs:
            total += W * W + W * 1 + (W // 2) * 3
        else:
            total += W * self.n_out
        return total

    def param_count(self) -> int:
        def count(p):
            return sum(int(np.prod(v.shape)) for v in jax.tree.leaves(p))
        dummy = self.init(jax.random.PRNGKey(0))
        return count(dummy)


def get_model(config, n_in: int, n_out: int, model_idx: int):
    """Model factory (models.py:363-372): activation 'relu' -> BaseNet,
    'nerf' -> NeRF with viewdirs."""
    i = model_idx
    act = config.activation[i]
    if act == "relu":
        skip = config.skips[i].strip() if i < len(config.skips) else ""
        if "auto" in skip:
            if (config.posEnc and config.posEnc[i]
                    and "RayMarch" in config.inFeatures[i]
                    and config.posEnc[i] == "nerf"):
                skip = auto_skip(skip, config.layers[i], config.posEncArgs[i])
            else:
                skip = ""
        return BaseNetDef(depth=config.layers[i], width=config.layerWidth[i],
                          n_in=n_in, n_out=n_out, skip=skip, net_idx=i)
    elif act == "nerf":
        skip_str = config.skips[i] if i < len(config.skips) else "auto"
        skips = (4,) if 'auto' in skip_str else tuple(int(x) for x in [skip_str])
        input_ch, input_ch_views = 3, 3
        if (config.posEnc and config.posEnc[i] and "RayMarch" in config.inFeatures[i]
                and config.posEnc[i] == "nerf"):
            freq = config.posEncArgs[i].split('-')
            input_ch = int(freq[0]) * 6 + 3
            input_ch_views = int(freq[1]) * 6 + 3
        return NeRFDef(depth=config.layers[i], width=config.layerWidth[i],
                       input_ch=input_ch, input_ch_views=input_ch_views,
                       n_out=n_out, skips=skips, use_viewdirs=True, net_idx=i)
    raise ValueError(f"Unknown activation {act}")


def init_params(model_defs, seed: int = 0):
    key = jax.random.PRNGKey(seed)
    keys = jax.random.split(key, len(model_defs))
    return [d.init(k) for d, k in zip(model_defs, keys)]
