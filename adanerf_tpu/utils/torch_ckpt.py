"""Reference-checkpoint ingestion: convert the reference's torch
``{name}_{suffix}.weights`` files (torch.save of an nn.Module state_dict,
/root/reference/src/models.py:87-88 and :279-281) into this framework's
flat-key npz param trees, so scenes trained with the CUDA/torch reference
render through the TPU stack for direct quality-parity checks.

torch is used ONLY here (CPU, deserialization); nothing in the compute path
depends on it.

State-dict layouts handled:
  * BaseNet  (models.py:71-75):  ``layers.{i}.weight/bias``
  * NeRF     (models.py:228-244): ``pts_linears.{i}.*``, ``views_linears.0.*``,
    ``feature_linear.*``, ``alpha_linear.*``, ``rgb_linear.*``
    (or ``output_linear.*`` when use_viewdirs=False)

torch Linear stores weight as (out, in); our trees store (in, out), so every
weight transposes. Bias maps 1:1.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def _to_numpy_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if not isinstance(obj, dict):
        # torch sometimes saves the whole module (models.py:106-112)
        obj = obj.state_dict()
    return {k: v.detach().cpu().numpy().astype(np.float32)
            for k, v in obj.items()}


def basenet_flat_from_torch(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """BaseNet state_dict -> flat npz keys ``{i}.w`` / ``{i}.b``."""
    flat = {}
    n_layers = max(int(k.split(".")[1]) for k in sd if k.startswith("layers.")) + 1
    for i in range(n_layers):
        flat[f"{i}.w"] = sd[f"layers.{i}.weight"].T.copy()
        flat[f"{i}.b"] = sd[f"layers.{i}.bias"].copy()
    return flat


def nerf_flat_from_torch(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """NeRF state_dict -> flat npz keys matching NeRFDef.init's tree."""
    flat = {}
    n_pts = max(int(k.split(".")[1]) for k in sd if k.startswith("pts_linears.")) + 1
    for i in range(n_pts):
        flat[f"pts.{i}.w"] = sd[f"pts_linears.{i}.weight"].T.copy()
        flat[f"pts.{i}.b"] = sd[f"pts_linears.{i}.bias"].copy()
    n_views = max((int(k.split(".")[1]) for k in sd
                   if k.startswith("views_linears.")), default=-1) + 1
    for i in range(n_views):
        flat[f"views.{i}.w"] = sd[f"views_linears.{i}.weight"].T.copy()
        flat[f"views.{i}.b"] = sd[f"views_linears.{i}.bias"].copy()
    for ref_name, my_name in (("feature_linear", "feature"),
                              ("alpha_linear", "alpha"),
                              ("rgb_linear", "rgb"),
                              ("output_linear", "output")):
        if f"{ref_name}.weight" in sd:
            flat[f"{my_name}.w"] = sd[f"{ref_name}.weight"].T.copy()
            flat[f"{my_name}.b"] = sd[f"{ref_name}.bias"].copy()
    return flat


def convert_torch_checkpoint(src: str, dst: str = None) -> str:
    """Convert one reference .weights file to this framework's npz format.

    The model family is detected from the state-dict keys. The output keeps
    the reference filename (``{name}_{suffix}.weights``) so
    TrainState.load_latest_weights picks it up unchanged.
    """
    sd = _to_numpy_state_dict(src)
    if any(k.startswith("layers.") for k in sd):
        flat = basenet_flat_from_torch(sd)
    elif any(k.startswith("pts_linears.") for k in sd):
        flat = nerf_flat_from_torch(sd)
    else:
        raise ValueError(f"unrecognized state dict in {src}: "
                         f"{sorted(sd)[:5]}...")
    dst = dst or src
    np.savez(dst, **flat)
    if os.path.exists(dst + ".npz"):
        os.replace(dst + ".npz", dst)
    return dst


def convert_experiment_dir(src_dir: str, dst_dir: str, suffix: str = None):
    """Convert every model checkpoint of a reference experiment directory.

    Picks the newest suffix per model name when `suffix` is None (mirrors
    models.py:143-146 load_latest_weights ordering).
    """
    os.makedirs(dst_dir, exist_ok=True)
    done = []
    for f in sorted(os.listdir(src_dir)):
        if not f.endswith(".weights") or "_opt.weights" in f:
            continue
        if suffix is not None and not f.endswith(f"_{suffix}.weights"):
            continue
        out = convert_torch_checkpoint(os.path.join(src_dir, f),
                                       os.path.join(dst_dir, f))
        done.append(out)
    if not done:
        detail = f" with suffix '{suffix}'" if suffix is not None else ""
        raise FileNotFoundError(
            f"no model .weights files{detail} in {src_dir}")
    return done
