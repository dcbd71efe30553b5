"""The model cascade: oracle -> sampler -> shading -> composite, as one pure
function traced into a single XLA program.

Functional equivalent of ``TrainConfig.inference`` (src/train_data.py:278-299):
each stage's input feature set builds the MLP input from the batch + previous
stage outputs, the model runs, and the input feature's postprocess composites.
"""

from __future__ import annotations

from typing import Dict, List

import jax

from .keys import FSK


def run_cascade(model_defs, params, f_in, batch: Dict, is_inference=False,
                key=None, dtype=None, apply_fns=None):
    """Run all stages; returns (postprocessed_outs, inference_dicts).

    model_defs: list of BaseNetDef/NeRFDef; params: list of param pytrees;
    f_in: list of input FeatureSet instances; batch: DatasetKeys dict.
    apply_fns: optional per-stage override of ``def.apply`` — used by the
    train step to route the shading MLP through the fused Pallas
    forward+backward kernel (ops/pallas/train_kernel.py) on TPU.
    """
    postprocessed = []
    dicts: List[Dict] = []
    n = len(model_defs)
    keys = jax.random.split(key, n) if key is not None else [None] * n

    for i in range(n):
        d = f_in[i].batch(batch, prev_outs=dicts, is_inference=is_inference,
                          key=keys[i])
        x = d[FSK.input_feature_batch]
        if apply_fns is not None and apply_fns[i] is not None:
            d[FSK.network_output] = apply_fns[i](params[i], x)
        else:
            d[FSK.network_output] = model_defs[i].apply(params[i], x,
                                                        dtype=dtype)
        f_in[i].postprocess(d, batch)
        postprocessed.append(d[FSK.postprocessed_network_output])
        dicts.append(d)

    return postprocessed, dicts
