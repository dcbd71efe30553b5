"""Loss registry: the AdaNeRF oracle loss (epoch-blended L1 against the
shading network's alphas) plus the standard members.

Functional rebuild of ``src/losses.py``. Every loss is a pure function
``loss(outputs, targets, inference_dicts, epoch) -> scalar``; the epoch enters
as a traced value so the blending schedule compiles into the training step.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from .keys import FSK


def _mse(a, b):
    return jnp.mean((a - b) ** 2)


def _l1(a, b):
    return jnp.mean(jnp.abs(a - b))


class MSELoss:
    weight_attr = True

    def __init__(self, config=None, net_idx=-1):
        pass

    def __call__(self, outputs, targets, inference_dicts=None, epoch=None,
                 inference_dict=None):
        return _mse(outputs, targets)


class LimitedDepthMSELoss:
    """MSE ignoring target pixels at/above the ignore value (losses.py:11-22):
    such targets are replaced by the prediction, zeroing their residual."""

    def __init__(self, config=None, net_idx=-1):
        self.ignore_value = config.multiDepthIgnoreValue[net_idx]

    def __call__(self, outputs, targets, inference_dicts=None, epoch=None,
                 inference_dict=None):
        sel = jnp.where(targets < self.ignore_value, targets,
                        jax.lax.stop_gradient(outputs))
        return _mse(outputs, sel)


class MultiDepthLimitedMSELoss:
    """Bipartite-matched multi-depth MSE (losses.py:25-52): greedily assign
    each target depth to its nearest remaining prediction, then limited MSE."""

    def __init__(self, config=None, net_idx=-1):
        self.ignore_value = config.multiDepthIgnoreValue[net_idx]

    def __call__(self, outputs, targets, inference_dicts=None, epoch=None,
                 inference_dict=None):
        k = targets.shape[-1]
        big = jnp.finfo(outputs.dtype).max

        def assign(carry, i):
            out_cpy, resort = carry
            sel_t = jax.lax.dynamic_slice_in_dim(targets, i, 1, axis=1)
            ids = jnp.argmin(jnp.abs(out_cpy - sel_t), axis=-1)
            out_cpy = out_cpy.at[jnp.arange(out_cpy.shape[0]), ids].set(big)
            resort = jax.lax.dynamic_update_slice_in_dim(
                resort, ids[:, None], i, axis=1)
            return (out_cpy, resort), None

        out_cpy = jax.lax.stop_gradient(outputs)
        resort = jnp.zeros(targets.shape, jnp.int32)
        (out_cpy, resort), _ = jax.lax.scan(assign, (out_cpy, resort),
                                            jnp.arange(k))
        shuffled = jnp.take_along_axis(outputs, resort, axis=-1)
        sel = jnp.where(targets != self.ignore_value, targets,
                        jax.lax.stop_gradient(shuffled))
        return _mse(shuffled, sel)


class MSEPlusWeightAccum:
    """MSE + (sum of compositing weights should reach 1) regularizer
    (losses.py:55-84)."""
    requires_alpha_beta = True

    def __init__(self, config=None, net_idx=-1):
        self.loss_alpha = config.lossAlpha[net_idx]
        self.loss_beta = config.lossBeta[net_idx]
        self.asymmetric = True

    def __call__(self, outputs, targets, inference_dicts=None, epoch=None,
                 inference_dict=None):
        d = inference_dict if inference_dict is not None else inference_dicts
        if isinstance(d, list):
            d = d[-1]
        w_sum = jnp.sum(d[FSK.nerf_weights_output], axis=1)
        if self.asymmetric:
            w_sum = jnp.minimum(w_sum, 1.0)
        loss_w = _mse(w_sum, jnp.ones_like(w_sum))
        return self.loss_alpha * _mse(outputs, targets) + self.loss_beta * loss_w


class BCEWithLogitsLoss:
    def __init__(self, config=None, net_idx=-1):
        pass

    def __call__(self, outputs, targets, inference_dicts=None, epoch=None,
                 inference_dict=None):
        # numerically stable mean BCE with logits
        return jnp.mean(jnp.maximum(outputs, 0) - outputs * targets
                        + jnp.log1p(jnp.exp(-jnp.abs(outputs))))


class CrossEntropyLoss:
    def __init__(self, config=None, net_idx=-1, weights=None):
        self.weights = weights

    def __call__(self, outputs, targets, inference_dicts=None, epoch=None,
                 inference_dict=None):
        logp = jax.nn.log_softmax(outputs, axis=-1)
        targets = targets.astype(jnp.int32).reshape(-1)
        nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
        if self.weights is not None:
            w = self.weights[targets]
            return jnp.sum(nll * w) / jnp.sum(w)
        return jnp.mean(nll)


class NeRFWeightMultiplicationLoss:
    """The AdaNeRF oracle loss (losses.py:87-153): epoch-blended L1 of the
    oracle's 128 outputs against ones / zeros / the shading net's weights or
    (premultiplied) alphas. ``factor = clip((epoch - start)/duration, 0, 1)``;
    One fades out as Zero/NerfA fade in (the One->Zero->NerfA schedule)."""

    def __init__(self, config=None, net_idx=-1):
        self.net_idx = net_idx
        self.loss_components = list(config.lossComponents)
        self.blend_factors = list(config.lossComponentBlending)
        self.blending_start = config.lossBlendingStart
        self.blending_interval = config.lossBlendingDuration

    def __call__(self, outputs, targets, inference_dicts=None, epoch=None,
                 inference_dict=None):
        dicts = inference_dicts if inference_dicts is not None else inference_dict
        nxt = dicts[self.net_idx + 1]
        nerf_weights = nxt[FSK.nerf_weights_output]
        nerf_alpha = nxt[FSK.nerf_alpha_output]

        epoch = jnp.asarray(epoch, jnp.float32)
        factor = jnp.clip((epoch - self.blending_start) / self.blending_interval,
                          0.0, 1.0)

        total = 0.0
        for i, name in enumerate(self.loss_components):
            bf = self.blend_factors[i]
            if name == "One":
                loss = _l1(outputs, jnp.ones_like(outputs))
                blend = 1.0 - factor * (1.0 - bf) if bf > 0.0 else 1.0 - factor
            elif name == "Zero":
                loss = _l1(outputs, jnp.zeros_like(outputs))
                blend = factor * bf if bf > 0.0 else factor
            elif name == "NerfW":
                loss = _l1(outputs, nerf_weights)
                blend = factor * bf if bf > 0.0 else factor
            elif name == "NerfA":
                loss = _l1(outputs, nerf_alpha)
                blend = factor * bf if bf > 0.0 else factor
            else:
                continue
            total = total + blend * loss
        return total


def get_loss_by_name(name: str, config, net_idx: int):
    """Loss registry (losses.py:176-198)."""
    if name == "MSE":
        return MSELoss(config, net_idx)
    if name == "LimitedDepthMSE":
        return LimitedDepthMSELoss(config, net_idx)
    if name == "MultiDepthLimitedMSE":
        return MultiDepthLimitedMSELoss(config, net_idx)
    if name == "MSEPlusWeightAccum":
        return MSEPlusWeightAccum(config, net_idx)
    if name == "BCEWithLogitsLoss":
        return BCEWithLogitsLoss(config, net_idx)
    if name == "CrossEntropyLoss":
        return CrossEntropyLoss(config, net_idx)
    if name == "CrossEntropyLossWeighted":
        import jax.numpy as jnp
        w = jnp.ones(config.multiDepthFeatures[net_idx] + 1, jnp.float32)
        w = w.at[-1].set(0.0)
        return CrossEntropyLoss(config, net_idx, weights=w)
    if name == "NeRFWeightMultiplicationLoss":
        return NeRFWeightMultiplicationLoss(config, net_idx)
    if name.lower() == "none":
        return None
    raise ValueError(f"Loss {name} unknown")
