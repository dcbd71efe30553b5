#!/usr/bin/env python
"""On-device fused-train-kernel gradient check (VERDICT r4 weak #5).

tests/test_train_kernel.py verifies the fused Pallas train kernel's grads
against stock bf16 autodiff only in INTERPRET mode at tile=64; production
runs tile=512 on real Mosaic. This script runs the same comparison on the
real device at the production tile and a production-shaped batch
(2 x 2048 rays x 128 samples = 524288 rows, the reference dense-training
workload: /root/reference/configs/dense_training.ini:23-24,
src/train.py:300-337 AMP-backward semantics), so a tile-boundary or
accumulation-order bug invisible to interpret mode would show here.

Prints per-leaf max relative |Δ| and a PASS/FAIL line; the max goes into
BENCH.md.

Parameter-gradient leaves are judged relative to each leaf's own max|ref|.
The input-gradient leaf (grad wrt x) is judged by ABSOLUTE delta: its
reference magnitude is ~1e-6 at this batch size (mean-loss over 2M
elements), so a relative criterion only measures bf16 noise — and in the
production train step that cotangent dead-ends anyway, because oracle depth
is detached before sampling (reference semantics:
/root/reference/src/nerf_raymarch_common.py:644,703), so x is a function of
stop_gradient'ed values and constants.

Usage: python tools/check_train_kernel_grads.py [--tile 512] [--rows 524288]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--rows", type=int, default=2 * 2048 * 128)
    ap.add_argument("--tol", type=float, default=2e-2)
    ap.add_argument("--x-atol", type=float, default=1e-6,
                    help="absolute tolerance for the input-gradient leaf")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from adanerf_tpu.models.mlp import NeRFDef
    from adanerf_tpu.ops.pallas.train_kernel import make_nerf_train_apply

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    # the flagship shading net: 8x256, skip at 4, 10-4 encoding -> 63+27 in
    d = NeRFDef(depth=8, width=256, input_ch=63, input_ch_views=27, n_out=4,
                skips=(4,), use_viewdirs=True)
    p = d.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (args.rows, 90), jnp.float32)
    t = jax.random.normal(jax.random.PRNGKey(2), (args.rows, 4), jnp.float32)
    apply_k = make_nerf_train_apply(d, tile=args.tile, interpret=False)

    def loss_ref(pp, xx):
        return jnp.mean((d.apply(pp, xx, dtype=jnp.bfloat16) - t) ** 2)

    def loss_k(pp, xx):
        return jnp.mean((apply_k(pp, xx) - t) ** 2)

    t0 = time.perf_counter()
    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(p, x)
    g_ref = jax.device_get(g_ref)
    print(f"stock-XLA bf16 grads: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    g_k = jax.jit(jax.grad(loss_k, argnums=(0, 1)))(p, x)
    g_k = jax.device_get(g_k)
    print(f"fused-kernel grads (tile={args.tile}): "
          f"{time.perf_counter() - t0:.1f}s")

    # g_ref/g_k are (param_grads, x_grad); judge params relatively, x
    # absolutely (see module docstring).
    paths_ref = jax.tree_util.tree_flatten_with_path(g_ref[0])[0]
    leaves_k = jax.tree_util.tree_leaves(g_k[0])
    worst = 0.0
    worst_name = ""
    for (path, a), b in zip(paths_ref, leaves_k):
        name = ".".join(str(getattr(q, 'key', getattr(q, 'idx', q)))
                        for q in path)
        scale = float(np.max(np.abs(a))) + 1e-12
        rel = float(np.max(np.abs(np.asarray(a) - np.asarray(b)))) / scale
        print(f"  {name:<40} max|ref|={scale:.3e}  max rel delta={rel:.3e}")
        if rel > worst:
            worst, worst_name = rel, name
    dx_abs = float(np.max(np.abs(np.asarray(g_ref[1]) - np.asarray(g_k[1]))))
    dx_scale = float(np.max(np.abs(np.asarray(g_ref[1]))))
    print(f"  {'<input x> (absolute criterion)':<40} "
          f"max|ref|={dx_scale:.3e}  max abs delta={dx_abs:.3e}")
    ok = worst < args.tol and dx_abs < args.x_atol
    print(f"{'PASS' if ok else 'FAIL'}: worst param max-rel-delta "
          f"{worst:.3e} ({worst_name}) vs tol {args.tol}; input-grad max "
          f"abs delta {dx_abs:.3e} vs atol {args.x_atol}; tile={args.tile}, "
          f"rows={args.rows}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
