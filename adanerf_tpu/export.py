"""Export trained models for the real-time benchmark harness.

Viewer-parity path (reference: src/export.py:28-97): instead of ONNX models
consumed by TensorRT, export (a) the weights as npz, (b) ``dataset_info.txt``
with the same fields the C++ viewer parses (config.cpp / dataset_info.txt),
(c) the echoed ``config.ini``, and (d) AOT-serialized XLA executables of the
two inference stages when the runtime supports it. The realtime harness
(adanerf_tpu/realtime.py + viewer.py) consumes this directory the way the
TensorRT viewer consumes the ONNX export dir.
"""

from __future__ import annotations

import os
from shutil import copyfile

import numpy as np


def write_pos_enc(n_freqs, f):
    """Frequency-band dump (reference: export.py:15-25)."""
    bands = 2.0 ** np.linspace(0.0, n_freqs - 1, n_freqs)
    for frq in bands:
        f.write(str(np.float32(frq)) + "\n")


def write_dataset_info(ts, out_dir):
    """dataset_info.txt with the viewer's fields (export.py:47-54)."""
    info = ts.dataset_info
    with open(os.path.join(out_dir, "dataset_info.txt"), "w") as f:
        f.write("view_cell_center = " + str(info.view.view_cell_center) + "\n")
        f.write("view_cell_size = " + str(info.view.view_cell_size) + "\n")
        f.write("depth_range = " + str(info.depth_range_warped) + "\n")
        f.write("fov = " + str(info.view.fov) + "\n")
        f.write("focal = " + str(info.view.focal) + "\n")
        f.write("camera_scale = " + str(info.view.camera_scale) + "\n")
        f.write("max_depth = " + str(info.depth_max) + "\n")
        # training resolution: the NDC ray transform (ops/raymarch.py::
        # ndc_rays) is resolution-dependent, so NDC exports must render at
        # the trained W/H (the reference viewer reads it from its scene
        # config the same way)
        f.write("resolution = [" + str(info.w) + ", " + str(info.h) + "]\n")


def export_artifacts(ts, out_dir=None, aot=True, batch_size=80_000):
    """Export everything the realtime harness needs."""
    import jax

    from .train_state import save_tree

    out_dir = out_dir or ts.config_file.logDir
    os.makedirs(out_dir, exist_ok=True)

    write_dataset_info(ts, out_dir)

    # weights per model, named like the training checkpoints
    for i, d in enumerate(ts.model_defs):
        save_tree(os.path.join(out_dir, f"model{i}.weights"), ts.params[i])

    # model{i}.onnx for the reference's TensorRT viewer (two-way artifact
    # interop; reference: src/export.py:82-85). Same graph layout as the
    # shipped viewer samples, weights under the torch state-dict names.
    from .utils.onnx_export import write_model_onnx
    for i, d in enumerate(ts.model_defs):
        params_host = jax.tree.map(np.asarray, ts.params[i])
        write_model_onnx(os.path.join(out_dir, f"model{i}.onnx"),
                         d, params_host)

    # echoed config for the harness (the viewer parses the same file)
    cfg_src = os.path.join(ts.logDir, "config.ini")
    if os.path.exists(cfg_src):
        copyfile(cfg_src, os.path.join(out_dir, "config.ini"))

    # positional encoding frequency tables
    with open(os.path.join(out_dir, "pos_enc.txt"), "w") as f:
        for i in range(len(ts.model_defs)):
            args = ts.config_file.posEncArgs[i].split('-')
            f.write(f"# net {i}\n")
            if args[0] != "none":
                write_pos_enc(int(args[0]), f)

    # AOT compile + serialize the two inference stages (the XLA analog of the
    # TensorRT engine build, imagegenerator.cpp:84-201 — seconds, not hours)
    if aot:
        try:
            from .realtime import RealtimeRenderer
            rt = RealtimeRenderer(ts.model_defs, ts.params, ts.scene,
                                  ts.config_file, batch_size=batch_size)
            import jax.numpy as jnp
            from jax import export as jax_export

            dirs = jnp.zeros((batch_size, 3), jnp.float32)
            pose = jnp.zeros((3,), jnp.float32)
            rot = jnp.eye(3)
            exp = jax_export.export(jax.jit(rt._oracle_stage))(
                ts.params[0], pose, rot, dirs)
            with open(os.path.join(out_dir, "stage0_oracle.xla"), "wb") as f:
                f.write(exp.serialize())
            print(f"exported AOT stage0 to {out_dir}")
        except Exception as e:  # AOT export is best-effort per backend
            print(f"AOT export skipped: {e}")

    print(f"export complete: {out_dir}")
    return out_dir
