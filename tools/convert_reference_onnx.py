#!/usr/bin/env python
"""Convert a reference viewer sample directory (trained ONNX models +
config.ini + dataset_info.txt, e.g.
/root/reference/adanerf_real_time_viewer/sample/) into this framework's
export-directory format, runnable directly by viewer.py / bench.py
--export-dir / tools/eval_megakernel.py.

The ONNX initializer names are the reference torch modules' state-dict names
(models.py:198-268), so the existing torch->npz key mapping applies after a
transpose; no onnx package needed (utils/onnx_weights.py wire parser).

Usage: python tools/convert_reference_onnx.py <sample_dir> <out_dir>
"""

import os
import sys
from shutil import copyfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adanerf_tpu.utils.onnx_weights import load_onnx_weights
from adanerf_tpu.utils.torch_ckpt import (basenet_flat_from_torch,
                                          nerf_flat_from_torch)


def main():
    src, dst = sys.argv[1], sys.argv[2]
    os.makedirs(dst, exist_ok=True)
    for i in range(2):
        sd = load_onnx_weights(os.path.join(src, f"model{i}.onnx"))
        if any(k.startswith("layers.") for k in sd):
            flat = basenet_flat_from_torch(sd)
        else:
            flat = nerf_flat_from_torch(sd)
        out = os.path.join(dst, f"model{i}.weights")
        np.savez(out, **flat)
        if os.path.exists(out + ".npz"):
            os.replace(out + ".npz", out)
        print(f"model{i}: {len(sd)} tensors -> {out}")
    for name in ("config.ini", "dataset_info.txt"):
        copyfile(os.path.join(src, name), os.path.join(dst, name))
    print(f"export dir ready: {dst}")


if __name__ == "__main__":
    main()
