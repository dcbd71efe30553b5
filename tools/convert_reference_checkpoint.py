#!/usr/bin/env python
"""Convert reference (torch) AdaNeRF checkpoints into this framework's npz
format.

The reference trainer saves one ``{model_name}_{suffix}.weights`` torch file
per network (/root/reference/src/models.py:87-88); this tool rewrites them as
flat-key npz trees under the same filenames, so an experiment directory
trained with the CUDA/torch reference can be pointed at directly by
``--preTrained`` / ``load_latest_weights`` and rendered on TPU.

Usage:
  python tools/convert_reference_checkpoint.py SRC [DST]
  python tools/convert_reference_checkpoint.py SRC_DIR DST_DIR [--suffix 300000]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from adanerf_tpu.utils.torch_ckpt import (convert_experiment_dir,
                                          convert_torch_checkpoint)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src", help=".weights file or experiment directory")
    ap.add_argument("dst", nargs="?", default=None,
                    help="output file/directory (default: in place / src)")
    ap.add_argument("--suffix", default=None,
                    help="only convert checkpoints with this name suffix")
    args = ap.parse_args()

    if os.path.isdir(args.src):
        done = convert_experiment_dir(args.src, args.dst or args.src,
                                      suffix=args.suffix)
        for d in done:
            print(f"converted {d}")
    else:
        print(f"converted {convert_torch_checkpoint(args.src, args.dst)}")


if __name__ == "__main__":
    main()
