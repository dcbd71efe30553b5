#!/usr/bin/env python
"""Batch evaluation over experiment directories (reference: src/evaluate.py:565-662):
discover experiment subdirs under the log dir, re-hydrate each from its echoed
config.ini, compute quality metrics + complexity, skip already-done runs."""

import argparse
import os
import sys


from adanerf_tpu.platform import apply_platform_env

def main():
    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument('-data', '--data', required=True, type=str)
    p.add_argument('-log', '--logDir', required=True, type=str)
    p.add_argument('-d', '--device', default=0, type=int)
    p.add_argument('--evaluations', default=[], action='append', type=str)
    p.add_argument('--skip', default=[], action='append', type=str)
    p.add_argument('--outDir', default=None, type=str)
    p.add_argument('--force', default=False, action='store_true',
                   help='re-evaluate even if opt epoch already evaluated')
    cl = p.parse_args()

    from adanerf_tpu.evaluation.evaluate import evaluate, load_config

    # discover experiment dirs: logDir/<dataset>/<experiment> or direct
    candidates = []
    if os.path.exists(os.path.join(cl.logDir, "config.ini")):
        candidates.append(cl.logDir)
    else:
        for root, dirs, files in os.walk(cl.logDir):
            if "config.ini" in files:
                candidates.append(root)
                dirs.clear()

    if not candidates:
        print(f"no experiment directories found under {cl.logDir}")
        return 1

    for path in sorted(candidates):
        print(f"Evaluating {path}")
        status, ts = load_config(cl.data, cl.device, path,
                                 list(cl.evaluations), list(cl.skip),
                                 cl_out_dir=cl.outDir,
                                 skip_if_already_done_once=not cl.force)
        if status != 0:
            continue
        evals = list(cl.evaluations) or \
            [e for e in ["complexity", "images", "flip", "psnr", "ssim",
                         "output_images"] if e not in cl.skip]
        evaluate(ts, None, evals)
    return 0


if __name__ == "__main__":
    sys.exit(main())
