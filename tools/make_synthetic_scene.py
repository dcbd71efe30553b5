#!/usr/bin/env python
"""Generate a synthetic DONeRF-format scene (colored unit sphere in a view
cell) so the full train -> test -> evaluate -> export -> viewer loop can be
exercised without downloading the DONeRF dataset.

Writes the exact directory layout the data layer expects (the layout the
reference's datasets read, datasets.py:162-344): ``dataset_info.json``,
``transforms_{train,val,test}.json`` and per-split image folders, optionally
with ``*_depth.npz`` ground-truth depth for depth-supervised oracle training.

Usage:
    python tools/make_synthetic_scene.py out_scene -s 128 128 --n-train 16 --depth
    python train.py -c configs/dense_training.ini -data out_scene -log logs/demo
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out", help="output scene directory")
    ap.add_argument("-s", "--size", type=int, nargs=2, default=(64, 64),
                    metavar=("W", "H"))
    ap.add_argument("--n-train", type=int, default=8)
    ap.add_argument("--n-val", type=int, default=2)
    ap.add_argument("--n-test", type=int, default=2)
    ap.add_argument("--depth", action="store_true",
                    help="write ground-truth *_depth.npz (needed for "
                         "depth-supervised oracle losses)")
    ap.add_argument("--objects", choices=["sphere", "multi", "translucent"],
                    default="sphere",
                    help="'multi': layered multi-sphere scene with a wide "
                         "view cell (parallax forces 2-3 oracle samples/px); "
                         "'translucent': glass shells + enclosing room — "
                         "every ray crosses several semi-transparent "
                         "surfaces (multi-sample oracle regime)")
    ap.add_argument("--cell-frac", type=float, default=0.2,
                    help="pose jitter as a fraction of the view cell size")
    a = ap.parse_args()

    from scene_utils import make_scene
    make_scene(a.out, w=a.size[0], h=a.size[1], n_train=a.n_train,
               n_val=a.n_val, n_test=a.n_test, with_depth=a.depth,
               objects=a.objects, cell_frac=a.cell_frac)
    print(f"wrote synthetic scene to {a.out} "
          f"({a.size[0]}x{a.size[1]}, {a.n_train}/{a.n_val}/{a.n_test} "
          f"train/val/test, depth={a.depth}, objects={a.objects})")


if __name__ == "__main__":
    main()
