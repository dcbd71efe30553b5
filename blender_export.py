#!/usr/bin/env python
"""Blender view-cell dataset exporter (reference: blender_export.py:125-192).

Runs INSIDE Blender's python (`blender scene.blend -b -P blender_export.py`):
renders view-cell-sampled camera poses to images + depth .npz + the
transforms_{train,val,test}.json files the data layer consumes. Gated on bpy
(not available in this environment); the synthetic-scene generator in
tests/scene_utils.py produces the same directory layout for CI.
"""

import json
import os
import random as rnd
from math import radians
from types import SimpleNamespace

import numpy as np

try:
    import bpy
    import mathutils  # noqa: F401
    HAS_BPY = True
except ImportError:
    HAS_BPY = False


def listify_matrix(matrix):
    return [list(row) for row in matrix]


def random_camera_pos(cfg):
    return tuple(cfg.VIEW_CELL_CENTER[i]
                 + (rnd.random() - 0.5) * cfg.VIEW_CELL_SIZE[i] for i in range(3))


def random_camera_rot(cfg):
    return tuple(radians(cfg.VIEW_ROT_START[i]
                         + (rnd.random() - 0.5) * cfg.VIEW_ROT_RESTR[i])
                 for i in range(3))


def render_set(cfg, fp, scene, subf, num_views):
    """Render one split: place the camera at random view-cell poses, save
    color + depth + pose json (reference: renderSet, blender_export.py:38-118)."""
    cam = scene.objects[cfg.CAM_NAME]
    out_data = {
        'camera_angle_x': bpy.data.objects[cfg.CAM_NAME].data.angle_x,
        'view_cell_center': cfg.VIEW_CELL_CENTER,
        'view_cell_size': cfg.VIEW_CELL_SIZE,
        'random_seed': cfg.SEED,
    }
    cam.rotation_euler = [radians(a) for a in cfg.VIEW_ROT_START]
    cam.location = tuple(cfg.VIEW_CELL_CENTER)
    bpy.context.view_layer.update()
    out_data['camera_base_orientation'] = listify_matrix(cam.matrix_world)
    out_data['frames'] = []

    for i in range(cfg.VIEWS_OFFSET, cfg.VIEWS_OFFSET + num_views):
        cam.location = random_camera_pos(cfg)
        cam.rotation_euler = random_camera_rot(cfg)
        bpy.context.view_layer.update()

        name = f"{subf}/{i:04d}"
        file_path = os.path.join(fp, name)
        scene.render.filepath = file_path
        if not (cfg.SKIP_EXISTING_FILES and os.path.exists(file_path + ".png")):
            bpy.ops.render.render(write_still=True)
            # depth from the viewer node's Z pass
            pixels = bpy.data.images[cfg.RENDER_IMG_NAME].pixels
            depth = np.array(pixels[:])[0::4]
            depth = depth.reshape(cfg.RESOLUTION_Y, cfg.RESOLUTION_X)
            np.savez_compressed(file_path + "_depth.npz", depth=depth)

        out_data['frames'].append({
            'file_path': './' + name,
            'rotation': 0,
            'transform_matrix': listify_matrix(cam.matrix_world),
        })

    with open(os.path.join(fp, f'transforms_{subf}.json'), 'w') as f:
        json.dump(out_data, f, indent=4)


def export_view_cells(SEED=42, DEBUG=False, VIEWS_CAM_PATH=40, VIEWS=None,
                      VIEWS_TRAIN=None, VIEWS_VAL=None, VIEWS_TEST=None,
                      VIEWS_OFFSET=0, RESOLUTION=800, RESOLUTION_X=None,
                      RESOLUTION_Y=None, COLOR_DEPTH=8, FORMAT='PNG',
                      VIEW_CELL_CENTER=None, VIEW_CELL_SIZE=None,
                      VIEW_ROT_START=None, VIEW_ROT_RESTR=None,
                      SKIP_EXISTING_FILES=True, CAM_NAME="renderCam",
                      RENDER_IMG_NAME="Viewer Node", SCENE_NAME=None):
    """Reference entry point (blender_export.py:125-192)."""
    if not HAS_BPY:
        raise RuntimeError("blender_export requires Blender's bpy module; "
                           "run inside Blender: blender scene.blend -b -P "
                           "blender_export.py")
    if SCENE_NAME is None:
        raise ValueError("Please specify SCENE_NAME")
    if VIEW_CELL_CENTER is None or VIEW_CELL_SIZE is None \
            or VIEW_ROT_START is None or VIEW_ROT_RESTR is None:
        raise ValueError("VIEW_CELL* and VIEWS_* parameters must be specified")

    cfg = SimpleNamespace()
    cfg.SEED = SEED
    rnd.seed(SEED)
    cfg.VIEWS_TRAIN = VIEWS_TRAIN or VIEWS
    cfg.VIEWS_VAL = VIEWS_VAL or VIEWS
    cfg.VIEWS_TEST = VIEWS_TEST or VIEWS
    cfg.VIEWS_OFFSET = VIEWS_OFFSET
    cfg.RESOLUTION_X = RESOLUTION_X or RESOLUTION
    cfg.RESOLUTION_Y = RESOLUTION_Y or RESOLUTION
    cfg.COLOR_DEPTH = COLOR_DEPTH
    cfg.FORMAT = FORMAT
    cfg.VIEW_CELL_CENTER = VIEW_CELL_CENTER
    cfg.VIEW_CELL_SIZE = VIEW_CELL_SIZE
    cfg.VIEW_ROT_START = VIEW_ROT_START
    cfg.VIEW_ROT_RESTR = VIEW_ROT_RESTR
    cfg.SKIP_EXISTING_FILES = SKIP_EXISTING_FILES
    cfg.CAM_NAME = CAM_NAME
    cfg.RENDER_IMG_NAME = RENDER_IMG_NAME
    cfg.RESULTS_PATH = (f"{SCENE_NAME}_{VIEW_CELL_CENTER}_{VIEW_CELL_SIZE}_"
                        f"{VIEW_ROT_RESTR}_{VIEWS}")

    scene = bpy.context.scene
    scene.render.resolution_x = cfg.RESOLUTION_X
    scene.render.resolution_y = cfg.RESOLUTION_Y
    fp = os.path.abspath(cfg.RESULTS_PATH)
    for subf, n in (('train', cfg.VIEWS_TRAIN), ('test', cfg.VIEWS_TEST),
                    ('val', cfg.VIEWS_VAL)):
        os.makedirs(os.path.join(fp, subf), exist_ok=True)
        render_set(cfg, fp, scene, subf, n)


if __name__ == "__main__":
    if not HAS_BPY:
        print(__doc__)
    else:
        export_view_cells()
