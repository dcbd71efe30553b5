#!/usr/bin/env python
"""Per-scene Blender export invocations (reference:
blender_export_per_scene_stub.py): fill in your scene's view cell and run
inside Blender after loading blender_export.py."""

from blender_export import export_view_cells

# Example (the DONeRF-style classroom view cell):
# export_view_cells(
#     SCENE_NAME="classroom",
#     VIEWS_TRAIN=300, VIEWS_VAL=100, VIEWS_TEST=100,
#     RESOLUTION=800,
#     VIEW_CELL_CENTER=[0.0, 0.0, 1.2],
#     VIEW_CELL_SIZE=[0.6, 0.6, 0.6],
#     VIEW_ROT_START=[90.0, 0.0, 0.0],
#     VIEW_ROT_RESTR=[40.0, 0.0, 40.0],
# )
