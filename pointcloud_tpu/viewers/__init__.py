"""Interactive viewers (reference: pc_viewer.py / ae_viewer.py /
live_ae_viewer.py). Windowing deps (open3d/plotly) are optional; everything
degrades to matplotlib and headless PNG export, and the pred/target
assembly logic lives in `reconstruct` so it is testable without a display."""

from pointcloud_tpu.viewers.reconstruct import (
    assemble_prediction,
    aa_lines,
    load_viewer_model,
)

__all__ = ["assemble_prediction", "aa_lines", "load_viewer_model"]
