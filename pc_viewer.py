#!/usr/bin/env python
"""Inspect one npz dataset frame, split by class (reference pc_viewer.py:10-60).

Usage: python pc_viewer.py input/Cube/train/0.npz [--save out.png]
"""

import argparse

import numpy as np

from pointcloud_tpu.viewers.plot import show_clouds


def main():
    p = argparse.ArgumentParser()
    p.add_argument("file", type=str, help=".npz frame to inspect")
    p.add_argument("--save", default=None, help="save a PNG instead of showing")
    p.add_argument("--by_class", action="store_true", default=True)
    a = p.parse_args()

    data = np.load(a.file, allow_pickle=True)
    points = data["points"]
    rgb = data.get("rgb", np.full_like(points, 0.5))
    clouds = []
    if "segmentation" in data and "classes" in data:
        labels = data["segmentation"][:, 0].astype(int)
        for idx, (name, color) in enumerate(data["classes"]):
            sel = labels == idx
            n = int(sel.sum())
            print(f"class {idx} {name}: {n} points ({n / len(labels):.1%})")
            if n:
                clouds.append(
                    (points[sel], np.tile(np.asarray(color, np.float32), (n, 1)), name)
                )
    else:
        clouds.append((points, rgb, "cloud"))
    if "ground_truth" in data:
        from pointcloud_tpu.viewers.reconstruct import aa_lines

        for name, value in data["ground_truth"]:
            v = np.asarray(value)
            if v.shape == (3,):
                pts, cols = aa_lines(v, [0, 1, 0])
                clouds.append((pts, cols, f"gt:{name}"))
    show_clouds(clouds, mode="overlap", save=a.save, title=a.file)


if __name__ == "__main__":
    main()
