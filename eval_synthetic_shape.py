"""Chamfer-distance evaluation of an extracted mesh on GlossySynthetic scenes.

Parity: reference eval_synthetic_shape.py — ground-truth points fused from
test-view depths (dataset/database.py:435-458), predicted points from
rasterized mesh depth at the test views, both voxel-downsampled at 0.01,
symmetric brute-force Chamfer on the accelerator, result appended to
data/geometry.log.
"""
import argparse
import os
from pathlib import Path

import numpy as np

from nero_tpu.dataset.database import (get_database_eval_points,
                                       get_database_split, parse_database_name,
                                       voxel_downsample)
from nero_tpu.geometry.chamfer import chamfer_distance
from nero_tpu.geometry.mesh_io import read_ply
from nero_tpu.geometry.native import rasterize_depth
from nero_tpu.utils.pose import mask_depth_to_pts, pose_apply, pose_inverse


def mesh_points_from_views(mesh, database, test_ids, voxel_size=0.01):
    verts = mesh["vertices"]
    tris = mesh["triangles"]
    pts_all = []
    for img_id in test_ids:
        K = database.get_K(img_id)
        pose = database.get_pose(img_id)
        img = database.get_image(img_id)
        h, w = img.shape[:2]
        verts_cam = pose_apply(pose, verts).astype(np.float32)
        depth = rasterize_depth(verts_cam, tris, K, h, w)
        mask = depth > 0
        pts_cam = mask_depth_to_pts(mask, depth, K)
        pts_all.append(pose_apply(pose_inverse(pose), pts_cam))
    pts = np.concatenate(pts_all, 0).astype(np.float32)
    return voxel_downsample(pts, voxel_size)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mesh", type=str, required=True)
    parser.add_argument("--object", type=str, required=True,
                        help="database name, e.g. syn/bell")
    parser.add_argument("--log", type=str, default="data/geometry.log")
    flags = parser.parse_args()

    database = parse_database_name(flags.object)
    gt_pts = get_database_eval_points(database)
    split = "test" if flags.object.startswith("syn") else "validation"
    _, test_ids = get_database_split(database, split)

    mesh = read_ply(flags.mesh)
    pr_pts = mesh_points_from_views(mesh, database, test_ids)

    chamfer, d01, d10 = chamfer_distance(pr_pts, gt_pts)
    stem = Path(flags.mesh).stem
    msg = f"{stem} {chamfer:.6f} pr-to-gt {d01:.6f} gt-to-pr {d10:.6f}"
    print(msg)
    Path(os.path.dirname(flags.log) or ".").mkdir(exist_ok=True, parents=True)
    with open(flags.log, "a") as f:
        f.write(msg + "\n")


if __name__ == "__main__":
    main()
