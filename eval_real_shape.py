"""Chamfer distance between two externally prepared point clouds (PLY).

Parity: reference eval_real_shape.py (CloudCompare workflow, eval.md:20-30).
"""
import argparse

from nero_tpu.geometry.chamfer import chamfer_distance
from nero_tpu.geometry.mesh_io import read_ply


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--pr", type=str, required=True, help="predicted point cloud (ply)")
    parser.add_argument("--gt", type=str, required=True, help="ground-truth point cloud (ply)")
    flags = parser.parse_args()

    pr = read_ply(flags.pr)["vertices"]
    gt = read_ply(flags.gt)["vertices"]
    chamfer, d01, d10 = chamfer_distance(pr, gt)
    print(f"chamfer {chamfer:.6f} pr-to-gt {d01:.6f} gt-to-pr {d10:.6f}")


if __name__ == "__main__":
    main()
