"""Surface nets vs marching tetrahedra: decompose the Chamfer floor.

VERDICT r1 #10: the demo Chamfer floored at ~0.011 and it was unclear how
much is extraction artifact vs eval artifact (the gt point cloud's voxel
downsampling). This tool extracts the SAME SDF with both extractors and
reports, per method: Chamfer against the database's fused eval points, and
the analytic surface error |sdf(verts)| (pure extraction quality, no eval
artifacts). If both methods show the same Chamfer but very different
|sdf(verts)|, the floor is the eval cloud, not the extraction.

Usage: python tools/compare_isosurface.py [--scene sphere|bowl] [--res 128]
       [--ckpt <shape model dir>]   # default: extract the analytic SDF
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--scene", type=str, default="sphere",
                        choices=["sphere", "bowl"])
    parser.add_argument("--res", type=int, default=128)
    parser.add_argument("--db_res", type=int, default=256)
    parser.add_argument("--n_views", type=int, default=24)
    parser.add_argument("--voxel", type=float, default=0.005)
    flags = parser.parse_args()

    import numpy as np

    from nero_tpu.dataset.database import (get_database_eval_points,
                                           parse_database_name)
    from nero_tpu.dataset.synthetic import scene_sdf
    from nero_tpu.geometry.chamfer import chamfer_distance
    from nero_tpu.geometry.isosurface import extract_geometry

    sdf = scene_sdf(flags.scene)

    # jnp twin of the analytic SDF (extract_fields jits the query)
    import jax.numpy as jnp
    from nero_tpu.dataset import synthetic as syn

    if flags.scene == "sphere":
        def query(p):
            return jnp.linalg.norm(p, axis=-1, keepdims=True) - 0.5
    else:
        def query(p):
            r = jnp.linalg.norm(p, axis=-1)
            shell = jnp.abs(r - syn.BOWL_SHELL_R) - syn.BOWL_SHELL_TH
            bowl = jnp.maximum(shell, p[..., 2] - syn.BOWL_RIM_Z)
            ball = jnp.linalg.norm(p - jnp.asarray(syn.BOWL_BALL_C),
                                   axis=-1) - syn.BOWL_BALL_R
            return jnp.minimum(bowl, ball)[..., None]

    db = parse_database_name(f"proc/{flags.scene}/{flags.db_res}_{flags.n_views}")
    gt_pts = get_database_eval_points(db, voxel_size=flags.voxel)

    report = {}
    for method in ["surface_nets", "marching_tets"]:
        verts, tris = extract_geometry([-1.01] * 3, [1.01] * 3, flags.res, 0.0,
                                       query, method=method)
        chamfer, _, _ = chamfer_distance(verts, gt_pts)
        sdf_err = np.abs(sdf(verts))
        report[method] = {
            "verts": int(len(verts)),
            "tris": int(len(tris)),
            "chamfer_vs_eval_points": round(float(chamfer), 5),
            "surface_err_mean": round(float(sdf_err.mean()), 6),
            "surface_err_p99": round(float(np.percentile(sdf_err, 99)), 6),
        }
    # the eval-cloud artifact floor: chamfer of EXACT surface samples
    # against the same eval points (no extraction involved at all)
    rng = np.random.RandomState(0)
    p = rng.normal(size=(60000, 3))
    p /= np.linalg.norm(p, axis=-1, keepdims=True)
    if flags.scene == "sphere":
        exact = (p * 0.5).astype(np.float32)
    else:
        # project random points onto the level set by sphere-stepping the SDF
        exact = rng.uniform(-0.55, 0.55, (200000, 3)).astype(np.float32)
        for _ in range(25):
            d = sdf(exact)[:, None]
            g = np.stack([
                sdf(exact + [1e-4, 0, 0]) - sdf(exact - [1e-4, 0, 0]),
                sdf(exact + [0, 1e-4, 0]) - sdf(exact - [0, 1e-4, 0]),
                sdf(exact + [0, 0, 1e-4]) - sdf(exact - [0, 0, 1e-4])], -1) / 2e-4
            g /= np.maximum(np.linalg.norm(g, axis=-1, keepdims=True), 1e-9)
            exact = exact - d * g
        exact = exact[np.abs(sdf(exact)) < 1e-4][:60000]
    chamfer_floor, _, _ = chamfer_distance(exact, gt_pts)
    report["eval_cloud_floor"] = {
        "chamfer_exact_surface_vs_eval_points": round(float(chamfer_floor), 5)}
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
