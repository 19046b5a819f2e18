"""End-to-end two-stage pipeline demo on the procedural scene (no data needed).

Runs, at reduced scale: Stage-I training -> mesh extraction -> Chamfer eval
-> Stage-II training -> material/texture export -> environment-light export.
Everything a GlossySynthetic run does, on the analytic test scene.

Usage: python tools/run_pipeline_demo.py [--steps1 N] [--steps2 N] [--out DIR]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps1", type=int, default=2000)
    parser.add_argument("--steps2", type=int, default=1000)
    parser.add_argument("--res", type=int, default=100)
    parser.add_argument("--mesh_res", type=int, default=128)
    parser.add_argument("--out", type=str, default="data/demo")
    parser.add_argument("--scene", type=str, default="sphere",
                        choices=["sphere", "bowl", "mirror", "capture"])
    parser.add_argument("--mesh_method", type=str, default="surface_nets",
                        choices=["surface_nets", "marching_tets"])
    parser.add_argument("--tracers2", type=str, default="neural",
                        help="comma list of Stage-II visibility backends to "
                             "ablate (neural,grid,bvh)")
    # production cadences for reference-scale runs (reference
    # configs/shape/syn/bell.yaml:30-34: val 5000 / ckpt 1000; material
    # configs: val 5000 / ckpt 500). Default 0 = demo behavior (val once).
    parser.add_argument("--val_interval1", type=int, default=0)
    parser.add_argument("--save_interval1", type=int, default=0)
    parser.add_argument("--val_interval2", type=int, default=0)
    parser.add_argument("--save_interval2", type=int, default=0)
    flags = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nero_tpu.train.trainer import Trainer

    os.makedirs(flags.out, exist_ok=True)
    db = f"proc/{flags.scene}/{flags.res}_12"
    report = {}

    # ---------------- Stage I ----------------
    t0 = time.time()
    cfg1 = {
        "name": "demo_shape", "network": "shape", "database_name": db,
        "total_step": flags.steps1,
        "val_interval": flags.val_interval1 or flags.steps1,
        "save_interval": flags.save_interval1 or max(flags.steps1 // 2, 1),
        "train_log_step": 100,
        "lr_cfg": {"end_warm": 200, "end_iter": flags.steps1},
        "occ_loss_step": flags.steps1 // 2, "anneal_end": flags.steps1 // 4,
        "freeze_inv_s_step": flags.steps1 // 10,
        "loss": ["nerf_render", "eikonal", "std", "init_sdf_reg", "occ"],
        "val_metric": ["shape_render"], "key_metric_name": "psnr",
        "eikonal_weight": 0.1, "model_root": f"{flags.out}/model",
        "downsample_ratio": 0.5,
    }
    # 'capture' exercises the GlossyReal config path end to end: the scene is
    # lit by a camera-collocated point light, the situation the human_light
    # head models (reference configs/shape/real/bear.yaml:7)
    if flags.scene == "capture":
        cfg1["shader_config"] = {"human_light": True}
    trainer1 = Trainer(cfg1)
    params1 = trainer1.run()
    report["stage1_seconds"] = round(time.time() - t0, 1)

    # validation PSNR of the final model
    out = trainer1.model.test_step(params1, 0, step=flags.steps1)
    from nero_tpu.utils.color import color_map_backward
    from nero_tpu.utils.image import compute_psnr
    report["stage1_psnr"] = round(compute_psnr(
        color_map_backward(out["gt_rgb"]), color_map_backward(out["ray_rgb"])), 2)

    # ---------------- mesh extraction + eval ----------------
    from nero_tpu.fields.sdf import sdf_value
    from nero_tpu.geometry.isosurface import extract_geometry
    from nero_tpu.geometry.mesh_io import write_ply

    scfg = trainer1.model.scfg
    verts, tris = extract_geometry(
        [-1.01, -1.01, -1.01], [1.01, 1.01, 1.01], flags.mesh_res, 0.0,
        lambda p: sdf_value(params1["sdf"], p, scfg.sdf_cfg),
        method=flags.mesh_method)
    mesh_path = f"{flags.out}/demo_shape-{flags.steps1}.ply"
    write_ply(mesh_path, verts, tris)
    report["mesh_verts"] = int(len(verts))

    from nero_tpu.dataset.database import (get_database_eval_points,
                                           parse_database_name)
    from nero_tpu.geometry.chamfer import chamfer_distance
    # eval cloud from a DENSER view set of the same scene (256px x 24 views,
    # 0.005 voxel): the old 0.02-voxel cloud floored Chamfer at ~0.016, making
    # real geometry gains invisible (VERDICT r2 #8; floor decomposition in
    # tools/compare_isosurface.py)
    eval_db = f"proc/{flags.scene}/256_24"
    gt_pts = get_database_eval_points(parse_database_name(eval_db),
                                      voxel_size=0.005)
    chamfer, _, _ = chamfer_distance(verts, gt_pts)
    report["chamfer"] = round(float(chamfer), 5)
    # analytic truth: distance of mesh vertices to the scene's exact SDF
    from nero_tpu.dataset.synthetic import scene_sdf
    sdf_err = np.abs(scene_sdf(flags.scene)(verts))
    report["mesh_sdf_mae"] = round(float(sdf_err.mean()), 5)
    if flags.scene == "sphere":
        r = np.linalg.norm(verts, axis=-1)
        report["mesh_radius_mae"] = round(float(np.abs(r - 0.5).mean()), 5)

    # ---------------- Stage II (per visibility backend) ----------------
    trainer2 = params2 = None
    for tracer in flags.tracers2.split(","):
        t0 = time.time()
        cfg2 = {
            "name": f"demo_material_{tracer}", "network": "material",
            "database_name": db,
            "mesh": mesh_path, "total_step": flags.steps2, "tracer": tracer,
            "val_interval": flags.val_interval2 or flags.steps2,
            "save_interval": flags.save_interval2 or max(flags.steps2 // 2, 1),
            "train_log_step": 100,
            "lr_cfg": {"end_warm": 100, "end_iter": flags.steps2},
            "shader_cfg": {"diffuse_sample_num": 128, "specular_sample_num": 64,
                           # GlossyReal material deltas (reference
                           # configs/material/real/bear.yaml:14) on 'capture'
                           "human_lights": flags.scene == "capture",
                           "outer_light_version": ("sphere_direction"
                                                   if flags.scene == "capture"
                                                   else "direction")},
            "loss": ["nerf_render", "mat_reg"], "val_metric": ["mat_render"],
            "key_metric_name": "psnr", "model_root": f"{flags.out}/model",
        }
        trainer2 = Trainer(cfg2)
        params2 = trainer2.run()
        report[f"stage2_seconds_{tracer}"] = round(time.time() - t0, 1)

        out2 = trainer2.model.test_step(params2, 0)
        report[f"stage2_psnr_{tracer}"] = round(compute_psnr(
            color_map_backward(out2["rgb_gt"]), color_map_backward(out2["rgb_pr"])), 2)
    report["stage2_psnr"] = report[f"stage2_psnr_{flags.tracers2.split(',')[0]}"]

    # ---------------- exports ----------------
    mats = trainer2.model.predict_materials(params2)
    np.save(f"{flags.out}/metallic.npy", mats["metallic"])
    np.save(f"{flags.out}/roughness.npy", mats["roughness"])
    np.save(f"{flags.out}/albedo.npy", mats["albedo"])

    from extract_materials_texture_map import bake_textures
    from nero_tpu.utils.image import imsave
    albedo, metallic, roughness, _ = bake_textures(trainer2.model, params2,
                                                   resolution=256)
    imsave(f"{flags.out}/albedo.jpg", (albedo * 255 + 0.5).astype(np.uint8))

    env = trainer2.model.env_light(64, 128, params2)
    imsave(f"{flags.out}/env_light.png",
           (np.clip(env, 0, 1) * 255 + 0.5).astype(np.uint8))

    print(json.dumps(report, indent=2))
    with open(f"{flags.out}/report.json", "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
