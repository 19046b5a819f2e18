"""Stage-II visibility-tracer quality ablation on a trained checkpoint.

Loads the Stage-II material checkpoint trained with the neural tracer on the
concave bowl scene and re-renders the validation view with each visibility
backend (neural distilled field, exact SDF-grid, exact XLA-wavefront BVH).
The PSNR spread isolates the quality cost of the approximate tracer on
geometry with real self-occlusion (VERDICT round-1 item 3 ablation).

Usage: python tools/ablate_stage2_tracer.py [--out data/demo_bowl] [--tracers neural,grid,bvh]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, default="data/demo_bowl")
    parser.add_argument("--scene", type=str, default="bowl")
    parser.add_argument("--res", type=int, default=100)
    parser.add_argument("--steps1", type=int, default=30000)
    parser.add_argument("--ckpt", type=str, default=None,
                        help="stage-2 checkpoint (default <out>/model/demo_material_neural/model.npz)")
    parser.add_argument("--tracers", type=str, default="neural,grid,bvh")
    flags = parser.parse_args()

    from nero_tpu.core.checkpoint import load_checkpoint
    from nero_tpu.models.material import NeROMaterialModel
    from nero_tpu.utils.color import color_map_backward
    from nero_tpu.utils.image import compute_psnr
    import numpy as np

    ckpt = flags.ckpt or f"{flags.out}/model/demo_material_neural/model.npz"
    mesh_path = f"{flags.out}/demo_shape-{flags.steps1}.ply"
    db = f"proc/{flags.scene}/{flags.res}_12"

    results = {}
    ref_img = None
    for tracer in flags.tracers.split(","):
        cfg = {
            "name": f"ablate_{tracer}", "network": "material",
            "database_name": db, "mesh": mesh_path, "tracer": tracer,
            "shader_cfg": {"diffuse_sample_num": 128, "specular_sample_num": 64,
                           "human_lights": False, "outer_light_version": "direction"},
            "loss": ["nerf_render", "mat_reg"], "key_metric_name": "psnr",
            "downsample_ratio": 0.5,
        }
        t0 = time.time()
        model = NeROMaterialModel(cfg, training=True)
        _, _, params, _ = load_checkpoint(ckpt, model.params)
        out = model.test_step(params, 0)
        gt = color_map_backward(np.asarray(out["rgb_gt"]))
        pred = color_map_backward(np.asarray(out["rgb_pr"]))
        results[tracer] = {
            "psnr": round(compute_psnr(gt, pred), 3),
            "eval_seconds": round(time.time() - t0, 1),
        }
        if tracer == flags.tracers.split(",")[0]:
            ref_img = pred.astype(np.float64)
        else:
            mse = np.mean((pred.astype(np.float64) - ref_img) ** 2)
            results[tracer]["psnr_vs_first"] = round(
                10 * np.log10(255.0 ** 2 / max(mse, 1e-12)), 2)
        print(json.dumps({tracer: results[tracer]}), flush=True)

    print(json.dumps(results, indent=1))
    with open(f"{flags.out}/tracer_ablation.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
