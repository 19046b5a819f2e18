"""Training-quality gate for the whole-shader fused kernel (fused_shader).

Trains the Stage-I bowl scene from scratch for N steps with the XLA shader
vs the fused whole-shader Pallas kernel (identical seeds/data/losses) and
reports the smoothed loss_rgb trajectory, final low-res validation PSNR and
geometry endpoints — the same gate shape as tools/quality_grad_ab.py. The
kernel additionally stores HEAD WEIGHTS in bf16 (the XLA bf16_hidden path
only casts activations), so the bar is "identical per-step learning within
run-to-run noise".

Usage: python tools/quality_shader_ab.py [steps=2000] [seed=0] [human]
  `human` switches to the GlossyReal regime gate: the capture scene
  (camera-collocated light) with human_light + sphere_direction, XLA vs
  the kernel's human leg (shader_kernel.py::_human_block).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(fused: bool, n_steps: int, seed: int = 0, human: bool = False):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from nero_tpu.models.shape import NeROShapeModel
    from nero_tpu.utils.color import color_map_backward
    from nero_tpu.utils.image import compute_psnr
    from nero_tpu.core import mfu

    mode = ("human_" if human else "") + ("fused" if fused else "xla")
    scene = "capture" if human else "bowl"
    shader = {"fused_shader": fused}
    if human:
        shader.update({"human_light": True, "sphere_direction": True})
    cfg = {
        "name": f"qshader_{mode}_{seed}", "network": "shape",
        "database_name": f"proc/{scene}/100_12",
        "train_ray_num": 512,
        "occ_loss_step": n_steps // 2,
        "loss": ["nerf_render", "eikonal", "std", "init_sdf_reg", "occ"],
        "key_metric_name": "psnr",
        "shader_config": shader,
        "downsample_ratio": 0.5,
    }
    model = NeROShapeModel(cfg, training=True)
    opt = optax.adam(5e-4)
    step_fn = model.make_train_step(opt, donate=False)
    params, opt_state = model.params, opt.init(model.params)
    key = jax.random.PRNGKey(seed)

    # Fail loudly if the fused variant silently fell back to the XLA shader
    # (off-TPU / unsupported topology) — the A/B would be vacuous (ADVICE r3).
    mfu.assert_kernels(step_fn, {"nero_shader_": fused}, f"variant {mode}",
                       params, opt_state, jax.random.fold_in(key, 0),
                       jnp.asarray(0), model.train_data)

    losses, curve = [], {}
    for i in range(n_steps):
        params, opt_state, log = step_fn(
            params, opt_state, jax.random.fold_in(key, i),
            jnp.asarray(i), model.train_data)
        losses.append(log["loss_rgb"])
        if (i + 1) % max(n_steps // 10, 1) == 0:
            sm = float(np.mean([float(v) for v in losses[-20:]]))
            curve[i + 1] = round(sm, 5)
            print(json.dumps({"mode": mode, "step": i + 1, "loss_rgb": sm}),
                  flush=True)
    out = model.test_step(params, 0, step=n_steps)
    gt = color_map_backward(np.asarray(out["gt_rgb"]))
    pred = color_map_backward(np.asarray(out["ray_rgb"]))
    psnr = compute_psnr(gt, pred)

    from nero_tpu.dataset.database import (get_database_eval_points,
                                           parse_database_name)
    from nero_tpu.dataset.synthetic import scene_sdf
    from nero_tpu.fields.sdf import sdf_value
    from nero_tpu.geometry.chamfer import chamfer_distance
    from nero_tpu.geometry.isosurface import extract_geometry

    scfg = model.scfg
    verts, tris = extract_geometry(
        [-1.01] * 3, [1.01] * 3, 128, 0.0,
        lambda p: sdf_value(params["sdf"], p, scfg.sdf_cfg))
    gt_pts = get_database_eval_points(parse_database_name(f"proc/{scene}/256_24"),
                                      voxel_size=0.005)
    chamfer, _, _ = chamfer_distance(np.asarray(verts), gt_pts)
    sdf_mae = float(np.abs(scene_sdf(scene)(np.asarray(verts))).mean())
    rec = {"mode": mode, "seed": seed, "final_psnr": round(float(psnr), 3),
           "chamfer": round(float(chamfer), 5),
           "mesh_sdf_mae": round(sdf_mae, 5), "curve": curve}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    human = "human" in sys.argv[3:]
    recs = [run(False, n_steps, seed, human), run(True, n_steps, seed, human)]
    tag = "_human" if human else ""
    out = f"data/evidence/quality_shader_ab{tag}_{n_steps}.json"
    os.makedirs("data/evidence", exist_ok=True)
    with open(out, "w") as f:
        json.dump(recs, f, indent=2)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
