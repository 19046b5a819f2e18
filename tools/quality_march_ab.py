"""Training-quality gate for the s18+Illinois-2 march default (VERDICT r4
weak #1 class: no default flip without a training-level gate).

Trains the Stage-II bowl material stage from scratch for N steps with the
old march default (s20 sphere iterations + bisect-8) vs the new one
(s18 + Illinois-2 — 20 field evals/ray instead of 28) — identical
mesh/seeds/losses — and reports the smoothed loss trajectory + final
validation PSNR, the same gate shape as quality_shader_ab.py /
quality_lights_ab.py. Arms are HLO-verified via the march kernel's
name encoding (nero_smarch_s20_r8 vs nero_smarch_s18_r2i).

The bowl is the regime where the visibility approximation bites (cavity
self-occlusion drives the inner/outer light split).

Usage: python tools/quality_march_ab.py [steps=2500] [seed=0]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bowl_mesh():
    import numpy as np

    from nero_tpu.dataset.synthetic import scene_sdf
    from nero_tpu.geometry import native

    sdf = scene_sdf("bowl")
    grid, lo, hi = 128, -1.01, 1.01
    xs = np.linspace(lo, hi, grid).astype(np.float32)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    vals = np.asarray(sdf(np.stack([X, Y, Z], -1).reshape(-1, 3)),
                      np.float32).reshape(grid, grid, grid)
    verts, tris = native.isosurface(vals, 0.0)
    return {"vertices": (verts / (grid - 1.0) * (hi - lo) + lo).astype(np.float32),
            "triangles": tris}


def run(mode: str, n_steps: int, seed: int = 0, mesh=None):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from nero_tpu.core import mfu
    from nero_tpu.models.material import NeROMaterialModel
    from nero_tpu.utils.color import color_map_backward
    from nero_tpu.utils.image import compute_psnr

    march = ({"tracer_n_sphere": 20, "tracer_refine_mode": "bisect",
              "tracer_n_refine": 8} if mode == "bisect8_s20" else
             {"tracer_n_sphere": 18, "tracer_refine_mode": "illinois",
              "tracer_n_refine": 2})
    expect = ({"nero_smarch_s20_r8": True, "nero_smarch_s18_r2i": False}
              if mode == "bisect8_s20" else
              {"nero_smarch_s18_r2i": True, "nero_smarch_s20_r8": False})
    cfg = {
        "name": f"qmarch_{mode}_{seed}", "network": "material",
        "database_name": "proc/bowl/100_12",
        "mesh": mesh if mesh is not None else _bowl_mesh(),
        "train_ray_num": 512,
        "shader_cfg": {"diffuse_sample_num": 512, "specular_sample_num": 256,
                       "human_lights": False,
                       "outer_light_version": "direction"},
        "loss": ["nerf_render", "mat_reg"], "key_metric_name": "psnr",
        "random_seed": seed,
        **march,
    }
    model = NeROMaterialModel(cfg, training=True)
    opt = optax.adam(1e-4)
    step_fn = model.make_train_step(opt, donate=False)
    params, opt_state = model.params, opt.init(model.params)
    key = jax.random.PRNGKey(seed)

    mfu.assert_kernels(step_fn, expect, f"variant {mode}",
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
    out = model.test_step(params, 0)
    gt = color_map_backward(np.asarray(out["rgb_gt"]))
    pred = color_map_backward(np.asarray(out["rgb_pr"]))
    psnr = compute_psnr(gt, pred)
    rec = {"mode": mode, "seed": seed, "final_psnr": round(float(psnr), 3),
           "curve": curve}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2500
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    mesh = _bowl_mesh()
    recs = [run("bisect8_s20", n_steps, seed, mesh),
            run("illinois2_s18", n_steps, seed, mesh)]
    out = f"data/evidence/quality_march_ab_{n_steps}.json"
    os.makedirs("data/evidence", exist_ok=True)
    with open(out, "w") as f:
        json.dump(recs, f, indent=2)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
