"""Same-scene convergence comparison: reference torch Stage-I vs nero_tpu.

Trains BOTH frameworks from scratch on the identical exported procedural
scene for N steps (same 512-ray workload, occ branch off, lr 1e-3 constant)
and records the smoothed loss_rgb trajectory. The curves answer "does the
TPU-first rebuild learn the same thing at the same rate per step?" with the
reference's own optimizer and losses as the control.

Run the two halves in separate processes (torch and jax both want the core):
  python tools/compare_reference_convergence.py --which ref   --steps 300
  python tools/compare_reference_convergence.py --which ours  --steps 300
Results accumulate in data/ref_convergence.json.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "data/ref_convergence.json"


def save(key, curve, meta):
    data = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            data = json.load(f)
    data[key] = {"loss_rgb": curve, **meta}
    # drop raw curves over 2k points to keep the json reviewable
    if len(curve) > 2000:
        data[key]["loss_rgb"] = curve[:: len(curve) // 2000]
    with open(OUT, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps({key: meta}))


def run_reference(scene, rays, n_steps):
    from tools.bench_reference_cpu import (bench_reference, export_scene,
                                           install_reference_stubs,
                                           patch_torch_cpu)
    export_scene(scene, "sphere", 100, 12)
    sys.path.insert(0, "/root/reference")
    install_reference_stubs()
    patch_torch_cpu()
    import time

    import torch
    from network.loss import name2loss
    from network.renderer import NeROShapeRenderer

    import torch.nn.functional as F

    def get_human_coordinate_poses(self, poses):
        pn = poses.shape[0]
        cam_cen = (-poses[:, :, :3].permute(0, 2, 1) @ poses[:, :, 3:])[..., 0]
        if not self.cfg["fixed_camera"]:
            cam_cen = cam_cen.clone()
            cam_cen[..., 2] = 0
        Y = torch.zeros(pn, 3)
        Y[:, 2] = -1.0
        Z = poses[:, 2, :3].clone()
        Z[:, 2] = 0
        Z = F.normalize(Z, dim=-1)
        X = torch.cross(Y, Z, dim=-1)
        R = torch.stack([X, Y, Z], 1)
        t = -R @ cam_cen[:, :, None]
        return torch.cat([R, t], -1)

    NeROShapeRenderer.get_human_coordinate_poses = get_human_coordinate_poses

    torch.manual_seed(0)
    cfg = {"database_name": f"syn/{scene}", "train_ray_num": rays,
           "validate_initialization": False, "val_geometry": False}
    renderer = NeROShapeRenderer(cfg)
    losses = [name2loss[n]({}) for n in
              ["nerf_render", "eikonal", "std", "init_sdf_reg"]]
    opt = torch.optim.Adam(renderer.parameters(), lr=1e-3)

    curve = []
    t0 = time.time()
    for step in range(n_steps):
        opt.zero_grad()
        outputs = renderer({"step": step})
        log = {}
        for loss in losses:
            log.update(loss(outputs, {"step": step}, step))
        total = 0
        for k, v in log.items():
            if k.startswith("loss"):
                total = total + torch.mean(v)
        total.backward()
        opt.step()
        curve.append(float(torch.mean(log["loss_rgb"]).detach()))
        if (step + 1) % 20 == 0:
            print(f"ref step {step + 1}: loss_rgb "
                  f"{sum(curve[-20:]) / 20:.4f}", flush=True)
    save("reference", curve, {"steps": n_steps, "rays": rays,
                              "wall_s": round(time.time() - t0, 1)})


def run_ours(rays, n_steps, platform=None):
    import time

    import jax
    if platform:
        os.environ["JAX_PLATFORMS"] = platform
        jax.config.update("jax_platforms", platform)
    if jax.default_backend() != "tpu":
        jax.config.update("jax_compilation_cache_dir",
                          os.path.abspath("tests/.jax_compile_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    import optax
    from nero_tpu.models.shape import NeROShapeModel

    cfg = {"name": "conv_ours", "network": "shape",
           "database_name": "proc/sphere/100_12", "train_ray_num": rays,
           "loss": ["nerf_render", "eikonal", "std", "init_sdf_reg"],
           "key_metric_name": "psnr",
           # head-to-head parity: evaluate the background NeRF on the inner
           # lattice exactly like the reference render equation
           # (renderer.py:567-572); the fast default skips it (~0.04 dB)
           "bg_on_inner": True}
    model = NeROShapeModel(cfg, training=True)
    opt = optax.adam(1e-3)
    step_fn = model.make_train_step(opt, donate=False)
    params, opt_state = model.params, opt.init(model.params)
    key = jax.random.PRNGKey(0)

    curve = []
    t0 = time.time()
    for step in range(n_steps):
        params, opt_state, log = step_fn(params, opt_state,
                                         jax.random.fold_in(key, step),
                                         jnp.asarray(step), model.train_data)
        curve.append(float(log["loss_rgb"]))
        if (step + 1) % 20 == 0:
            print(f"ours step {step + 1}: loss_rgb "
                  f"{sum(curve[-20:]) / 20:.4f}", flush=True)
    save("nero_tpu", curve, {"steps": n_steps, "rays": rays,
                             "wall_s": round(time.time() - t0, 1)})


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--which", choices=["ref", "ours"], required=True)
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--rays", type=int, default=512)
    parser.add_argument("--platform", default=None,
                        help="force a jax platform for --which ours (e.g. cpu);"
                             " default = whatever the session provides (TPU "
                             "under axon) — per-step learning is hardware-"
                             "independent")
    flags = parser.parse_args()
    if flags.which == "ref":
        run_reference("proc_sphere", flags.rays, flags.steps)
    else:
        run_ours(flags.rays, flags.steps, flags.platform)


if __name__ == "__main__":
    main()
