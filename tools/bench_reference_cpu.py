"""Measured same-host baseline: the REFERENCE torch Stage-I step vs ours, on CPU.

The reference publishes no throughput numbers (BASELINE.md), so bench.py's
vs_baseline denominator has been a documented estimate. This tool grounds it:

  1. exports our procedural scene to the reference's GlossySynthetic on-disk
     format (data/GlossySynthetic/<name>/{k}.png + {k}-camera.pkl);
  2. runs the reference's own NeROShapeRenderer train step (torch, from
     /root/reference, monkeypatched .cuda() -> no-op) on this host's CPU;
  3. runs our train step (jax, forced CPU) on the same scene at the same
     ray count;
  4. prints both step times — a measured, same-host, same-scene,
     same-workload framework ratio with no hardware assumptions.

Both run WITHOUT the occlusion branch (step < occ_loss_step) because the
reference's occ path requires its CUDA ray tracer. Run from the repo root.
"""
import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


def export_scene(name: str, kind: str, res: int, views: int) -> str:
    """Write the proc scene in GlossySynthetic format; returns the scene dir."""
    import numpy as np
    from nero_tpu.dataset.database import parse_database_name
    from nero_tpu.utils.image import imsave

    out = f"data/GlossySynthetic/{name}"
    os.makedirs(out, exist_ok=True)
    db = parse_database_name(f"proc/{kind}/{res}_{views}")
    for i, img_id in enumerate(db.get_img_ids()):
        img = db.get_image(img_id)
        imsave(f"{out}/{i}.png", img)
        pose = db.get_pose(img_id).astype(np.float64)
        K = db.get_K(img_id).astype(np.float64)
        with open(f"{out}/{i}-camera.pkl", "wb") as f:
            pickle.dump((pose, K), f)
    return out


def install_reference_stubs():
    """Stub the reference's CUDA/geometry deps that Stage-I training never
    touches (raytracing, open3d, mcubes, trimesh, plyfile, transforms3d),
    and give nvdiffrast.torch a correct pure-torch bilinear `texture` (the
    reference's Stage-I shader uses it for the 256x256 FG LUT lookup)."""
    import math as _math
    import types

    import numpy as np
    import torch

    # the reference predates numpy 2.x, where np.math was removed
    if not hasattr(np, "math"):
        np.math = _math

    class _Missing:
        """Maximally inert placeholder: attribute access and calls chain."""

        def __init__(self, *a, **k):
            pass

        def __call__(self, *a, **k):
            return _Missing()

        def __getattr__(self, item):
            return _Missing()

    def stub(name, **attrs):
        mod = types.ModuleType(name)
        mod.__file__ = "<stub>"   # keep inspect/import machinery happy
        mod.__path__ = []  # mark as package so submodule imports resolve
        # permissive: any attribute not explicitly given resolves to a dummy
        mod.__getattr__ = lambda item: _Missing()
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
        return mod

    for name in ["raytracing", "open3d", "mcubes", "trimesh", "plyfile",
                 "transforms3d", "transforms3d.axangles", "transforms3d.euler",
                 "transforms3d.quaternions", "skimage.metrics"]:
        if name not in sys.modules:
            stub(name)
    if "skimage" not in sys.modules:
        import imageio.v2 as iio
        sk = stub("skimage")
        sk.io = stub("skimage.io",
                     imread=lambda p: np.asarray(iio.imread(p)),
                     imsave=lambda p, im, **k: iio.imwrite(p, im))

    def texture(tex, uv, filter_mode="linear", boundary_mode="clamp"):
        # tex [1,H,W,C], uv [1,A,B,2] in [0,1] -> [1,A,B,C]; texel centers
        # at (i+0.5)/S, clamp at borders (nvdiffrast 'linear'/'clamp').
        _, H, W, C = tex.shape
        u = uv[..., 0] * W - 0.5
        v = uv[..., 1] * H - 0.5
        x0 = torch.clamp(torch.floor(u), 0, W - 1)
        y0 = torch.clamp(torch.floor(v), 0, H - 1)
        x1 = torch.clamp(x0 + 1, 0, W - 1)
        y1 = torch.clamp(y0 + 1, 0, H - 1)
        fx = torch.clamp(u - x0, 0.0, 1.0)[..., None]
        fy = torch.clamp(v - y0, 0.0, 1.0)[..., None]
        t = tex[0]

        def at(y, x):
            return t[y.long(), x.long()]

        out = (at(y0, x0) * (1 - fx) * (1 - fy) + at(y0, x1) * fx * (1 - fy)
               + at(y1, x0) * (1 - fx) * fy + at(y1, x1) * fx * fy)
        return out[None] if out.ndim == 3 else out

    nv = stub("nvdiffrast")
    nv.torch = stub("nvdiffrast.torch", texture=texture)


def patch_torch_cpu():
    """Make the reference's hard-wired .cuda() calls run on CPU."""
    import torch
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.set_default_tensor_type_orig = torch.set_default_tensor_type
    torch.set_default_tensor_type = lambda *a, **k: None
    _randperm = torch.randperm

    def randperm(*a, **k):
        if k.get("device") == "cuda":
            k["device"] = "cpu"
        return _randperm(*a, **k)
    torch.randperm = randperm
    if not torch.cuda.is_available():
        torch.cuda.empty_cache = lambda: None


def bench_reference(scene: str, rays: int, n_steps: int):
    sys.path.insert(0, REF)
    install_reference_stubs()
    patch_torch_cpu()
    import torch
    cwd = os.getcwd()  # reference reads data/GlossySynthetic relative to cwd
    from network.renderer import NeROShapeRenderer
    from network.loss import name2loss

    # the reference writes into a broadcast view (renderer.py:248-249), which
    # current torch rejects on CPU; identical math with materialised tensors
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

    cfg = {
        "database_name": f"syn/{scene}",
        "train_ray_num": rays,
        "validate_initialization": False,
        "val_geometry": False,
    }
    renderer = NeROShapeRenderer(cfg)
    losses = [name2loss[n]({}) for n in ["nerf_render", "eikonal", "std", "init_sdf_reg"]]
    opt = torch.optim.Adam(renderer.parameters(), lr=1e-3)

    def step_once(step):
        opt.zero_grad()
        data = {"step": step}
        outputs = renderer(data)
        log = {}
        for loss in losses:
            log.update(loss(outputs, data, step))
        total = 0
        for k, v in log.items():
            if k.startswith("loss"):
                total = total + torch.mean(v)
        total.backward()
        opt.step()
        return float(total)

    step_idx = 5000  # occ branch inactive; anneal past warmup
    for i in range(2):
        step_once(step_idx + i)
    t0 = time.perf_counter()
    for i in range(n_steps):
        step_once(step_idx + 2 + i)
    dt = (time.perf_counter() - t0) / n_steps
    os.chdir(cwd)
    return dt


def bench_ours_cpu(kind: str, res: int, views: int, rays: int, n_steps: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    # single-core CPU compiles of the full step take tens of minutes; share
    # the tests' persistent compile cache so reruns are instant
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), "tests",
                          ".jax_compile_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    import optax
    from nero_tpu.models.shape import NeROShapeModel

    cfg = {
        "name": "cpu_base", "network": "shape",
        "database_name": f"proc/{kind}/{res}_{views}",
        "train_ray_num": rays,
        "loss": ["nerf_render", "eikonal", "std", "init_sdf_reg"],
        "key_metric_name": "psnr",
    }
    model = NeROShapeModel(cfg, training=True)
    opt = optax.adam(1e-3)
    step_fn = model.make_train_step(opt, donate=False)
    params, opt_state = model.params, opt.init(model.params)
    key = jax.random.PRNGKey(0)
    step_idx = jnp.asarray(5000)
    for i in range(2):
        params, opt_state, log = step_fn(params, opt_state,
                                         jax.random.fold_in(key, i), step_idx,
                                         model.train_data)
    float(log["loss_total"])
    t0 = time.perf_counter()
    for i in range(n_steps):
        params, opt_state, log = step_fn(params, opt_state,
                                         jax.random.fold_in(key, 10 + i),
                                         step_idx, model.train_data)
    float(log["loss_total"])
    return (time.perf_counter() - t0) / n_steps


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--kind", default="sphere")
    parser.add_argument("--res", type=int, default=100)
    parser.add_argument("--views", type=int, default=12)
    parser.add_argument("--rays", type=int, default=512)
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--which", default="both", choices=["ref", "ours", "both"])
    flags = parser.parse_args()

    scene = f"proc_{flags.kind}"
    out = {}
    if flags.which in ("ref", "both"):
        export_scene(scene, flags.kind, flags.res, flags.views)
        ref_s = bench_reference(scene, flags.rays, flags.steps)
        out["reference_torch_cpu_step_s"] = round(ref_s, 3)
        out["reference_torch_cpu_rays_per_s"] = round(flags.rays / ref_s, 1)
    if flags.which in ("ours", "both"):
        ours_s = bench_ours_cpu(flags.kind, flags.res, flags.views, flags.rays,
                                flags.steps)
        out["ours_jax_cpu_step_s"] = round(ours_s, 3)
        out["ours_jax_cpu_rays_per_s"] = round(flags.rays / ours_s, 1)
    if len(out) == 4:
        out["cpu_speed_ratio_ours_over_ref"] = round(
            out["reference_torch_cpu_step_s"] / out["ours_jax_cpu_step_s"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
