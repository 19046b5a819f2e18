"""Stage-II per-component step-time decomposition.

Times sub-jitted pieces of the material train step on the bench_stage2
workload (512 pts x 768 dirs, reference configs/material/syn/*.yaml shape):
  trace        : the neural-tracer march alone over all 393k sample rays
  materials    : feats MLP + 3 predictor heads on the 512 surface points
  outer_light  : IDE + outer-light MLP over all dirs
  inner_light  : PE+IDE + inner-light MLP over all dirs
  fwd          : full mc_shading_apply forward
  step         : full train step (fwd + backward + adam)

All timings use chained-dependency loops with a final host readback (the
axon tunnel returns from block_until_ready early; see IMPLEMENTATION_NOTES).
Prints one JSON line per component.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, n_warm=5, n_steps=20):
    import jax
    out = None
    for _ in range(n_warm):
        out = fn(*args)
    jax.block_until_ready(out)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n_steps):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / n_steps


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from nero_tpu.geometry.isosurface import extract_geometry
    from nero_tpu.models.material import NeROMaterialModel
    from nero_tpu.fields import mc_shading as mc

    verts, tris = extract_geometry(
        [-1, -1, -1], [1, 1, 1], 128, 0.0,
        lambda p: jnp.linalg.norm(p, axis=-1, keepdims=True) - 0.5)
    cfg = {
        "name": "prof_stage2", "network": "material",
        "database_name": "proc/sphere/100_12",
        "mesh": {"vertices": verts, "triangles": tris},
        "train_ray_num": 512,
        "shader_cfg": {"diffuse_sample_num": 512, "specular_sample_num": 256,
                       "human_lights": False, "outer_light_version": "direction"},
        "loss": ["nerf_render", "mat_reg"], "key_metric_name": "psnr",
    }
    model = NeROMaterialModel(cfg, training=True)
    opt = optax.adam(1e-4)
    step_fn = model.make_train_step(opt, donate=False)
    params, mcfg, samples, trace_fn = (model.params, model.mcfg, model.samples,
                                       model.trace_fn)
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(0)
    data = model.train_data
    rn = cfg["train_ray_num"]
    total = 512 + 256

    batch = {k: v[:rn] for k, v in data.items()}
    pts = batch["inters"]
    normals = batch["normals"] / jnp.maximum(
        jnp.linalg.norm(batch["normals"], axis=-1, keepdims=True), 1e-12)
    view = -batch["rays_d"]
    view = view / jnp.maximum(jnp.linalg.norm(view, axis=-1, keepdims=True), 1e-12)
    refl = jnp.sum(view * normals, -1, keepdims=True) * normals * 2 - view
    # representative direction lattice [rn, total, 3]
    kd, ks = jax.random.split(key)
    dirs_d = mc.sample_diffuse_directions(samples["diffuse"], normals, kd)
    rough = jnp.full((rn, 1), 0.1)
    dirs_s = mc.sample_specular_directions(samples["specular"], refl, rough, ks)
    dirs = jax.block_until_ready(jnp.concatenate([dirs_d, dirs_s], 1))
    flat_o = (jnp.broadcast_to(pts[:, None], (rn, total, 3)) + dirs * 1e-5).reshape(-1, 3)
    flat_d = dirs.reshape(-1, 3)

    resolved = mc.resolve_weight_norm(params)

    t = timed(jax.jit(trace_fn), flat_o, flat_d)
    print(json.dumps({"part": "trace", "ms": round(t * 1e3, 2),
                      "rays": int(flat_o.shape[0])}), flush=True)

    t = timed(jax.jit(lambda p, x: mc.predict_materials_mc(p, x)), resolved, pts)
    print(json.dumps({"part": "materials", "ms": round(t * 1e3, 2)}), flush=True)

    t = timed(jax.jit(lambda p, pt, d: mc.predict_outer_lights(p, mcfg, pt, d)),
              resolved, jnp.broadcast_to(pts[:, None], (rn, total, 3)), dirs)
    print(json.dumps({"part": "outer_light", "ms": round(t * 1e3, 2)}), flush=True)

    inters = flat_o.reshape(rn, total, 3)
    t = timed(jax.jit(lambda p, i, d, n: mc.get_inner_lights(p, mcfg, i, d, n)),
              resolved, inters, -dirs, jnp.broadcast_to(normals[:, None], (rn, total, 3)))
    print(json.dumps({"part": "inner_light", "ms": round(t * 1e3, 2)}), flush=True)

    fwd = jax.jit(lambda p, k: mc.mc_shading_apply(
        p, mcfg, samples, trace_fn, pts, view, normals, None, key=k)[0])
    t = timed(fwd, params, key)
    print(json.dumps({"part": "fwd", "ms": round(t * 1e3, 2)}), flush=True)

    def one_step(p, s, k):
        p2, s2, log = step_fn(p, s, k, jnp.asarray(100), data)
        return log["loss_total"]
    t = timed(one_step, params, opt_state, key)
    print(json.dumps({"part": "step", "ms": round(t * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
