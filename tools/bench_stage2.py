"""Stage-II training throughput benchmark (secondary to bench.py).

Measures the full-config material step — 512 surface points x (512 diffuse +
256 specular) traced sample directions, all losses — on a procedurally
generated mesh, using the default neural-visibility tracer.

Prints one JSON line: points/s plus the effective traced-rays/s inside the
step. Reference workload: configs/material/syn/*.yaml (SURVEY.md §6).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from nero_tpu.geometry.isosurface import extract_geometry
    from nero_tpu.models.material import NeROMaterialModel

    verts, tris = extract_geometry(
        [-1, -1, -1], [1, 1, 1], 128, 0.0,
        lambda p: jnp.linalg.norm(p, axis=-1, keepdims=True) - 0.5)
    cfg = {
        "name": "bench_stage2", "network": "material",
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
    params = model.params
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(0)

    # long warmup: flush compiles + the runtime's deferred work
    for i in range(8):
        params, opt_state, log = step_fn(params, opt_state,
                                         jax.random.fold_in(key, i),
                                         jnp.asarray(i), model.train_data)
        if i % 3 == 2:
            float(log["loss_total"])

    n = 20
    t0 = time.perf_counter()
    for i in range(n):
        params, opt_state, log = step_fn(params, opt_state,
                                         jax.random.fold_in(key, 100 + i),
                                         jnp.asarray(100 + i),
                                         model.train_data)
    float(log["loss_total"])
    dt = (time.perf_counter() - t0) / n

    pts_per_sec = cfg["train_ray_num"] / dt
    dirs = (cfg["shader_cfg"]["diffuse_sample_num"]
            + cfg["shader_cfg"]["specular_sample_num"])
    print(json.dumps({
        "metric": "stage2_train_points_per_sec_per_chip",
        "value": round(pts_per_sec, 1),
        "unit": "points/s",
        "step_ms": round(dt * 1000, 1),
        "traced_rays_per_sec": round(pts_per_sec * dirs, 0),
    }))


if __name__ == "__main__":
    main()
