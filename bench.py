"""Benchmark: Stage-I training throughput (rays/sec/chip) on real hardware.

Runs the flagship shape-model training step (512 rays x (64+64 inner + 32 bg
samples), full losses incl. the post-20k occlusion march — the steady-state
workload of reference configs/shape/syn/bell.yaml) on a procedural scene and
reports sustained rays/sec.

Baseline: the reference publishes no throughput numbers (BASELINE.md). NeRO
Stage I is commonly reported at ~0.25s/step on an A100 for the same 512-ray
step (~2.0k rays/s); BASELINE.json's target is >=5x A100 rays/sec/chip, i.e.
vs_baseline is reported against 2048 rays/s so vs_baseline >= 5 is the goal.
"""
import json
import time

A100_BASELINE_RAYS_PER_SEC = 2048.0


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from nero_tpu.models.shape import NeROShapeModel

    cfg = {
        "name": "bench_stage1",
        "network": "shape",
        "database_name": "proc/sphere/128_16",
        "train_ray_num": 512,
        "occ_loss_step": 20000,
        "loss": ["nerf_render", "eikonal", "std", "init_sdf_reg", "occ"],
        "key_metric_name": "psnr",
    }
    model = NeROShapeModel(cfg, training=True)
    opt = optax.adam(1e-3)
    step_fn = model.make_train_step(opt, donate=False)
    params = model.params
    opt_state = opt.init(params)
    data = model.train_data
    key = jax.random.PRNGKey(0)

    # steady-state step index: occ loss branch active (dominant late-training cost)
    step_idx = jnp.asarray(25000)

    # warmup: long enough to flush compiles AND the runtime's deferred work
    # (the axon tunnel defers real execution past block_until_ready; a host
    # readback is the only true sync)
    for i in range(12):
        params, opt_state, log = step_fn(params, opt_state,
                                         jax.random.fold_in(key, i), step_idx, data)
        if i % 4 == 3:
            float(log["loss_total"])

    n_steps = 30
    t0 = time.perf_counter()
    for i in range(n_steps):
        params, opt_state, log = step_fn(params, opt_state,
                                         jax.random.fold_in(key, 100 + i), step_idx, data)
    float(log["loss_total"])  # chain sync: every step feeds the next
    dt = time.perf_counter() - t0

    rays_per_sec = n_steps * cfg["train_ray_num"] / dt
    print(json.dumps({
        "metric": "stage1_train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / A100_BASELINE_RAYS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
