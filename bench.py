"""Benchmark: Stage-I training throughput (rays/sec/chip) + MFU on real hardware.

Runs the flagship shape-model training step (512 rays x (64+64 inner + 32 bg
samples), full losses incl. the post-20k occlusion march — the steady-state
workload of reference configs/shape/syn/bell.yaml) on a procedural scene and
reports sustained rays/sec, step time, FLOPs/step (XLA compiled cost
analysis), and MFU against the chip's published bf16 peak.

Baseline denominator (vs_baseline): the reference publishes NO throughput
numbers anywhere in its tree (BASELINE.md) and no A100 measurement exists in
this sandbox, so the denominator is a DERIVED ESTIMATE, stated openly:
  reference step = 512 rays x (64 uniform + 4x16 importance) inner samples
  with an 8x256 SDF MLP double-backprop + NeRF++ background + shading MLPs
  (reference network/renderer.py:84-92, configs/shape/syn/bell.yaml:30-34);
  NeuS-class renderers of this shape are commonly reported around ~4 steps/s
  on an A100 — 0.25 s/step x 512 rays => 2048 rays/s.
A measured same-host cross-check now exists (round 2): the reference's OWN
torch Stage-I step, imported from /root/reference and monkeypatched onto this
host's CPU, runs at 10.27 s/step = 49.9 rays/s on the identical exported
scene and ray count (tools/bench_reference_cpu.py; BASELINE.md "Measured
same-host cross-check"). The 2,048 rays/s A100 estimate stays as the stable
denominator so vs_baseline remains comparable across rounds, but it is now
anchored by a measurement rather than assumption alone.
"""
import json
import time

A100_BASELINE_RAYS_PER_SEC = 2048.0  # estimate: 512 rays / 0.25 s-per-step (see module docstring)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from nero_tpu.core.mfu import compiled_flops, mfu, peak_flops_per_sec
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

    flops_per_step = compiled_flops(step_fn, params, opt_state, key, step_idx, data)

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

    step_s = dt / n_steps
    rays_per_sec = cfg["train_ray_num"] / step_s
    print(json.dumps({
        "metric": "stage1_train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / A100_BASELINE_RAYS_PER_SEC, 3),
        "step_ms": round(step_s * 1e3, 2),
        "flops_per_step": flops_per_step,
        "mfu": round(mfu(flops_per_step, step_s), 4),
        "peak_flops_per_sec": peak_flops_per_sec(),
        "device_kind": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
