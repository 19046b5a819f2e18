"""Stage-I roofline: FLOPs, HBM bytes, and implied utilizations vs ray batch.

For each ray-batch size, compiles the full train step (same workload as
bench.py / bench_stage1_ab.py), reads XLA's compiled cost analysis
(flops + bytes accessed), times the step with true host-sync, and reports:

  step_ms, rays/s, TFLOP/s (and MFU vs bf16 peak), GB/s (and fraction of
  HBM peak), arithmetic intensity (FLOP/byte) vs the ridge point.

This answers "is the step compute- or bandwidth-bound, and how far from
the relevant roof is it" — the ceiling analysis for why rays/s does or does
not improve with batch. One JSON line per variant.

Usage: python tools/ceiling_stage1.py [grad_mode] [rays ...]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# HBM peak bytes/s per chip, published specs (same sourcing as core/mfu peaks)
_PEAK_HBM = {
    "TPU v4": 1228e9,
    "TPU v5 lite": 819e9,
    "TPU v5e": 819e9,
    "TPU v5": 2765e9,
    "TPU v5p": 2765e9,
    "TPU v6 lite": 1640e9,
    "TPU v6e": 1640e9,
}


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from nero_tpu.core import mfu as mfu_mod
    from nero_tpu.models.shape import NeROShapeModel

    grad_mode = sys.argv[1] if len(sys.argv) > 1 else "rev"
    ray_sizes = [int(a) for a in sys.argv[2:]] or [512, 2048]

    dev = jax.devices()[0]
    peak_flops = mfu_mod.peak_flops_per_sec(dev)
    peak_hbm = _PEAK_HBM.get(dev.device_kind, 819e9) if dev.platform == "tpu" else 1e11
    print(json.dumps({"device": dev.device_kind, "peak_tflops": peak_flops / 1e12,
                      "peak_hbm_gbps": peak_hbm / 1e9,
                      "ridge_flop_per_byte": round(peak_flops / peak_hbm, 1)}),
          flush=True)

    for rays in ray_sizes:
        cfg = {
            "name": f"ceiling_{rays}", "network": "shape",
            "database_name": "proc/sphere/128_16",
            "train_ray_num": rays, "occ_loss_step": 20000,
            "occ_loss_max_pn": 4 * rays,
            "loss": ["nerf_render", "eikonal", "std", "init_sdf_reg", "occ"],
            "key_metric_name": "psnr", "sdf_grad_mode": grad_mode,
        }
        model = NeROShapeModel(cfg, training=True)
        opt = optax.adam(1e-3)
        step_fn = model.make_train_step(opt, donate=False)
        params = model.params
        opt_state = opt.init(params)
        data = model.train_data
        key = jax.random.PRNGKey(0)
        step_idx = jnp.asarray(25000)

        jitted = jax.jit(lambda p, o, k: step_fn(p, o, k, step_idx, data))
        compiled = jitted.lower(params, opt_state, key).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        byt = float(ca.get("bytes accessed", 0.0))
        # XLA reports 0 FLOPs inside tpu_custom_call; add the kernels'
        # closed-form counts (the kernels' HBM traffic is their operands +
        # results, which XLA's bytes-accessed does include)
        pallas_flops, _, _ = mfu_mod.pallas_flops_of_text(compiled.as_text())
        flops += pallas_flops

        for i in range(10):
            params, opt_state, log = jitted(params, opt_state, jax.random.fold_in(key, i))
            if i % 4 == 3:
                float(log["loss_total"])
        n = 30
        t0 = time.perf_counter()
        for i in range(n):
            params, opt_state, log = jitted(params, opt_state, jax.random.fold_in(key, 100 + i))
        float(log["loss_total"])
        step_s = (time.perf_counter() - t0) / n

        print(json.dumps({
            "rays": rays, "grad_mode": grad_mode,
            "step_ms": round(step_s * 1e3, 2),
            "rays_per_sec": round(rays / step_s, 1),
            "gflops_per_step": round(flops / 1e9, 2),
            "gflops_pallas": round(pallas_flops / 1e9, 2),
            "gbytes_per_step": round(byt / 1e9, 3),
            "intensity_flop_per_byte": round(flops / max(byt, 1.0), 1),
            "tflops_per_sec": round(flops / step_s / 1e12, 2),
            "mfu": round(flops / step_s / peak_flops, 4),
            "hbm_gbps": round(byt / step_s / 1e9, 1),
            "hbm_frac": round(byt / step_s / peak_hbm, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
