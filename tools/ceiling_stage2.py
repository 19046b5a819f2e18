"""Stage-II roofline: FLOPs, HBM bytes, and utilizations vs batch/dirs/scene.

Counterpart of ceiling_stage1.py for the material step (the reference's
hardest workload: 512 surface pts x 768 BVH-traced sample dirs per step,
reference network/field.py:856-880). For each variant it compiles the full
train step, reads XLA's compiled cost analysis PLUS the closed-form Pallas
kernel counts (core/mfu.py — the march/field kernels are the dominant
compute and invisible to XLA), times with true host-sync, and reports
step_ms, pts/s, TFLOP/s (MFU), GB/s (HBM fraction), and intensity vs the
ridge point. This answers what binds the Stage-II step — compute, HBM, or
latency — and therefore where the next 2x is (VERDICT r3 next #3).

Sweeps (arg 1):
  batch   : point batch 256..2048 at the production 512+256 dirs
  dirs    : direction counts at 512 pts (512+256 down to 128+64)
  scene   : convex sphere vs concave bowl (hit rate ~0.01 vs ~0.6 - the
            compaction regimes; VERDICT r3 weak #4)
  compact : inner_compact auto vs off on the bowl (full-lattice cost)
Usage: python tools/ceiling_stage2.py [batch|dirs|scene|compact]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_PEAK_HBM = {
    "TPU v4": 1228e9,
    "TPU v5 lite": 819e9,
    "TPU v5e": 819e9,
    "TPU v5": 2765e9,
    "TPU v5p": 2765e9,
    "TPU v6 lite": 1640e9,
    "TPU v6e": 1640e9,
}

_MESH_CACHE = {}


def _mesh(scene):
    if scene not in _MESH_CACHE:
        import numpy as np

        from nero_tpu.dataset.synthetic import scene_sdf
        from nero_tpu.geometry import native

        # scene_sdf returns a host numpy function — evaluate the grid on the
        # host and contour with the native iso-surfacer (no jit involved)
        sdf = scene_sdf(scene)
        grid, lo, hi = 128, -1.01, 1.01
        xs = np.linspace(lo, hi, grid).astype(np.float32)
        X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
        vals = np.asarray(sdf(np.stack([X, Y, Z], -1).reshape(-1, 3)),
                          np.float32).reshape(grid, grid, grid)
        verts, tris = native.isosurface(vals, 0.0)
        verts = (verts / (grid - 1.0) * (hi - lo) + lo).astype(np.float32)
        _MESH_CACHE[scene] = {"vertices": verts, "triangles": tris}
    return _MESH_CACHE[scene]


def run_variant(name, scene="sphere", pts=512, diffuse=512, specular=256,
                inner_compact="auto", extra=None, expect_kernels=None):
    import jax
    import jax.numpy as jnp
    import optax

    from nero_tpu.core import mfu as mfu_mod
    from nero_tpu.models.material import NeROMaterialModel

    dev = jax.devices()[0]
    peak_flops = mfu_mod.peak_flops_per_sec(dev)
    peak_hbm = _PEAK_HBM.get(dev.device_kind, 819e9) if dev.platform == "tpu" else 1e11

    cfg = {
        "name": f"ceil2_{name}", "network": "material",
        "database_name": f"proc/{scene}/100_12",
        "mesh": _mesh(scene),
        "train_ray_num": pts,
        "shader_cfg": {"diffuse_sample_num": diffuse,
                       "specular_sample_num": specular,
                       "human_lights": False,
                       "outer_light_version": "direction"},
        "inner_compact": inner_compact,
        "loss": ["nerf_render", "mat_reg"], "key_metric_name": "psnr",
    }
    cfg.update(extra or {})
    model = NeROMaterialModel(cfg, training=True)
    opt = optax.adam(1e-4)
    step_fn = model.make_train_step(opt, donate=False)
    params = model.params
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(0)
    step_idx = jnp.asarray(100)
    data = model.train_data

    jitted = jax.jit(lambda p, o, k: step_fn(p, o, k, step_idx, data))
    compiled = jitted.lower(params, opt_state, key).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    xla_flops = float(ca.get("flops", 0.0))
    byt = float(ca.get("bytes accessed", 0.0))
    pallas_flops, by_kernel, _ = mfu_mod.pallas_flops_of_text(compiled.as_text())
    flops = xla_flops + pallas_flops
    if expect_kernels is not None:
        mfu_mod.assert_kernels(by_kernel, expect_kernels, f"variant {name}")

    for i in range(8):
        params, opt_state, log = jitted(params, opt_state, jax.random.fold_in(key, i))
        if i % 4 == 3:
            float(log["loss_total"])
    n = 20
    t0 = time.perf_counter()
    for i in range(n):
        params, opt_state, log = jitted(params, opt_state, jax.random.fold_in(key, 100 + i))
    float(log["loss_total"])
    step_s = (time.perf_counter() - t0) / n

    print(json.dumps({
        "variant": name, "scene": scene, "pts": pts,
        "dirs": diffuse + specular, "inner_compact": inner_compact,
        "step_ms": round(step_s * 1e3, 2),
        "pts_per_sec": round(pts / step_s, 1),
        "gflops_per_step": round(flops / 1e9, 2),
        "gflops_pallas": round(pallas_flops / 1e9, 2),
        "pallas_by_kernel": {k: round(v / 1e9, 2) for k, v in by_kernel.items()},
        "gbytes_per_step": round(byt / 1e9, 3),
        "intensity_flop_per_byte": round(flops / max(byt, 1.0), 1),
        "tflops_per_sec": round(flops / step_s / 1e12, 2),
        "mfu": round(flops / step_s / peak_flops, 4),
        "hbm_gbps": round(byt / step_s / 1e9, 1),
        "hbm_frac": round(byt / step_s / peak_hbm, 4),
    }), flush=True)


def main():
    sweep = sys.argv[1] if len(sys.argv) > 1 else "batch"
    if sweep == "batch":
        for pts in (256, 512, 1024, 2048):
            run_variant(f"pts{pts}", pts=pts)
    elif sweep == "dirs":
        for d, s in ((512, 256), (256, 128), (128, 64)):
            run_variant(f"dirs{d}+{s}", diffuse=d, specular=s)
    elif sweep == "scene":
        run_variant("sphere", scene="sphere")
        run_variant("bowl", scene="bowl")
    elif sweep == "compact":
        run_variant("bowl_auto", scene="bowl", inner_compact="auto")
        run_variant("bowl_off", scene="bowl", inner_compact="off")
    elif sweep == "march_block":
        # BLOCK_R is a pure partitioning knob (per-ray numerics identical);
        # timed here through the dependent train-step loop because
        # standalone kernel timing is invalid through the axon tunnel —
        # block_until_ready does not gate on execution of independent
        # dispatches (tools/tunnel_timing_control.py "measures" a 4096^3
        # matmul at a physically impossible 4767 TF/s that way).
        import jax as _jax

        from nero_tpu.ops.pallas import march_kernel as _mk
        default_block = _mk.BLOCK_R
        for block in (2048, 4096, 8192):
            _mk.BLOCK_R = block
            _jax.clear_caches()
            run_variant(f"march_block{block}")
        _mk.BLOCK_R = default_block
    else:
        raise SystemExit(f"unknown sweep {sweep}")


if __name__ == "__main__":
    main()
