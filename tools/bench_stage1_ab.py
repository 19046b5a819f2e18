"""Stage-I step-time A/B over renderer variants.

Variants:
  base      : bg_on_inner=True  (exact reference parity: bg NeRF on full lattice)
  bgfast    : bg_on_inner=False (bg only on outer samples; default)
  fwdgrad   : bgfast + sdf_grad_mode='fwd' (jvp basis tangents instead of rev)

Each variant times the full flagship train step (512 rays, full losses, occ
branch active) exactly like bench.py. Prints one JSON line per variant.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_variant(name, extra_cfg):
    import jax
    import optax
    import jax.numpy as jnp
    from nero_tpu.core import mfu
    from nero_tpu.models.shape import NeROShapeModel

    # {kernel-name-prefix: must-be-present} — verified against the compiled
    # HLO below so a variant that silently fell back aborts instead of
    # publishing a self-vs-self number (the round-3 'heads neutral' failure)
    extra_cfg = dict(extra_cfg)
    expect_kernels = extra_cfg.pop("expect_kernels", None)
    cfg = {
        "name": f"ab_{name}",
        "network": "shape",
        "database_name": "proc/sphere/128_16",
        "train_ray_num": extra_cfg.get("train_ray_num", 512),
        "occ_loss_step": 20000,
        "loss": ["nerf_render", "eikonal", "std", "init_sdf_reg", "occ"],
        "key_metric_name": "psnr",
    }
    cfg.update(extra_cfg)
    model = NeROShapeModel(cfg, training=True)
    if extra_cfg.get("sdf_grad_mode") is not None:
        # a silently-downgraded mode (off-TPU 'fused' -> 'rev') would report a
        # no-op A/B as a real one — fail loudly instead (ADVICE r3)
        assert model.scfg.grad_mode == extra_cfg["sdf_grad_mode"], (
            f"variant {name}: sdf_grad_mode={extra_cfg['sdf_grad_mode']!r} "
            f"resolved to {model.scfg.grad_mode!r} "
            f"(backend={jax.default_backend()})")
    opt = optax.adam(1e-3)
    step_fn = model.make_train_step(opt, donate=False)
    params = model.params
    opt_state = opt.init(params)
    data = model.train_data
    key = jax.random.PRNGKey(0)
    step_idx = jnp.asarray(25000)

    if expect_kernels is not None:
        mfu.assert_kernels(step_fn, expect_kernels, f"variant {name}",
                           params, opt_state, key, step_idx, data)

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
    float(log["loss_total"])
    dt = time.perf_counter() - t0
    step_s = dt / n_steps
    print(json.dumps({
        "variant": name, "step_ms": round(step_s * 1e3, 2),
        "rays_per_sec": round(cfg["train_ray_num"] / step_s, 1),
    }), flush=True)


def main():
    import sys as _sys
    if len(_sys.argv) > 1 and _sys.argv[1] == "batch":
        # ray-batch scaling sweep: occ_loss_max_pn scales with the batch as in
        # the reference ratio (2048 per 512 rays)
        variants = [(f"rays{n}", {"train_ray_num": n, "occ_loss_max_pn": 4 * n})
                    for n in (512, 1024, 2048, 4096)]
    else:
        variants = [
            ("base", {"bg_on_inner": True}),
            ("bgfast", {"bg_on_inner": False}),
            ("fwdgrad", {"bg_on_inner": False, "sdf_grad_mode": "fwd"}),
        ]
    if len(_sys.argv) > 1 and _sys.argv[1] == "remat":
        # shader remat (jax.checkpoint nothing_saveable) vs stored activations
        variants = [
            ("remat_off_512", {"remat_shader": False}),
            ("remat_on_512", {"remat_shader": True}),
            ("remat_off_2048", {"train_ray_num": 2048, "occ_loss_max_pn": 8192,
                                "remat_shader": False}),
            ("remat_on_2048", {"train_ray_num": 2048, "occ_loss_max_pn": 8192,
                               "remat_shader": True}),
        ]
    if len(_sys.argv) > 1 and _sys.argv[1] == "bf16":
        variants = [
            ("bf16_hidden", {"bf16_hidden": True}),
            ("f32_hidden", {"bf16_hidden": False}),
        ]
    if len(_sys.argv) > 1 and _sys.argv[1] == "round2":
        variants = [
            ("default", {}),
            ("fused_sdf", {"use_fused_sdf": True}),
        ]
    if len(_sys.argv) > 1 and _sys.argv[1] == "heads":
        # fused Pallas predictor heads (ops/pallas/predictor_kernel.py) vs XLA.
        # NOTE: earlier rounds passed fused_heads at the TOP level, where
        # shape_config_from_dict never reads it — that A/B compared the XLA
        # path against itself (the recorded "heads neutral" results were
        # vacuous). Shader fields must go through shader_config.
        _noheads = {"nero_predictor": False, "nero_shader": False}
        _heads = {"nero_predictor": True, "nero_shader": False}
        variants = [
            ("heads_xla_512", {"shader_config": {"fused_shader": False},
                               "expect_kernels": _noheads}),
            ("heads_fused_512", {"shader_config": {"fused_heads": True,
                                                   "fused_shader": False},
                                 "expect_kernels": _heads}),
            ("heads_xla_2048", {"train_ray_num": 2048, "occ_loss_max_pn": 8192,
                                "shader_config": {"fused_shader": False},
                                "expect_kernels": _noheads}),
            ("heads_fused_2048", {"train_ray_num": 2048, "occ_loss_max_pn": 8192,
                                  "shader_config": {"fused_heads": True,
                                                    "fused_shader": False},
                                  "expect_kernels": _heads}),
        ]
    if len(_sys.argv) > 1 and _sys.argv[1] == "shader":
        # whole-shader fused kernel (ops/pallas/shader_kernel.py) vs XLA
        variants = [
            ("shader_xla_512", {"shader_config": {"fused_shader": False},
                                "expect_kernels": {"nero_shader": False}}),
            ("shader_fused_512", {"shader_config": {"fused_shader": True},
                                  "expect_kernels": {"nero_shader": True}}),
            ("shader_xla_2048", {"train_ray_num": 2048, "occ_loss_max_pn": 8192,
                                 "shader_config": {"fused_shader": False},
                                 "expect_kernels": {"nero_shader": False}}),
            ("shader_fused_2048", {"train_ray_num": 2048, "occ_loss_max_pn": 8192,
                                   "shader_config": {"fused_shader": True},
                                   "expect_kernels": {"nero_shader": True}}),
        ]
    if len(_sys.argv) > 1 and _sys.argv[1] == "shader_human":
        # the GlossyReal regime (human_light + sphere_direction, the
        # stage1_real bench workload): XLA shader vs the fused kernel's
        # human leg (_human_block). Auto keeps human configs on XLA until
        # this A/B + the training gate pass; the fused arms opt in.
        _real = {"human_light": True, "sphere_direction": True}
        variants = [
            ("shader_human_xla_512",
             {"shader_config": dict(_real, fused_shader=False),
              "expect_kernels": {"nero_shader": False}}),
            ("shader_human_fused_512",
             {"shader_config": dict(_real, fused_shader=True),
              "expect_kernels": {"nero_shader": True}}),
            ("shader_human_xla_2048",
             {"train_ray_num": 2048, "occ_loss_max_pn": 8192,
              "shader_config": dict(_real, fused_shader=False),
              "expect_kernels": {"nero_shader": False}}),
            ("shader_human_fused_2048",
             {"train_ray_num": 2048, "occ_loss_max_pn": 8192,
              "shader_config": dict(_real, fused_shader=True),
              "expect_kernels": {"nero_shader": True}}),
        ]
    if len(_sys.argv) > 1 and _sys.argv[1] == "grad":
        # rev-mode VJP vs the fused SDF-with-grad Pallas kernel. The rev arms
        # pin sdf_grad_mode explicitly: on TPU an empty config auto-resolves
        # to 'fused', which would silently compare fused against fused.
        variants = [
            ("grad_rev_512", {"sdf_grad_mode": "rev",
                              "expect_kernels": {"nero_sdf_grad": False}}),
            ("grad_fused_512", {"sdf_grad_mode": "fused",
                                "expect_kernels": {"nero_sdf_grad": True}}),
            ("grad_rev_2048", {"train_ray_num": 2048, "occ_loss_max_pn": 8192,
                               "sdf_grad_mode": "rev",
                               "expect_kernels": {"nero_sdf_grad": False}}),
            ("grad_fused_2048", {"train_ray_num": 2048, "occ_loss_max_pn": 8192,
                                 "sdf_grad_mode": "fused",
                                 "expect_kernels": {"nero_sdf_grad": True}}),
        ]
    if len(_sys.argv) > 1 and _sys.argv[1] == "topk":
        variants = [
            ("k0_full", {"shade_top_k": 0}),
            ("k48", {"shade_top_k": 48}),
            ("k32", {"shade_top_k": 32}),
        ]
    for name, extra in variants:
        bench_variant(name, extra)


if __name__ == "__main__":
    main()
