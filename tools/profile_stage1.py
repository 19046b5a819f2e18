"""Decompose the Stage-I train step into component timings on real hardware.

Times, as separately-jitted chained loops (host readback sync; see the axon
measurement caveat in IMPLEMENTATION_NOTES.md):
  proposal   : sample_z_vals hierarchical sampler
  fwd_no_occ : loss value only, occ branch inactive
  grad_no_occ: value_and_grad, occ branch inactive
  grad_occ   : value_and_grad, occ branch active (steady state)
  full_step  : optimizer update included (bench.py workload)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_STEPS = 30
WARMUP = 8


def timeit(fn, *args, name=None):
    import jax.numpy as jnp
    acc = jnp.zeros(())
    for _ in range(WARMUP):
        acc = fn(acc, *args)
    float(acc)
    acc = jnp.zeros(())
    t0 = time.perf_counter()
    for _ in range(N_STEPS):
        acc = fn(acc, *args)
    float(acc)
    ms = (time.perf_counter() - t0) / N_STEPS * 1e3
    if name:
        print(json.dumps({name: round(ms, 2)}), flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from nero_tpu.models.shape import NeROShapeModel
    from nero_tpu.render.shape import (render, sample_z_vals, compute_rgb_loss)
    from nero_tpu.train.losses import compute_losses, total_loss

    rays = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    grad_mode = sys.argv[2] if len(sys.argv) > 2 else "rev"
    cfg = {
        "name": "profile_stage1", "network": "shape",
        "database_name": "proc/sphere/128_16",
        "train_ray_num": rays, "occ_loss_step": 20000,
        "occ_loss_max_pn": 4 * rays,
        "loss": ["nerf_render", "eikonal", "std", "init_sdf_reg", "occ"],
        "key_metric_name": "psnr", "sdf_grad_mode": grad_mode,
    }
    model = NeROShapeModel(cfg, training=True)
    cfg = model.cfg  # defaults merged
    scfg, fg_lut = model.scfg, model.fg_lut
    params = model.params
    data = model.train_data
    key = jax.random.PRNGKey(0)

    from nero_tpu.render.rays import sample_ray_batch
    batch = jax.jit(lambda k: sample_ray_batch(
        k, data["imgs_u8"], data["K_inv"], data["poses"], data["human_poses"], rays))(key)

    results = {}

    @jax.jit
    def proposal(acc, params, b, k):
        ro = b["rays_o"] + acc * 0.0
        z_in, z_out = sample_z_vals(params, scfg, ro, b["rays_d"], b["near"],
                                    b["far"], key=k, perturb=1.0)
        return acc + jnp.mean(z_in) * 1e-9
    results["proposal_ms"] = timeit(proposal, params, batch, key, name="proposal")

    def make_loss(step_val):
        step = jnp.asarray(step_val)

        def loss_fn(p, b, k):
            out = render(p, scfg, fg_lut, b["rays_o"], b["rays_d"], b["near"],
                         b["far"], b["human_poses"], step, key=k, is_train=True)
            out["loss_rgb"] = compute_rgb_loss(out["ray_rgb"], b["rgb"], cfg["rgb_loss"])
            log = compute_losses(cfg["loss"], out, None, step, cfg)
            return total_loss(log)
        return loss_fn

    loss_pre = make_loss(5000)      # occ branch off
    loss_post = make_loss(25000)    # occ branch on

    @jax.jit
    def fwd_no_occ(acc, params, b, k):
        return acc + loss_pre(params, b, k) * 1e-9
    results["fwd_no_occ_ms"] = timeit(fwd_no_occ, params, batch, key, name="fwd_no_occ")

    @jax.jit
    def fwd_occ(acc, params, b, k):
        return acc + loss_post(params, b, k) * 1e-9
    results["fwd_occ_ms"] = timeit(fwd_occ, params, batch, key, name="fwd_occ")

    @jax.jit
    def grad_no_occ(acc, params, b, k):
        g = jax.grad(loss_pre)(params, b, k)
        return acc + sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g)) * 1e-9
    results["grad_no_occ_ms"] = timeit(grad_no_occ, params, batch, key, name="grad_no_occ")

    @jax.jit
    def grad_occ(acc, params, b, k):
        g = jax.grad(loss_post)(params, b, k)
        return acc + sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g)) * 1e-9
    results["grad_occ_ms"] = timeit(grad_occ, params, batch, key, name="grad_occ")

    opt = optax.adam(1e-3)
    step_fn = model.make_train_step(opt, donate=False)
    opt_state = opt.init(params)
    step_idx = jnp.asarray(25000)

    def full(acc, params, opt_state, k):
        p, o, log = step_fn(params, opt_state, k, step_idx, data)
        return acc + log["loss_total"] * 1e-9

    acc = jnp.zeros(())
    for i in range(WARMUP):
        acc = full(acc, params, opt_state, jax.random.fold_in(key, i))
    float(acc)
    acc = jnp.zeros(())
    t0 = time.perf_counter()
    for i in range(N_STEPS):
        acc = full(acc, params, opt_state, jax.random.fold_in(key, 100 + i))
    float(acc)
    results["full_step_ms"] = (time.perf_counter() - t0) / N_STEPS * 1e3

    results = {k: round(v, 2) for k, v in results.items()}
    results["derived"] = {
        "bwd_only_occ_ms": round(results["grad_occ_ms"] - results["fwd_occ_ms"], 2),
        "occ_branch_ms": round(results["fwd_occ_ms"] - results["fwd_no_occ_ms"], 2),
        "optimizer_etc_ms": round(results["full_step_ms"] - results["grad_occ_ms"], 2),
    }
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
