"""Time the two halves of the Stage-I core — SDF-with-spatial-grad vs the
appearance shader — forward and value_and_grad, on the exact training shapes
([512 rays, 128 samples]). Decides where a custom-VJP fused kernel would pay.

Usage: python tools/profile_core_parts.py [--bf16]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, WARM = 30, 8


def timed(fn, *args):
    import jax.numpy as jnp
    acc = jnp.zeros(())
    for _ in range(WARM):
        acc = fn(acc, *args)
    float(acc)
    acc = jnp.zeros(())
    t0 = time.perf_counter()
    for _ in range(N):
        acc = fn(acc, *args)
    float(acc)
    return round((time.perf_counter() - t0) / N * 1e3, 2)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--bf16", action="store_true")
    flags = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from nero_tpu.fields.app_shading import (AppShadingConfig, app_shading_apply,
                                             init_app_shading)
    from nero_tpu.fields.sdf import SDFConfig, init_sdf, sdf_with_grad
    from nero_tpu.ops.fg_lut import get_fg_lut
    from nero_tpu.ops.mlp import hidden_dtype, resolve_weight_norm

    dt = jnp.bfloat16 if flags.bf16 else None
    key = jax.random.PRNGKey(0)
    scfg = SDFConfig()
    acfg = AppShadingConfig()
    sdf_params = init_sdf(key, scfg)
    shd_params = init_app_shading(jax.random.fold_in(key, 1), acfg)
    fg_lut = jnp.asarray(get_fg_lut())

    R, S = 512, 128
    pts = jax.random.uniform(jax.random.fold_in(key, 2), (R, S, 3), minval=-0.6, maxval=0.6)
    dirs = jax.random.normal(jax.random.fold_in(key, 3), (R, S, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    feats = jax.random.normal(jax.random.fold_in(key, 4), (R, S, 256)) * 0.1
    grads_in = dirs
    hp = jnp.broadcast_to(jnp.eye(3, 4)[None, None], (R, S, 3, 4))

    out = {}

    def costed(prefix, fn, *args):
        """Attach XLA cost-analysis FLOPs/bytes for the jitted part — the
        bytes ledger the Stage-I roofline needs per component (VERDICT r3
        weak #2: the shader VJP was the largest HBM consumer with no bytes
        measurement)."""
        try:
            ca = fn.lower(*args).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            out[f"{prefix}_gflops"] = round(float(ca.get("flops", 0.0)) / 1e9, 2)
            out[f"{prefix}_gbytes"] = round(
                float(ca.get("bytes accessed", 0.0)) / 1e9, 3)
        except Exception:
            pass

    def sdf_fwd(acc, p):
        p = resolve_weight_norm(p)
        with hidden_dtype(dt):
            sdf, f, g = sdf_with_grad(p, pts, scfg)
        return acc + jnp.sum(sdf) * 1e-9 + jnp.sum(g) * 1e-9
    f = jax.jit(sdf_fwd)
    out["sdf_fwdgrad_fwd_ms"] = timed(f, sdf_params)
    costed("sdf_fwdgrad_fwd", f, jnp.zeros(()), sdf_params)

    def sdf_loss(p):
        p = resolve_weight_norm(p)
        with hidden_dtype(dt):
            sdf, f, g = sdf_with_grad(p, pts, scfg)
        # touches value, feats, and spatial grad like the real loss does
        return (jnp.sum(sdf ** 2) + jnp.sum((jnp.linalg.norm(g, axis=-1) - 1) ** 2)
                + jnp.sum(f) * 1e-6)

    def sdf_bwd(acc, p):
        g = jax.grad(sdf_loss)(p)
        return acc + sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g)) * 1e-9
    f = jax.jit(sdf_bwd)
    out["sdf_fwdgrad_vjp_ms"] = timed(f, sdf_params)
    costed("sdf_fwdgrad_vjp", f, jnp.zeros(()), sdf_params)

    def shd_fwd(acc, p):
        p = resolve_weight_norm(p)
        with hidden_dtype(dt):
            color, occ = app_shading_apply(p, acfg, fg_lut, pts, grads_in,
                                           -dirs, feats, hp)
        return acc + jnp.sum(color) * 1e-9
    f = jax.jit(shd_fwd)
    out["shader_fwd_ms"] = timed(f, shd_params)
    costed("shader_fwd", f, jnp.zeros(()), shd_params)

    def shd_loss(p):
        p = resolve_weight_norm(p)
        with hidden_dtype(dt):
            color, occ = app_shading_apply(p, acfg, fg_lut, pts, grads_in,
                                           -dirs, feats, hp)
        return jnp.sum(color ** 2) + jnp.sum(occ["occ_prob"])

    def shd_bwd(acc, p):
        g = jax.grad(shd_loss)(p)
        return acc + sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g)) * 1e-9
    f = jax.jit(shd_bwd)
    out["shader_vjp_ms"] = timed(f, shd_params)
    costed("shader_vjp", f, jnp.zeros(()), shd_params)

    out["dtype"] = "bf16" if flags.bf16 else "f32"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
