"""Fused Pallas SDF forward vs XLA at the Stage-I core's shapes.

If the fwd kernel holds ~2x at [65k,3], a hand-VJP'd fused kernel family is
worth building for the backward; if XLA is already at kernel speed here, the
remaining Stage-I headroom is elsewhere.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_STEPS, WARM = 30, 8


def timed(fn, *args):
    import jax.numpy as jnp
    acc = jnp.zeros(())
    for _ in range(WARM):
        acc = fn(acc, *args)
    float(acc)
    acc = jnp.zeros(())
    t0 = time.perf_counter()
    for _ in range(N_STEPS):
        acc = fn(acc, *args)
    float(acc)
    return round((time.perf_counter() - t0) / N_STEPS * 1e3, 3)


def main():
    import jax
    import jax.numpy as jnp
    from nero_tpu.fields.sdf import SDFConfig, init_sdf, sdf_apply
    from nero_tpu.ops.mlp import hidden_dtype, resolve_weight_norm
    from nero_tpu.ops.pallas.sdf_kernel import pack_sdf_params, sdf_fwd_fused

    cfg = SDFConfig()
    key = jax.random.PRNGKey(0)
    params = init_sdf(key, cfg)
    resolved = jax.jit(resolve_weight_norm)(params)
    packed = jax.jit(lambda p: pack_sdf_params(p, cfg))(params)

    out = {}
    for n in (65536, 163840):
        pts = jax.random.uniform(jax.random.fold_in(key, n), (n, 3),
                                 minval=-0.6, maxval=0.6)

        def xla_f32(acc, p):
            return acc + jnp.sum(sdf_apply(p, pts, cfg)[..., 0]) * 1e-9
        out[f"xla_f32_{n}"] = timed(jax.jit(xla_f32), resolved)

        def xla_bf16(acc, p):
            with hidden_dtype(jnp.bfloat16):
                return acc + jnp.sum(sdf_apply(p, pts, cfg)[..., 0]) * 1e-9
        out[f"xla_bf16_{n}"] = timed(jax.jit(xla_bf16), resolved)

        def fused(acc, pk):
            return acc + jnp.sum(sdf_fwd_fused(pk, pts, cfg)) * 1e-9
        out[f"pallas_{n}"] = timed(jax.jit(fused), packed)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
