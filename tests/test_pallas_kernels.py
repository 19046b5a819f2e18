"""Pallas kernel correctness (interpreter mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from nero_tpu.fields.sdf import SDFConfig, init_sdf, sdf_value
from nero_tpu.ops.pallas.sdf_kernel import pack_sdf_params, sdf_fwd_fused


def test_fused_sdf_matches_reference():
    cfg = SDFConfig()
    params = init_sdf(jax.random.PRNGKey(0), cfg)
    packed = pack_sdf_params(params, cfg)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (600, 3), minval=-1, maxval=1)
    ref = np.asarray(sdf_value(params, pts, cfg))
    out = np.asarray(sdf_fwd_fused(packed, pts, cfg, interpret=True))
    assert out.shape == ref.shape
    # kernel runs matmuls in bf16 -> tolerance reflects that
    np.testing.assert_allclose(out, ref, atol=2e-2)
    assert np.abs(out - ref).mean() < 3e-3


def test_field_kernel_matches_reference():
    from nero_tpu.geometry.neural_tracer import field_apply, init_field
    from nero_tpu.ops.pallas.field_kernel import field_fwd_fused, pack_field_params

    params = init_field(jax.random.PRNGKey(0))
    packed = pack_field_params(params)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (700, 3), minval=-1, maxval=1)
    ref = np.asarray(field_apply(params, pts))
    out = np.asarray(field_fwd_fused(packed, pts, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-2)
    assert np.abs(out - ref).mean() < 3e-3


def test_pe_recurrence_matches_exact():
    """Double-angle recurrence PE == direct sin/cos (transposed layout)."""
    from nero_tpu.ops.pallas.march_kernel import _pe_rows
    from nero_tpu.utils.encodings import positional_encode

    x = jax.random.uniform(jax.random.PRNGKey(2), (5, 3), minval=-1.2, maxval=1.2)
    got = np.asarray(_pe_rows(x.T, 6)).T
    ref = np.asarray(positional_encode(x, 6))
    np.testing.assert_allclose(got, ref, atol=5e-5)


def test_march_kernel_matches_unfused_trace():
    """Fused march agrees with the jnp neural_trace path on a synthetic field."""
    from nero_tpu.geometry.neural_tracer import (distill_field, init_field,
                                                 neural_trace)
    from nero_tpu.ops.pallas.field_kernel import pack_field_params

    # train a tiny field on an analytic sphere SDF (no mesh needed): fit by
    # direct regression so the test stays fast on CPU
    import optax
    params = init_field(jax.random.PRNGKey(0))
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)
    from nero_tpu.geometry.neural_tracer import field_apply

    @jax.jit
    def step(params, opt_state, key):
        pts = jax.random.uniform(key, (4096, 3), minval=-0.9, maxval=0.9)
        tgt = jnp.linalg.norm(pts, axis=-1) - 0.5

        def loss_fn(p):
            return jnp.mean((field_apply(p, pts) - tgt) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt_state2 = opt.update(g, opt_state, params)
        return optax.apply_updates(params, up), opt_state2, loss

    key = jax.random.PRNGKey(3)
    for i in range(300):
        params, opt_state, loss = step(params, opt_state, jax.random.fold_in(key, i))
    assert float(loss) < 1e-3

    packed = pack_field_params(params)
    r = 256  # interpret-mode march cost scales with rays; 256 keeps the
    # agreement statistics meaningful (1/256 granularity vs the 0.99 bar)
    o = jax.random.normal(jax.random.PRNGKey(4), (r, 3))
    o = 1.5 * o / jnp.linalg.norm(o, axis=-1, keepdims=True)
    d = jax.random.normal(jax.random.PRNGKey(5), (r, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    import nero_tpu.ops.pallas.march_kernel as mk
    t_a, n_a, h_a = neural_trace(params, packed, o, d, bound=1.0, use_fused=False)

    # force interpret mode through neural_trace's fused path (CPU test env)
    real = mk.march_fused

    def march_interp(*args, **kw):
        kw["interpret"] = True
        return real(*args, **kw)

    try:
        mk.march_fused = march_interp
        t_b, n_b, h_b = neural_trace(params, packed, o, d, bound=1.0,
                                     use_fused=True)
    finally:
        mk.march_fused = real
        neural_trace.clear_cache()  # drop the interpret-mode trace

    h_a, h_b = np.asarray(h_a), np.asarray(h_b)
    agree = (h_a == h_b).mean()
    assert agree > 0.99, f"hit agreement {agree}"
    both = h_a & h_b
    terr = np.abs(np.asarray(t_a)[both] - np.asarray(t_b)[both])
    assert np.median(terr) < 1e-3


def test_sphere_march_matches_uniform_march():
    """Sphere-traced march (fixed-K |f|-scaled steps) agrees with the uniform
    coarse march on a field with a thin feature (torus tube) — the regime the
    dt_min coverage floor exists for."""
    import optax

    from nero_tpu.geometry.neural_tracer import field_apply, init_field
    from nero_tpu.ops.pallas.field_kernel import pack_field_params
    from nero_tpu.ops.pallas.march_kernel import march_fused, sphere_march_fused

    def torus_sdf(p):
        q = jnp.stack([jnp.linalg.norm(p[..., :2], axis=-1) - 0.55,
                       p[..., 2]], axis=-1)
        return jnp.linalg.norm(q, axis=-1) - 0.12

    params = init_field(jax.random.PRNGKey(0))
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        pts = jax.random.uniform(key, (4096, 3), minval=-0.9, maxval=0.9)
        tgt = torus_sdf(pts)

        def loss_fn(p):
            return jnp.mean((field_apply(p, pts) - tgt) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt_state2 = opt.update(g, opt_state, params)
        return optax.apply_updates(params, up), opt_state2, loss

    key = jax.random.PRNGKey(3)
    for i in range(400):
        params, opt_state, loss = step(params, opt_state,
                                       jax.random.fold_in(key, i))
    assert float(loss) < 2e-3
    packed = pack_field_params(params)

    # rays both from outside (toward the torus) and from ON the surface
    # (hemisphere visibility rays, the Stage-II workload)
    r = 256
    o = jax.random.normal(jax.random.PRNGKey(4), (r, 3))
    o = 1.4 * o / jnp.linalg.norm(o, axis=-1, keepdims=True)
    d = jax.random.normal(jax.random.PRNGKey(5), (r, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t_enter = jnp.full((r,), 0.012)
    t_exit = jnp.full((r,), 2.8)

    t_u, h_u = march_fused(packed, o, d, t_enter, t_exit, n_coarse=32,
                           n_refine=8, interpret=True)
    t_s, h_s = sphere_march_fused(packed, o, d, t_enter, t_exit, n_sphere=16,
                                  n_refine=8, dt_frac=1.0 / 31.0,
                                  margin=0.004, interpret=True)
    h_u, h_s = np.asarray(h_u), np.asarray(h_s)
    agree = (h_u == h_s).mean()
    assert agree > 0.98, f"hit agreement {agree}"
    both = h_u & h_s
    terr = np.abs(np.asarray(t_u)[both] - np.asarray(t_s)[both])
    assert np.median(terr) < 2e-3, float(np.median(terr))

    # Illinois refinement: hits are march-determined (identical to the
    # bisect arm), and 3 regula-falsi evals land within the bisect-8
    # depth band on the smooth distilled field
    t_i, h_i = sphere_march_fused(packed, o, d, t_enter, t_exit, n_sphere=16,
                                  n_refine=3, refine="illinois",
                                  dt_frac=1.0 / 31.0, margin=0.004,
                                  interpret=True)
    h_i = np.asarray(h_i)
    assert (h_i == h_s).all(), "refine mode must not change hit decisions"
    both_i = h_u & h_i
    terr_i = np.abs(np.asarray(t_u)[both_i] - np.asarray(t_i)[both_i])
    assert np.median(terr_i) < 2e-3, float(np.median(terr_i))
