"""Whole-shader fused kernel vs the XLA shader (interpret mode).

Same parity bar as the other fused kernels (test_predictor_kernel.py): the
kernel computes with bf16 matmul operands — including bf16-stored weights —
so its error vs the f32 reference must stay within a small factor of the
bf16-XLA path's own error, and every gradient leaf must point the same way.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nero_tpu.fields.app_shading import (AppShadingConfig, app_shading_apply,
                                         _app_shading_apply_fused,
                                         init_app_shading)
from nero_tpu.ops.fg_lut import get_fg_lut
from nero_tpu.ops.mlp import hidden_dtype


def _setup(sphere_direction=False, R=2, S=64):
    cfg = AppShadingConfig(sphere_direction=sphere_direction)
    params = init_app_shading(jax.random.PRNGKey(0), cfg)
    fg_lut = jnp.asarray(get_fg_lut())
    k = jax.random.PRNGKey(1)
    pts = jax.random.uniform(jax.random.fold_in(k, 0), (R, S, 3), minval=-0.6, maxval=0.6)
    normals = jax.random.normal(jax.random.fold_in(k, 1), (R, S, 3))
    view = jax.random.normal(jax.random.fold_in(k, 2), (R, S, 3))
    feats = jax.random.normal(jax.random.fold_in(k, 3), (R, S, 256)) * 0.3
    hp = jnp.zeros((R, S, 3, 4))
    return cfg, params, fg_lut, pts, normals, view, feats, hp


@pytest.mark.parametrize("sphere", [False, True])
def test_forward_parity(sphere):
    cfg, params, fg_lut, pts, normals, view, feats, hp = _setup(sphere)
    color_ref, occ_ref = app_shading_apply(
        params, cfg._replace(fused_shader=False), fg_lut, pts, normals, view,
        feats, hp)
    color_k, occ_k = _app_shading_apply_fused(
        params, cfg, fg_lut, pts, normals, view, feats, hp, False,
        interpret=True)
    np.testing.assert_allclose(np.asarray(color_k), np.asarray(color_ref),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(occ_k["occ_prob"]),
                               np.asarray(occ_ref["occ_prob"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(occ_k["reflective"]),
                               np.asarray(occ_ref["reflective"]), atol=1e-5)


def test_grad_parity_no_worse_than_bf16():
    cfg, params, fg_lut, pts, normals, view, feats, hp = _setup(False)
    cfg_xla = cfg._replace(fused_shader=False)
    cot = jax.random.normal(jax.random.PRNGKey(7), pts.shape[:2] + (3,))
    cot2 = jax.random.normal(jax.random.PRNGKey(8), pts.shape[:2] + (1,))

    def loss(apply):
        def f(p, nrm, ft):
            c, o = apply(p, nrm, ft)
            return jnp.sum(c * cot) + jnp.sum(o["occ_prob"] * cot2)
        return f

    def xla_f32(p, nrm, ft):
        return app_shading_apply(p, cfg_xla, fg_lut, pts, nrm, view, ft, hp)

    def xla_bf16(p, nrm, ft):
        with hidden_dtype(jnp.bfloat16):
            return app_shading_apply(p, cfg_xla, fg_lut, pts, nrm, view, ft, hp)

    def fused(p, nrm, ft):
        return _app_shading_apply_fused(p, cfg, fg_lut, pts, nrm, view, ft,
                                        hp, False, interpret=True)

    g32 = jax.jit(jax.grad(loss(xla_f32), argnums=(0, 1, 2)))(params, normals, feats)
    gbf = jax.jit(jax.grad(loss(xla_bf16), argnums=(0, 1, 2)))(params, normals, feats)
    gk = jax.jit(jax.grad(loss(fused), argnums=(0, 1, 2)))(params, normals, feats)

    def worst_mean_rel(ga, gb):
        worst = 0.0
        for la, lb in zip(jax.tree_util.tree_leaves(ga),
                          jax.tree_util.tree_leaves(gb)):
            la, lb = np.asarray(la), np.asarray(lb)
            sc = np.abs(la).max() + 1e-8
            worst = max(worst, float((np.abs(la - lb) / sc).mean()))
        return worst

    noise_bf16 = worst_mean_rel(g32, gbf)   # accepted production noise
    noise_ker = worst_mean_rel(g32, gk)
    # the kernel additionally quantizes WEIGHTS to bf16 (the XLA bf16 path
    # only casts activations), so allow a moderate factor over that baseline
    assert noise_ker < noise_bf16 * 4.0 + 1e-3, (noise_ker, noise_bf16)

    # every gradient leaf must agree in direction with the f32 reference
    for la, lb in zip(jax.tree_util.tree_leaves(g32),
                      jax.tree_util.tree_leaves(gk)):
        la, lb = np.asarray(la).ravel(), np.asarray(lb).ravel()
        cos = la @ lb / (np.linalg.norm(la) * np.linalg.norm(lb) + 1e-12)
        assert cos > 0.99, cos


def test_inter_results_parity():
    cfg, params, fg_lut, pts, normals, view, feats, hp = _setup(False)
    _, _, inter_ref = app_shading_apply(
        params, cfg._replace(fused_shader=False), fg_lut, pts, normals, view,
        feats, hp, inter_results=True)
    _, _, inter_k = _app_shading_apply_fused(
        params, cfg, fg_lut, pts, normals, view, feats, hp, True,
        interpret=True)
    assert set(inter_k.keys()) == set(inter_ref.keys())
    for k in inter_ref:
        np.testing.assert_allclose(np.asarray(inter_k[k]),
                                   np.asarray(inter_ref[k]), atol=5e-3,
                                   err_msg=k)


def test_padding_and_odd_shapes():
    cfg, params, fg_lut, pts, normals, view, feats, hp = _setup(False, R=3, S=7)
    color_ref, _ = app_shading_apply(
        params, cfg._replace(fused_shader=False), fg_lut, pts, normals, view,
        feats, hp)
    color_k, _ = _app_shading_apply_fused(
        params, cfg, fg_lut, pts, normals, view, feats, hp, False,
        interpret=True)
    assert color_k.shape == color_ref.shape
    np.testing.assert_allclose(np.asarray(color_k), np.asarray(color_ref),
                               atol=2e-3)


def _human_setup(R=2, S=64):
    """GlossyReal regime: human_light + sphere_direction, non-degenerate
    camera poses (random rotations + small translations) so the camera-plane
    intersection exercises hit and miss rows."""
    cfg = AppShadingConfig(human_light=True, sphere_direction=True)
    params = init_app_shading(jax.random.PRNGKey(0), cfg)
    fg_lut = jnp.asarray(get_fg_lut())
    k = jax.random.PRNGKey(11)
    pts = jax.random.uniform(jax.random.fold_in(k, 0), (R, S, 3), minval=-0.6, maxval=0.6)
    normals = jax.random.normal(jax.random.fold_in(k, 1), (R, S, 3))
    view = jax.random.normal(jax.random.fold_in(k, 2), (R, S, 3))
    feats = jax.random.normal(jax.random.fold_in(k, 3), (R, S, 256)) * 0.3
    A = jax.random.normal(jax.random.fold_in(k, 4), (R, S, 3, 3))
    Q, _ = jnp.linalg.qr(A)
    t = jax.random.uniform(jax.random.fold_in(k, 5), (R, S, 3, 1),
                           minval=-0.5, maxval=0.5)
    hp = jnp.concatenate([Q, t], axis=-1)
    return cfg, params, fg_lut, pts, normals, view, feats, hp


def test_human_light_forward_parity():
    cfg, params, fg_lut, pts, normals, view, feats, hp = _human_setup()
    color_ref, occ_ref, inter_ref = app_shading_apply(
        params, cfg._replace(fused_shader=False), fg_lut, pts, normals, view,
        feats, hp, inter_results=True)
    color_k, occ_k, inter_k = _app_shading_apply_fused(
        params, cfg, fg_lut, pts, normals, view, feats, hp, True,
        interpret=True)
    np.testing.assert_allclose(np.asarray(color_k), np.asarray(color_ref),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(occ_k["occ_prob"]),
                               np.asarray(occ_ref["occ_prob"]), atol=2e-3)
    assert "human_light" in inter_k
    np.testing.assert_allclose(np.asarray(inter_k["human_light"]),
                               np.asarray(inter_ref["human_light"]),
                               atol=5e-3)
    # the human head must actually contribute (hit rows exist), otherwise
    # this parity test is vacuous
    assert float(np.abs(np.asarray(inter_ref["human_light"])).max()) > 1e-4


def test_human_light_grad_parity():
    cfg, params, fg_lut, pts, normals, view, feats, hp = _human_setup()
    cfg_xla = cfg._replace(fused_shader=False)
    cot = jax.random.normal(jax.random.PRNGKey(7), pts.shape[:2] + (3,))

    def loss(apply):
        def f(p, nrm, ft):
            c, _ = apply(p, nrm, ft)
            return jnp.sum(c * cot)
        return f

    def xla_f32(p, nrm, ft):
        return app_shading_apply(p, cfg_xla, fg_lut, pts, nrm, view, ft, hp)

    def xla_bf16(p, nrm, ft):
        with hidden_dtype(jnp.bfloat16):
            return app_shading_apply(p, cfg_xla, fg_lut, pts, nrm, view, ft, hp)

    def fused(p, nrm, ft):
        return _app_shading_apply_fused(p, cfg, fg_lut, pts, nrm, view, ft,
                                        hp, False, interpret=True)

    g32 = jax.jit(jax.grad(loss(xla_f32), argnums=(0, 1, 2)))(params, normals, feats)
    gbf = jax.jit(jax.grad(loss(xla_bf16), argnums=(0, 1, 2)))(params, normals, feats)
    gk = jax.jit(jax.grad(loss(fused), argnums=(0, 1, 2)))(params, normals, feats)

    # the human head's grads must flow and point with the f32 reference
    hnorm = sum(float(np.linalg.norm(np.asarray(l)))
                for l in jax.tree_util.tree_leaves(g32[0]["human_light"]))
    assert hnorm > 1e-6, "human head got no gradient — test is vacuous"
    for la, lb in zip(jax.tree_util.tree_leaves(g32),
                      jax.tree_util.tree_leaves(gk)):
        la, lb = np.asarray(la).ravel(), np.asarray(lb).ravel()
        denom = np.linalg.norm(la) * np.linalg.norm(lb)
        if denom < 1e-12:
            continue
        cos = la @ lb / denom
        assert cos > 0.98, cos

    def worst_mean_rel(ga, gb):
        worst = 0.0
        for la, lb in zip(jax.tree_util.tree_leaves(ga),
                          jax.tree_util.tree_leaves(gb)):
            la, lb = np.asarray(la), np.asarray(lb)
            sc = np.abs(la).max() + 1e-8
            worst = max(worst, float((np.abs(la - lb) / sc).mean()))
        return worst

    noise_bf16 = worst_mean_rel(g32, gbf)
    noise_ker = worst_mean_rel(g32, gk)
    assert noise_ker < noise_bf16 * 4.0 + 2e-3, (noise_ker, noise_bf16)


def test_mfu_counter_name_roundtrip():
    from nero_tpu.ops.pallas import shader_kernel as sk
    assert sk.hlo_flops("nero_shader_fwd_f1000", [(512, 24)], []) == 512000.0
    assert sk.hlo_flops("nero_shader_bwd_f3000", [(512, 16), (512, 256)], []) \
        == 512 * 3000.0
    assert sk.hlo_flops("some_other_kernel", [(512, 24)], []) is None
