"""Fused predictor-head kernel vs the XLA path (interpret mode).

The kernel computes in bf16 (like the production bf16_hidden path); the
parity bar is that its error vs the f32 reference is no worse than the
bf16-XLA path's own error vs the same reference.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nero_tpu.ops.mlp import apply_predictor, hidden_dtype, init_predictor
from nero_tpu.ops.pallas.predictor_kernel import predictor_fused


HEAD_SHAPES = [(259, 3), (72, 3), (123, 3), (90, 1)]  # materials / outer / inner / occ


@pytest.mark.parametrize("d_in,d_out", HEAD_SHAPES)
def test_forward_parity(d_in, d_out):
    key = jax.random.PRNGKey(d_in)
    layers = init_predictor(key, d_in, d_out)
    x = jax.random.normal(jax.random.fold_in(key, 1), (700, d_in)) * 0.5
    ref = apply_predictor(layers, x, activation="none")
    out = predictor_fused(layers, x, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=1e-2)


def test_grad_parity_no_worse_than_bf16():
    d_in, d_out = 259, 3
    key = jax.random.PRNGKey(0)
    layers = init_predictor(key, d_in, d_out)
    x = jax.random.normal(jax.random.fold_in(key, 1), (700, d_in)) * 0.5
    cot = jax.random.normal(jax.random.fold_in(key, 2), (700, d_out))

    def loss_f32(p, xx):
        return jnp.sum(apply_predictor(p, xx, activation="none") * cot)

    def loss_bf16(p, xx):
        with hidden_dtype(jnp.bfloat16):
            return jnp.sum(apply_predictor(p, xx, activation="none") * cot)

    def loss_ker(p, xx):
        return jnp.sum(predictor_fused(p, xx, interpret=True) * cot)

    # jit so the compiles land in the persistent cache (quick-suite time)
    g32, gx32 = jax.jit(jax.grad(loss_f32, argnums=(0, 1)))(layers, x)
    gbf = jax.jit(jax.grad(loss_bf16, argnums=0))(layers, x)
    gk, gxk = jax.jit(jax.grad(loss_ker, argnums=(0, 1)))(layers, x)

    def worst_mean_rel(ga, gb):
        worst = 0.0
        for la, lb in zip(jax.tree_util.tree_leaves(ga),
                          jax.tree_util.tree_leaves(gb)):
            la, lb = np.asarray(la), np.asarray(lb)
            sc = np.abs(la).max() + 1e-8
            worst = max(worst, float((np.abs(la - lb) / sc).mean()))
        return worst

    noise_bf16 = worst_mean_rel(g32, gbf)      # the accepted production noise
    noise_ker = worst_mean_rel(g32, gk)
    assert noise_ker < noise_bf16 * 1.5 + 1e-4, (noise_ker, noise_bf16)

    # per-leaf gradient direction must agree with the f32 reference
    for la, lb in zip(jax.tree_util.tree_leaves(g32),
                      jax.tree_util.tree_leaves(gk)):
        la, lb = np.asarray(la).ravel(), np.asarray(lb).ravel()
        cos = la @ lb / (np.linalg.norm(la) * np.linalg.norm(lb) + 1e-12)
        assert cos > 0.99, cos

    # input cotangent (feeds the SDF net through feats/normals)
    gx32, gxk = np.asarray(gx32), np.asarray(gxk)
    assert (np.abs(gx32 - gxk) / (np.abs(gx32).max() + 1e-8)).mean() < 0.02


def test_odd_row_count_padding():
    layers = init_predictor(jax.random.PRNGKey(5), 72, 3)
    x = jax.random.normal(jax.random.PRNGKey(6), (3, 7, 72))  # 21 rows, ragged
    ref = apply_predictor(layers, x, activation="none")
    out = predictor_fused(layers, x, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=1e-2)
