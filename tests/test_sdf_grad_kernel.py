"""Fused SDF-with-grad kernel vs the XLA reference path (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nero_tpu.fields.sdf import SDFConfig, init_sdf, sdf_with_grad
from nero_tpu.ops.pallas.sdf_grad_kernel import sdf_with_grad_fused


@pytest.fixture(scope="module")
def setup():
    cfg = SDFConfig()
    key = jax.random.PRNGKey(3)
    params = init_sdf(key, cfg)
    # 256 pts: interpret-mode Pallas dominates quick-suite time; parity
    # tolerances are per-point, unchanged by batch
    pts = jax.random.uniform(jax.random.fold_in(key, 1), (256, 3),
                             minval=-0.7, maxval=0.7)
    return cfg, params, pts


def test_forward_parity(setup):
    cfg, params, pts = setup
    sdf_r, feats_r, grad_r = sdf_with_grad(params, pts, cfg)
    sdf_k, feats_k, grad_k = sdf_with_grad_fused(params, pts, cfg,
                                                 interpret=True)
    # kernel computes matmuls in bf16 (like the bf16_hidden training path);
    # tolerances sized to bf16 mantissa noise through 9 layers
    np.testing.assert_allclose(np.asarray(sdf_k), np.asarray(sdf_r),
                               atol=5e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(grad_k), np.asarray(grad_r),
                               atol=2e-2, rtol=5e-2)
    err = np.abs(np.asarray(feats_k) - np.asarray(feats_r))
    assert err.mean() < 5e-3, err.mean()


def test_param_grad_parity(setup):
    cfg, params, pts = setup
    cot = jax.random.normal(jax.random.PRNGKey(9), (256, 256)) * 0.1

    def loss(p, fn, **kw):
        sdf, feats, grad = fn(p, pts, cfg, **kw)
        eik = jnp.mean((jnp.linalg.norm(grad, axis=-1) - 1.0) ** 2)
        return jnp.mean(sdf ** 2) + 0.1 * eik + jnp.mean(feats * cot)

    # jit so the compiles land in the persistent cache (quick-suite time)
    g_ref = jax.jit(jax.grad(lambda p: loss(p, sdf_with_grad)))(params)
    g_ker = jax.jit(jax.grad(
        lambda p: loss(p, sdf_with_grad_fused, interpret=True)))(params)

    leaves_r, tree_r = jax.tree_util.tree_flatten(g_ref)
    leaves_k, tree_k = jax.tree_util.tree_flatten(g_ker)
    assert tree_r == tree_k
    for lr, lk in zip(leaves_r, leaves_k):
        lr, lk = np.asarray(lr), np.asarray(lk)
        scale = np.abs(lr).max() + 1e-8
        np.testing.assert_allclose(lk / scale, lr / scale, atol=2e-2,
                                   err_msg=str(lr.shape))


def test_grad_matches_fd(setup):
    """Spatial gradient vs finite differences of the kernel's own sdf."""
    cfg, params, pts = setup
    pts = pts[:256]
    sdf0, _, grad = sdf_with_grad_fused(params, pts, cfg, interpret=True)
    # eps sized above the kernel's bf16 hidden-activation noise floor
    eps = 2e-2
    for j in range(3):
        e = jnp.zeros((1, 3)).at[0, j].set(eps)
        sp, _, _ = sdf_with_grad_fused(params, pts + e, cfg, interpret=True)
        sm, _, _ = sdf_with_grad_fused(params, pts - e, cfg, interpret=True)
        fd = np.asarray((sp - sm) / (2 * eps))[:, 0]
        err = np.abs(np.asarray(grad[:, j]) - fd)
        # each FD sample re-rounds all bf16 activations, so individual
        # points can see ~0.1 noise on an O(1) gradient; the analytic grad
        # is checked exactly against the f32 reference in
        # test_forward_parity — this is a sign/scale smoke check
        assert np.median(err) < 0.02, np.median(err)
        assert (err < 0.08).mean() > 0.95, (err < 0.08).mean()
