import jax
import jax.numpy as jnp
import numpy as np

from nero_tpu.fields.sdf import SDFConfig, init_sdf, sdf_apply, sdf_value, sdf_with_grad
from nero_tpu.fields.variance import init_variance, inv_s


def test_geometric_init_is_sphere():
    """Geometric init -> initial SDF approximates |x| - bias (a 0.5-sphere)."""
    cfg = SDFConfig()
    params = init_sdf(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    x = rng.uniform(-1.0, 1.0, (512, 3)).astype(np.float32)
    sdf = np.asarray(sdf_value(params, jnp.asarray(x), cfg))[:, 0]
    target = np.linalg.norm(x, axis=-1) - 0.5
    err = np.abs(sdf - target)
    assert np.median(err) < 0.12, f"median |sdf - (|x|-0.5)| = {np.median(err)}"
    # sign agreement near the surface band matters most
    band = np.abs(target) > 0.1
    assert (np.sign(sdf[band]) == np.sign(target[band])).mean() > 0.98


def test_sdf_gradient_norm_near_one():
    cfg = SDFConfig()
    params = init_sdf(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(1).uniform(-0.9, 0.9, (128, 3)), jnp.float32)
    sdf, feats, grad = sdf_with_grad(params, x, cfg)
    assert sdf.shape == (128, 1) and feats.shape == (128, 256) and grad.shape == (128, 3)
    norms = np.linalg.norm(np.asarray(grad), axis=-1)
    assert 0.7 < np.median(norms) < 1.3


def test_sdf_gradient_is_true_derivative():
    cfg = SDFConfig(n_layers=2, d_hidden=64, d_out=65)
    params = init_sdf(jax.random.PRNGKey(2), cfg)
    x = jnp.asarray([[0.3, -0.2, 0.4]])
    _, _, g = sdf_with_grad(params, x, cfg)
    eps = 1e-3
    for i in range(3):
        dx = jnp.zeros((1, 3)).at[0, i].set(eps)
        fd = (sdf_value(params, x + dx, cfg) - sdf_value(params, x - dx, cfg)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g[0, i]), np.asarray(fd[0, 0]), atol=1e-2)


def test_fwd_grad_mode_matches_rev():
    cfg = SDFConfig(n_layers=2, d_hidden=64, d_out=65)
    params = init_sdf(jax.random.PRNGKey(5), cfg)
    x = jnp.asarray(np.random.RandomState(6).randn(32, 3), jnp.float32) * 0.4
    s1, f1, g1 = sdf_with_grad(params, x, cfg, mode="rev")
    s2, f2, g2 = sdf_with_grad(params, x, cfg, mode="fwd")
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_second_order_gradients_flow():
    """Eikonal-style loss must be differentiable w.r.t. params (double backprop)."""
    cfg = SDFConfig(n_layers=2, d_hidden=64, d_out=65)
    params = init_sdf(jax.random.PRNGKey(3), cfg)
    x = jnp.asarray(np.random.RandomState(4).randn(16, 3), jnp.float32) * 0.3

    def loss_fn(p):
        _, _, g = sdf_with_grad(p, x, cfg)
        return jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)

    grads = jax.jit(jax.grad(loss_fn))(params)
    flat = jax.tree_util.tree_leaves(grads)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
    assert np.isfinite(total) and total > 0


def test_skip_shapes():
    cfg = SDFConfig()
    params = init_sdf(jax.random.PRNGKey(0), cfg)
    # layer 3 (feeding the skip) has reduced width: 256 - 39
    assert params[3]["v"].shape[1] == 256 - (3 + 36)
    assert params[4]["v"].shape[0] == 256
    out = sdf_apply(params, jnp.zeros((2, 5, 3)), cfg)
    assert out.shape == (2, 5, 257)


def test_variance_net():
    p = init_variance(0.3)
    np.testing.assert_allclose(float(inv_s(p, "exp")), np.exp(3.0), rtol=1e-5)
    np.testing.assert_allclose(float(inv_s(p, "linear")), 3.0, rtol=1e-5)
    np.testing.assert_allclose(float(inv_s(p, "square")), 9.0, rtol=1e-5)
