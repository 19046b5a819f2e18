import jax
import jax.numpy as jnp
import numpy as np
import torch

from nero_tpu.ops.mlp import (apply_dense, apply_predictor, exp_activation,
                              init_dense, init_predictor, softplus_beta)


def test_weight_norm_matches_torch():
    rng = np.random.RandomState(0)
    w = rng.randn(16, 8).astype(np.float32)  # [in, out]
    b = rng.randn(8).astype(np.float32)
    x = rng.randn(5, 16).astype(np.float32)

    lin = torch.nn.Linear(16, 8)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(w.T))
        lin.bias.copy_(torch.from_numpy(b))
    lin = torch.nn.utils.weight_norm(lin)
    # perturb g to exercise the reparametrisation
    with torch.no_grad():
        lin.weight_g.mul_(1.7)
    ref = lin(torch.from_numpy(x)).detach().numpy()

    p = init_dense(jax.random.PRNGKey(0), 16, 8, weight_norm=True,
                   weight=jnp.asarray(w), bias=jnp.asarray(b))
    p["g"] = p["g"] * 1.7
    out = np.asarray(apply_dense(p, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_softplus_beta_matches_torch():
    x = np.linspace(-0.2, 0.2, 101).astype(np.float32)
    ref = torch.nn.Softplus(beta=100)(torch.from_numpy(x)).numpy()
    out = np.asarray(softplus_beta(jnp.asarray(x), 100.0))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_predictor_shapes_and_bias():
    key = jax.random.PRNGKey(1)
    layers = init_predictor(key, 259, 3, final_bias=np.log(0.5))
    x = jnp.ones((7, 259))
    out = apply_predictor(layers, x, activation="exp", exp_max=5.0)
    assert out.shape == (7, 3)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(np.asarray(layers[-1]["b"]), np.log(0.5), atol=1e-6)


def test_exp_activation_clamp():
    x = jnp.asarray([0.0, 10.0])
    out = np.asarray(exp_activation(x, 5.0))
    np.testing.assert_allclose(out, [1.0, np.exp(5.0)], rtol=1e-5)


def test_torch_default_init_range():
    p = init_dense(jax.random.PRNGKey(2), 100, 50, weight_norm=False)
    bound = 1.0 / np.sqrt(100)
    w = np.asarray(p["w"])
    assert w.min() >= -bound - 1e-6 and w.max() <= bound + 1e-6
    assert abs(w.mean()) < 0.005
