"""Numerical parity against a torch mirror of the reference architecture.

These tests rebuild the reference's SDF network forward (weight-norm Linear,
softplus beta=100, PE(6) with identity-first channels, skip concat / sqrt(2))
in torch, copy OUR initialised weights into it, and require matching outputs
— strong evidence that the jnp fields implement the same function the
reference trains.
"""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from nero_tpu.fields.sdf import SDFConfig, init_sdf, sdf_apply
from nero_tpu.ops.mlp import apply_predictor, init_predictor


def _dense_to_torch(layer, d_in, d_out):
    lin = nn.Linear(d_in, d_out)
    v = np.asarray(layer["v"])  # [in, out]
    g = np.asarray(layer["g"])  # [1, out]
    norm = np.linalg.norm(v, axis=0, keepdims=True)
    w = (g * v / norm).T  # torch layout [out, in]
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(w))
        lin.bias.copy_(torch.from_numpy(np.asarray(layer["b"])))
    return lin


def _pe_torch(x, multires):
    outs = [x]
    for i in range(multires):
        f = 2.0 ** i
        outs.append(torch.sin(x * f))
        outs.append(torch.cos(x * f))
    return torch.cat(outs, -1)


def test_sdf_network_matches_torch_mirror():
    cfg = SDFConfig()
    params = init_sdf(jax.random.PRNGKey(0), cfg)

    dims = [39] + [256] * 8 + [257]
    lins = []
    for l in range(9):
        d_in = dims[l]
        d_out = dims[l + 1] - (dims[0] if l + 1 == 4 else 0)
        lins.append(_dense_to_torch(params[l], d_in, d_out))

    act = nn.Softplus(beta=100)

    def torch_forward(x):
        inputs = _pe_torch(x, 6)
        h = inputs
        for l in range(9):
            if l == 4:
                h = torch.cat([h, inputs], -1) / np.sqrt(2.0)
            h = lins[l](h)
            if l < 8:
                h = act(h)
        return h

    x = np.random.RandomState(0).uniform(-1, 1, (256, 3)).astype(np.float32)
    ref = torch_forward(torch.from_numpy(x)).detach().numpy()
    out = np.asarray(sdf_apply(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_predictor_matches_torch_mirror():
    layers = init_predictor(jax.random.PRNGKey(1), 259, 3, final_bias=np.log(0.5))
    dims = [(259, 256), (256, 256), (256, 256), (256, 3)]
    lins = [_dense_to_torch(l, di, do) for l, (di, do) in zip(layers, dims)]

    def torch_forward(x):
        h = x
        for lin in lins[:-1]:
            h = torch.relu(lin(h))
        return torch.sigmoid(lins[-1](h))

    x = np.random.RandomState(1).randn(64, 259).astype(np.float32)
    ref = torch_forward(torch.from_numpy(x)).detach().numpy()
    out = np.asarray(apply_predictor(layers, jnp.asarray(x), activation="sigmoid"))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_neus_alpha_matches_torch_mirror():
    """NeuS section alpha (reference renderer.py:484-512) torch vs jnp."""
    rng = np.random.RandomState(2)
    n = 128
    sdf = rng.randn(n).astype(np.float32) * 0.1
    dists = rng.rand(n).astype(np.float32) * 0.05
    true_cos = (rng.rand(n).astype(np.float32) - 0.8)
    inv_s = 64.0
    ratio = 0.3

    t_sdf = torch.from_numpy(sdf)
    t_cos = torch.from_numpy(true_cos)
    t_d = torch.from_numpy(dists)
    iter_cos = -(torch.relu(-t_cos * 0.5 + 0.5) * (1 - ratio)
                 + torch.relu(-t_cos) * ratio)
    est_next = t_sdf + iter_cos * t_d * 0.5
    est_prev = t_sdf - iter_cos * t_d * 0.5
    p = torch.sigmoid(est_prev * inv_s) - torch.sigmoid(est_next * inv_s)
    alpha_ref = ((p + 1e-5) / (torch.sigmoid(est_prev * inv_s) + 1e-5)).clip(0, 1).numpy()

    j_cos = jnp.asarray(true_cos)
    j_iter = -(jax.nn.relu(-j_cos * 0.5 + 0.5) * (1 - ratio)
               + jax.nn.relu(-j_cos) * ratio)
    est_next_j = jnp.asarray(sdf) + j_iter * jnp.asarray(dists) * 0.5
    est_prev_j = jnp.asarray(sdf) - j_iter * jnp.asarray(dists) * 0.5
    prev_cdf = jax.nn.sigmoid(est_prev_j * inv_s)
    next_cdf = jax.nn.sigmoid(est_next_j * inv_s)
    alpha = np.asarray(jnp.clip((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5), 0, 1))
    np.testing.assert_allclose(alpha, alpha_ref, atol=1e-6)
