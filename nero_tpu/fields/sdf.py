"""SDF field: 8x256 weight-norm MLP with geometric sphere initialisation.

Parity target: reference network/field.py:60-181 (`SDFNetwork`): PE(6) on
xyz with identity channels first, softplus(beta=100) activations, skip
connection at the middle layer (concat/sqrt(2)), 257-d output (sdf +
256-d feature), and the IGR geometric initialisation so the initial field
is approximately a sphere of radius `bias`.

The spatial gradient is computed with reverse-mode `jax.grad` through the
(pointwise) MLP — this composes with the outer training grad, giving the
same second-order "double backprop" semantics as torch create_graph=True
(reference field.py:155-167) without any custom machinery.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from nero_tpu.ops.mlp import (apply_dense, cast_hidden, init_dense,
                              normal_weight, softplus_beta)
from nero_tpu.utils.encodings import positional_encode, positional_encode_dim


class SDFConfig(NamedTuple):
    d_in: int = 3
    d_out: int = 257
    d_hidden: int = 256
    n_layers: int = 8
    skip: int = 4            # concat the embedded input before this layer
    multires: int = 6
    bias: float = 0.5        # initial sphere radius
    scale: float = 1.0
    geometric_init: bool = True
    weight_norm: bool = True
    beta: float = 100.0      # softplus sharpness


def _dims(cfg: SDFConfig):
    d0 = positional_encode_dim(cfg.d_in, cfg.multires) if cfg.multires > 0 else cfg.d_in
    return [d0] + [cfg.d_hidden] * cfg.n_layers + [cfg.d_out]


def init_sdf(key, cfg: SDFConfig = SDFConfig()):
    dims = _dims(cfg)
    n_lin = len(dims) - 1
    keys = jax.random.split(key, n_lin)
    layers = []
    for l in range(n_lin):
        d_in_l = dims[l]
        if l + 1 == cfg.skip:
            d_out_l = dims[l + 1] - dims[0]
        else:
            d_out_l = dims[l + 1]

        if cfg.geometric_init:
            if l == n_lin - 1:
                # final layer: mean sqrt(pi)/sqrt(fan_in), tiny std; bias -r
                w = normal_weight(keys[l], d_in_l, d_out_l,
                                  mean=math.sqrt(math.pi) / math.sqrt(d_in_l), std=1e-4)
                b = jnp.full((d_out_l,), -cfg.bias)
            elif cfg.multires > 0 and l == 0:
                # first layer sees PE(x); only raw-xyz columns are non-zero
                w = normal_weight(keys[l], d_in_l, d_out_l,
                                  std=math.sqrt(2.0) / math.sqrt(d_out_l))
                w = w.at[cfg.d_in:, :].set(0.0)
                b = jnp.zeros((d_out_l,))
            elif cfg.multires > 0 and l == cfg.skip:
                # skip layer: zero the columns that read the PE sin/cos channels
                w = normal_weight(keys[l], d_in_l, d_out_l,
                                  std=math.sqrt(2.0) / math.sqrt(d_out_l))
                w = w.at[-(dims[0] - cfg.d_in):, :].set(0.0)
                b = jnp.zeros((d_out_l,))
            else:
                w = normal_weight(keys[l], d_in_l, d_out_l,
                                  std=math.sqrt(2.0) / math.sqrt(d_out_l))
                b = jnp.zeros((d_out_l,))
            layers.append(init_dense(keys[l], d_in_l, d_out_l,
                                     weight_norm=cfg.weight_norm, weight=w, bias=b))
        else:
            layers.append(init_dense(keys[l], d_in_l, d_out_l, weight_norm=cfg.weight_norm))
    return layers


def sdf_apply(params, x: jnp.ndarray, cfg: SDFConfig = SDFConfig()) -> jnp.ndarray:
    """Full forward: [..., 3] -> [..., d_out] (sdf value first, then features)."""
    x = x * cfg.scale
    inputs = positional_encode(x, cfg.multires) if cfg.multires > 0 else x
    h = cast_hidden(inputs)
    n_lin = len(params)
    for l in range(n_lin):
        if l == cfg.skip:
            h = jnp.concatenate([h, cast_hidden(inputs)], axis=-1) / math.sqrt(2.0)
            h = cast_hidden(h)
        h = apply_dense(params[l], h)
        if l < n_lin - 1:
            h = cast_hidden(softplus_beta(h, cfg.beta))
    return h


def sdf_value(params, x: jnp.ndarray, cfg: SDFConfig = SDFConfig()) -> jnp.ndarray:
    """[..., 3] -> [..., 1] signed distance."""
    return sdf_apply(params, x, cfg)[..., :1]


def sdf_with_grad(params, x: jnp.ndarray, cfg: SDFConfig = SDFConfig(),
                  mode: str = "rev"):
    """Returns (sdf [...,1], features [...,d_out-1], grad [...,3]).

    grad is d(sdf)/dx, differentiable (second order works through it).
    mode: 'rev' — reverse-mode spatial gradient (one extra backward pass);
          'fwd' — jax.linearize + 3 basis tangents (three linear passes that
          transpose cheaply under the outer training gradient).
    """
    if mode == "fwd":
        out, lin = jax.linearize(lambda p: sdf_apply(params, p, cfg), x)
        basis = jnp.eye(3, dtype=x.dtype)
        comps = [lin(jnp.broadcast_to(basis[i], x.shape))[..., 0] for i in range(3)]
        grad = jnp.stack(comps, axis=-1)
        return out[..., :1], out[..., 1:], grad

    out = sdf_apply(params, x, cfg)

    def scalar_sum(pts):
        return jnp.sum(sdf_apply(params, pts, cfg)[..., 0])

    grad = jax.grad(scalar_sum)(x)
    return out[..., :1], out[..., 1:], grad


def sdf_grad(params, x: jnp.ndarray, cfg: SDFConfig = SDFConfig()) -> jnp.ndarray:
    def scalar_sum(pts):
        return jnp.sum(sdf_apply(params, pts, cfg)[..., 0])
    return jax.grad(scalar_sum)(x)
