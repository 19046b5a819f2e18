"""NeuS single-variance network: one learnable scalar -> inv_s.

Parity: reference network/field.py:184-201 (`SingleVarianceNetwork`),
activations exp / linear / square with the x10 gain.
"""
from __future__ import annotations

import jax.numpy as jnp


def init_variance(init_val: float = 0.3):
    return {"variance": jnp.asarray(init_val, jnp.float32)}


def inv_s(params, activation: str = "exp") -> jnp.ndarray:
    v = params["variance"]
    if activation == "exp":
        return jnp.exp(v * 10.0)
    if activation == "linear":
        return v * 10.0
    if activation == "square":
        return (v * 10.0) ** 2
    raise NotImplementedError(activation)
