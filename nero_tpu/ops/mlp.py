"""Functional dense layers and MLP heads as parameter pytrees.

All networks in the framework are pure functions of (params, inputs); params
are plain dicts of jnp arrays so they compose with jit/grad/shard_map and
checkpoint as flat trees.

Implements the two parametrisations the reference relies on:
  * weight normalisation  w = g * v / ||v||  per output unit (parity:
    torch nn.utils.weight_norm as used in reference network/field.py:118-119,
    323-333) — the norm is over the fan-in axis;
  * the "geometric" SDF initialisation and torch-default linear init used by
    the prediction heads (reference network/field.py:98-116 and torch
    nn.Linear defaults).

Matmuls run with preferred_element_type=float32 so the MXU accumulates in
fp32 even when activations are cast to bf16.
"""
from __future__ import annotations

import contextlib
import math
import threading
from typing import Sequence

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Hidden-activation storage dtype (trace-time context)
#
# TPU matmuls already consume bf16 operands under the default precision — but
# the activation tensors XLA materialises in HBM stay f32, and the training
# step is HBM-bound (saved activations + their cotangents dominate the
# backward). Casting hidden activations to bf16 halves that traffic without
# changing MXU input precision; accumulation stays f32 via
# preferred_element_type. Entered around the hot render core
# (render/shape.py `bf16_hidden`); None = keep f32.
# ---------------------------------------------------------------------------

_HIDDEN_DTYPE = threading.local()  # per-thread stack: concurrent traces
                                   # (async ckpt, parallel jit warmup) must not
                                   # leak casts into each other's graphs


def _stack():
    if not hasattr(_HIDDEN_DTYPE, "stack"):
        _HIDDEN_DTYPE.stack = [None]
    return _HIDDEN_DTYPE.stack


@contextlib.contextmanager
def hidden_dtype(dtype):
    s = _stack()
    s.append(dtype)
    try:
        yield
    finally:
        s.pop()


def cast_hidden(x: jnp.ndarray) -> jnp.ndarray:
    """Cast a hidden activation to the context storage dtype (no-op outside)."""
    dt = _stack()[-1]
    return x if dt is None or x.dtype == dt else x.astype(dt)


def current_hidden_dtype():
    """The active hidden-activation storage dtype (None outside any context).

    Lets kernel auto-resolution (e.g. the whole-shader fused kernel, which
    stores matmul operands in bf16 internally) respect an explicit
    bf16_hidden=False without plumbing the ShapeConfig through every call."""
    return _stack()[-1]


# ---------------------------------------------------------------------------
# Initialisers (return a [d_in, d_out] weight; we store x @ W layout)
# ---------------------------------------------------------------------------

def torch_default_weight(key, d_in: int, d_out: int) -> jnp.ndarray:
    """torch nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(in), 1/sqrt(in))."""
    bound = 1.0 / math.sqrt(d_in)
    return jax.random.uniform(key, (d_in, d_out), minval=-bound, maxval=bound)


def torch_default_bias(key, d_in: int, d_out: int) -> jnp.ndarray:
    bound = 1.0 / math.sqrt(d_in)
    return jax.random.uniform(key, (d_out,), minval=-bound, maxval=bound)


def normal_weight(key, d_in: int, d_out: int, mean: float = 0.0, std: float = 1.0) -> jnp.ndarray:
    return mean + std * jax.random.normal(key, (d_in, d_out))


# ---------------------------------------------------------------------------
# Dense layer with optional weight-norm reparametrisation
# ---------------------------------------------------------------------------

def init_dense(key, d_in: int, d_out: int, *, weight_norm: bool = True,
               weight: jnp.ndarray | None = None, bias: jnp.ndarray | None = None):
    """Create a dense-layer param dict. `weight`/`bias` default to torch init."""
    kw, kb = jax.random.split(key)
    w = torch_default_weight(kw, d_in, d_out) if weight is None else weight
    b = torch_default_bias(kb, d_in, d_out) if bias is None else jnp.asarray(bias)
    b = jnp.broadcast_to(b, (d_out,)).astype(jnp.float32)
    w = w.astype(jnp.float32)
    if weight_norm:
        g = jnp.linalg.norm(w, axis=0, keepdims=True)  # [1, d_out], fan-in norm
        return {"v": w, "g": g, "b": b}
    return {"w": w, "b": b}


def apply_dense(params, x: jnp.ndarray, *, precision=None) -> jnp.ndarray:
    if "v" in params:
        v = params["v"]
        norm = jnp.linalg.norm(v, axis=0, keepdims=True)
        w = params["g"] * v / jnp.maximum(norm, 1e-12)
    else:
        w = params["w"]
    y = jnp.dot(x, w, preferred_element_type=jnp.float32, precision=precision)
    return y + params["b"]


def resolve_weight_norm(params):
    """Materialise weight-norm layers ({v,g,b} -> {w,b}) across a param tree.

    Keeps the differentiated hot graph as plain matmuls; the chain rule back
    to {v,g} flows through this tiny transform. Measured step-time neutral on
    v5e (XLA already hoists the loop-invariant norm), but it guarantees the
    hoist in every context (vmap'd multi-scene, pallas packing) and makes the
    compiled graph easier to reason about.
    """
    if isinstance(params, dict):
        if "v" in params and "g" in params:
            v = params["v"]
            norm = jnp.linalg.norm(v, axis=0, keepdims=True)
            return {"w": params["g"] * v / jnp.maximum(norm, 1e-12), "b": params["b"]}
        return {k: resolve_weight_norm(x) for k, x in params.items()}
    if isinstance(params, (list, tuple)):
        return type(params)(resolve_weight_norm(x) for x in params)
    return params


def set_final_bias(params_seq, value: float):
    """Overwrite the bias of the last dense layer in a layer list (in place on the tree copy)."""
    params_seq = list(params_seq)
    last = dict(params_seq[-1])
    last["b"] = jnp.full_like(last["b"], value)
    params_seq[-1] = last
    return params_seq


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------

def softplus_beta(x: jnp.ndarray, beta: float = 100.0) -> jnp.ndarray:
    """Numerically-stable softplus with sharpness beta (reference uses beta=100)."""
    return jax.nn.softplus(beta * x) / beta


def exp_activation(x: jnp.ndarray, max_light: float = 5.0) -> jnp.ndarray:
    """exp with an upper clamp on the pre-activation (light intensity heads)."""
    return jnp.exp(jnp.minimum(x, max_light))


_ACTIVATIONS = {
    "sigmoid": jax.nn.sigmoid,
    "relu": jax.nn.relu,
    "none": lambda x: x,
}


# ---------------------------------------------------------------------------
# Prediction head: 4-layer 256-wide weight-norm MLP
# ---------------------------------------------------------------------------

def init_predictor(key, d_in: int, d_out: int, *, weight_norm: bool = True,
                   run_dim: int = 256, final_bias: float | None = None):
    """Parity with reference `make_predictor` (network/field.py:310-346):
    Linear(d_in,256) ReLU Linear ReLU Linear ReLU Linear(256,d_out) + act."""
    keys = jax.random.split(key, 4)
    dims = [(d_in, run_dim), (run_dim, run_dim), (run_dim, run_dim), (run_dim, d_out)]
    layers = [init_dense(k, di, do, weight_norm=weight_norm) for k, (di, do) in zip(keys, dims)]
    if final_bias is not None:
        layers = set_final_bias(layers, final_bias)
    return layers


def apply_predictor(layers, x: jnp.ndarray, activation: str = "sigmoid",
                    exp_max: float = 0.0, fused: bool = False) -> jnp.ndarray:
    if fused:
        # fused Pallas head (TPU): linear/ReLU body in one VMEM-resident
        # kernel with a custom VJP; the final activation stays in XLA.
        from nero_tpu.ops.pallas.predictor_kernel import predictor_fused
        h = predictor_fused(layers, x)
    else:
        h = cast_hidden(x)
        for layer in layers[:-1]:
            h = cast_hidden(jax.nn.relu(apply_dense(layer, h)))
        h = apply_dense(layers[-1], h)
    if activation == "exp":
        return exp_activation(h, exp_max)
    return _ACTIVATIONS[activation](h)


# ---------------------------------------------------------------------------
# Generic sequential MLP (used by MaterialFeatsNetwork etc.)
# ---------------------------------------------------------------------------

def init_mlp(key, dims: Sequence[int], *, weight_norm: bool = True):
    keys = jax.random.split(key, len(dims) - 1)
    return [init_dense(k, dims[i], dims[i + 1], weight_norm=weight_norm)
            for i, k in enumerate(keys)]


def apply_mlp(layers, x: jnp.ndarray, *, final_activation: bool = False) -> jnp.ndarray:
    h = cast_hidden(x)
    for i, layer in enumerate(layers):
        h = apply_dense(layer, h)
        if i < len(layers) - 1 or final_activation:
            h = cast_hidden(jax.nn.relu(h))
    return h
