"""Fused 4-layer prediction-head kernel (forward + backward in VMEM).

The Stage-I shader evaluates six `make_predictor`-shaped heads (parity:
reference network/field.py:310-346 — Linear(d_in,256) ReLU x3 ->
Linear(256,d_out)) over the full [R*S] sample lattice. The XLA lowering
materialises every hidden activation (and, under grad, its cotangent) in
HBM: ~6 x 3 x [N,256] tensors per direction, which makes the shader
HBM-bound (measured 3.65 ms fwd / 12.7 ms vjp at [512x128] vs a ~0.5/1.5 ms
bf16 compute floor — tools/profile_core_parts.py).

This kernel runs one head per pallas_call, entirely in VMEM per row-block:

  forward:  x[bb, DI] -> 3x (matmul + ReLU) -> matmul -> out[bb, DO].
            HBM traffic: x in, out out. The final activation (sigmoid /
            exp / affine) stays OUTSIDE the kernel so its (cheap) grad is
            handled by XLA and the kernel stays linear+ReLU only.
  backward: recomputes the forward (preacts stored bf16 in VMEM), then
            reverse-propagates d_out -> (d_x, d_params), accumulating the
            parameter grads across the grid in VMEM.

Weights are expected weight-norm-resolved ({w,b}; `resolve_weight_norm` is
applied and is a pass-through there) and padded to lane multiples; bf16
matmul inputs / f32 accumulation, like the rest of the TPU hot path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nero_tpu.ops.mlp import resolve_weight_norm

BB = 512          # rows per program
HID = 256


def _bf(a):
    return a.astype(jnp.bfloat16)


def _mm(h, w):
    return jnp.dot(_bf(h), _bf(w), preferred_element_type=jnp.float32)


def _mm_t(g, w):
    return jax.lax.dot_general(_bf(g), _bf(w),
                               dimension_numbers=(((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_dw(h, g):
    return jax.lax.dot_general(_bf(h), _bf(g),
                               dimension_numbers=(((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _pad_dim(d: int) -> int:
    return max(128, -(-d // 128) * 128)


def pack_predictor_params(layers):
    """4x {w,b} (or {v,g,b}) -> padded kernel layout (differentiable ops)."""
    layers = resolve_weight_norm(layers)
    assert len(layers) == 4
    ws = [l["w"] for l in layers]
    bs = [l["b"] for l in layers]
    d_in, d_out = ws[0].shape[0], ws[3].shape[1]
    DI, DO = _pad_dim(d_in), _pad_dim(d_out)
    assert ws[1].shape == (HID, HID) and ws[2].shape == (HID, HID)
    assert DO <= HID, "db accumulator assumes d_out tile <= hidden width"

    def pad_to(a, rows, cols):
        return jnp.pad(a, ((0, rows - a.shape[0]), (0, cols - a.shape[1])))

    b = jnp.zeros((8, HID))
    for l in range(3):
        b = b.at[l, :HID].set(bs[l])
    b = b.at[3, :d_out].set(bs[3])
    return (pad_to(ws[0], DI, HID), ws[1], ws[2], pad_to(ws[3], HID, DO), b)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, w1_ref, w2_ref, w3_ref, w4_ref, b_ref, out_ref):
    b = b_ref[...]
    h = jnp.maximum(_mm(x_ref[...], w1_ref[...]) + b[0:1], 0.0)
    h = jnp.maximum(_mm(h, w2_ref[...]) + b[1:2], 0.0)
    h = jnp.maximum(_mm(h, w3_ref[...]) + b[2:3], 0.0)
    z4 = _mm(h, w4_ref[...])
    out_ref[...] = z4 + b[3:4, :z4.shape[1]]


def _bwd_kernel(x_ref, gout_ref, w1_ref, w2_ref, w3_ref, w4_ref, b_ref,
                dx_ref, dw1_ref, dw2_ref, dw3_ref, dw4_ref, db_ref):
    b = b_ref[...]
    x = x_ref[...]
    z1 = _mm(x, w1_ref[...]) + b[0:1]
    h1 = jnp.maximum(z1, 0.0)
    z2 = _mm(h1, w2_ref[...]) + b[1:2]
    h2 = jnp.maximum(z2, 0.0)
    z3 = _mm(h2, w3_ref[...]) + b[2:3]
    h3 = jnp.maximum(z3, 0.0)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        dw3_ref[...] = jnp.zeros_like(dw3_ref)
        dw4_ref[...] = jnp.zeros_like(dw4_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    gz4 = gout_ref[...]
    dw4_ref[...] += _mm_dw(h3, gz4)
    db4 = jnp.sum(gz4, axis=0, keepdims=True)            # [1, DO]
    gz3 = _mm_t(gz4, w4_ref[...]) * (z3 > 0.0)
    dw3_ref[...] += _mm_dw(h2, gz3)
    gz2 = _mm_t(gz3, w3_ref[...]) * (z2 > 0.0)
    dw2_ref[...] += _mm_dw(h1, gz2)
    gz1 = _mm_t(gz2, w2_ref[...]) * (z1 > 0.0)
    dw1_ref[...] += _mm_dw(x, gz1)
    dx_ref[...] = _mm_t(gz1, w1_ref[...])
    db123 = jnp.concatenate(
        [jnp.sum(g, axis=0, keepdims=True) for g in (gz1, gz2, gz3)], axis=0)
    db_ref[...] += jnp.concatenate(
        [db123, jnp.pad(db4, ((0, 0), (0, HID - db4.shape[1]))),
         jnp.zeros((4, HID), jnp.float32)], axis=0)


# ---------------------------------------------------------------------------
# pallas_call plumbing + custom VJP
# ---------------------------------------------------------------------------


def _vspec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fwd_call(x_pad, packed, interpret=False):
    n, DI = x_pad.shape
    DO = packed[3].shape[1]
    grid = (n // BB,)
    return pl.pallas_call(
        _fwd_kernel,
        name="nero_predictor_fwd",
        out_shape=jax.ShapeDtypeStruct((n, DO), jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec((BB, DI), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] + [_vspec()] * 5,
        out_specs=pl.BlockSpec((BB, DO), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_pad, *packed)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bwd_call(x_pad, gout, packed, interpret=False):
    n, DI = x_pad.shape
    DO = packed[3].shape[1]
    grid = (n // BB,)
    acc = lambda *shape: pl.BlockSpec(shape, lambda i: tuple([0] * len(shape)),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bwd_kernel,
        name="nero_predictor_bwd",
        out_shape=(jax.ShapeDtypeStruct((n, DI), jnp.float32),
                   jax.ShapeDtypeStruct((DI, HID), jnp.float32),
                   jax.ShapeDtypeStruct((HID, HID), jnp.float32),
                   jax.ShapeDtypeStruct((HID, HID), jnp.float32),
                   jax.ShapeDtypeStruct((HID, DO), jnp.float32),
                   jax.ShapeDtypeStruct((8, HID), jnp.float32)),
        grid=grid,
        in_specs=[pl.BlockSpec((BB, DI), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BB, DO), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] + [_vspec()] * 5,
        out_specs=(pl.BlockSpec((BB, DI), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   acc(DI, HID), acc(HID, HID), acc(HID, HID), acc(HID, DO),
                   acc(8, HID)),
        interpret=interpret,
    )(x_pad, gout, *packed)


def hlo_flops(name: str, out_shapes, in_shapes):
    """Matmul FLOPs of one head invocation (core/mfu.py accounting)."""
    if name == "nero_predictor_fwd":
        n, di = in_shapes[0]
        do = out_shapes[0][1]
        return 2.0 * n * (di * HID + 2 * HID * HID + HID * do)
    if name == "nero_predictor_bwd":
        n, di = in_shapes[0]
        do = in_shapes[1][1]
        # recompute z1..z3 + reverse sweep (dw4,gz3,dw3,gz2,dw2,gz1,dw1,dx)
        return 2.0 * n * (di * HID + 2 * HID * HID
                          + 2 * HID * do + 4 * HID * HID + 2 * di * HID)
    return None


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _head_core(packed, x_pad, interpret):
    return _fwd_call(x_pad, packed, interpret)


def _head_core_fwd(packed, x_pad, interpret):
    return _head_core(packed, x_pad, interpret), (packed, x_pad)


def _head_core_bwd(interpret, res, gout):
    packed, x_pad = res
    dx, dw1, dw2, dw3, dw4, db = _bwd_call(x_pad, gout, packed, interpret)
    return (dw1, dw2, dw3, dw4, db), dx


_head_core.defvjp(_head_core_fwd, _head_core_bwd)


def predictor_fused(layers, x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Fused head forward: [..., d_in] -> [..., d_out] PRE-activation.

    Drop-in for the linear/ReLU body of ops/mlp.py::apply_predictor; the
    caller applies the final activation. Gradients flow to both `layers`
    and `x`.
    """
    from nero_tpu.ops.pallas.interp import resolve
    interpret = resolve(interpret)
    d_in = x.shape[-1]
    resolved = resolve_weight_norm(layers)
    d_out = resolved[3]["w"].shape[1]
    shape = x.shape[:-1]
    n = int(np.prod(shape))
    DI = _pad_dim(d_in)
    n_pad = (-n) % BB
    x_pad = jnp.pad(x.reshape(n, d_in).astype(jnp.float32),
                    ((0, n_pad), (0, DI - d_in)))
    packed = pack_predictor_params(layers)
    out = _head_core(packed, x_pad, interpret)
    return out[:n, :d_out].reshape(*shape, d_out)
