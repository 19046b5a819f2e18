"""Fused SDF-forward Pallas kernel (PE + 9-layer weight-norm MLP in VMEM).

The Stage-I hot loop spends ~30% of each step on *forward-only* SDF
evaluations: the hierarchical proposal sampler (reference renderer.py:403-443)
and the occlusion-supervision march (reference field.py:454-484) are both
no-grad. XLA runs them as 10 separate HBM-roundtripping matmuls per eval;
this kernel keeps the whole MLP resident in VMEM and streams point blocks
through PE -> 9 matmuls (MXU, bf16 inputs / f32 accumulation) -> softplus,
writing only the final SDF scalar per point.

Only used on no-grad paths — the differentiable render path keeps the jnp
MLP so second-order autodiff composes. Weight-norm is folded into effective
weights once per call (an O(params) XLA op).

Layout notes (TPU tiling):
  * the PE features (39) are padded to 128 lanes; layer 0 consumes them via a
    padded [128, 256] weight;
  * the skip concat (reference field.py:139-140) is algebraically split:
    concat(h, pe) @ W4  ==  h_pad @ W4a + pe_pad @ W4b, avoiding unaligned
    lane writes;
  * the final layer keeps only the SDF column, emitted as [B, 128] lane 0.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from nero_tpu.fields.sdf import SDFConfig
from nero_tpu.utils.encodings import positional_encode

BLOCK = 512
PE_PAD = 128


def _effective_weight(layer):
    if "v" in layer:
        v = layer["v"]
        norm = jnp.linalg.norm(v, axis=0, keepdims=True)
        return layer["g"] * v / jnp.maximum(norm, 1e-12)
    return layer["w"]


def pack_sdf_params(params, cfg: SDFConfig):
    """Fold weight-norm + pad weights into the kernel's fixed layout.

    Returns a dict of padded arrays (all f32):
      w0 [PE_PAD,256] b0 [256]; w1..w3, w5..w7 [256,256] + biases;
      w4a [256,256] (zero rows beyond the 217 skip width), w4b [PE_PAD,256];
      w8 [256,128] (lane 0 = sdf column) b8 [128].
    """
    assert cfg.n_layers == 8 and cfg.multires > 0, "kernel supports the default topology"
    pe_dim = 3 + 6 * cfg.multires
    skip_w = cfg.d_hidden - pe_dim  # 217 for the default config
    ws = [_effective_weight(l) for l in params]
    bs = [l["b"] for l in params]

    w0 = jnp.zeros((PE_PAD, cfg.d_hidden)).at[:pe_dim].set(ws[0])
    w4 = ws[cfg.skip]  # [256, 256] rows: 0..216 from h, 217..255 from pe
    w4a = jnp.zeros((cfg.d_hidden, cfg.d_hidden)).at[:skip_w].set(w4[:skip_w])
    w4b = jnp.zeros((PE_PAD, cfg.d_hidden)).at[:pe_dim].set(w4[skip_w:])
    w8 = jnp.zeros((cfg.d_hidden, 128)).at[:, 0].set(ws[-1][:, 0])
    b8 = jnp.zeros((1, 128)).at[0, 0].set(bs[-1][0])

    # layer 3 is narrow (217 out, feeding the skip): pad to 256 lanes; the
    # zeroed rows of w4a make the padded activations (softplus(0)) inert.
    w3 = jnp.zeros((cfg.d_hidden, cfg.d_hidden)).at[:, :skip_w].set(ws[3])
    b3 = jnp.zeros((1, cfg.d_hidden)).at[0, :skip_w].set(bs[3])

    packed = {"w0": w0, "b0": bs[0][None], "w3": w3, "b3": b3,
              "w4a": w4a, "w4b": w4b, "b4": bs[4][None], "w8": w8, "b8": b8}
    for i in (1, 2, 5, 6, 7):
        packed[f"w{i}"] = ws[i]
        packed[f"b{i}"] = bs[i][None]  # [1, 256] (2-D for TPU layout)
    return packed


def _pe_block(x, multires: int):
    """[B,3] -> [B,PE_PAD] positional encoding (identity first, zero padded)."""
    feats = positional_encode(x, multires)  # [B, 3+6m]
    pad = PE_PAD - feats.shape[-1]
    return jnp.pad(feats, ((0, 0), (0, pad)))


def _softplus100(x):
    return jax.nn.softplus(100.0 * x) * 0.01


def _kernel(pts_ref, w0, b0, w1, b1, w2, b2, w3, b3, w4a, w4b, b4,
            w5, b5, w6, b6, w7, b7, w8, b8, out_ref, *, multires):
    x = pts_ref[...]  # [B, 128] (xyz in lanes 0..2)
    pe = _pe_block(x[:, :3], multires)
    cast = lambda a: a.astype(jnp.bfloat16)

    def dot(a, w):
        return jnp.dot(cast(a), cast(w[...]), preferred_element_type=jnp.float32)

    h = _softplus100(dot(pe, w0) + b0[...])
    h = _softplus100(dot(h, w1) + b1[...])
    h = _softplus100(dot(h, w2) + b2[...])
    h = _softplus100(dot(h, w3) + b3[...])  # [B,256] lanes >=217 are zero
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    h = _softplus100((dot(h, w4a) + dot(pe, w4b)) * inv_sqrt2 + b4[...])
    h = _softplus100(dot(h, w5) + b5[...])
    h = _softplus100(dot(h, w6) + b6[...])
    h = _softplus100(dot(h, w7) + b7[...])
    out_ref[...] = dot(h, w8) + b8[...]


@functools.partial(jax.jit, static_argnames=("multires", "interpret"))
def _sdf_fwd_padded(pts_padded, packed, multires: int, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = pts_padded.shape[0]
    grid = (n // BLOCK,)
    names = ["w0", "b0", "w1", "b1", "w2", "b2", "w3", "b3", "w4a", "w4b", "b4",
             "w5", "b5", "w6", "b6", "w7", "b7", "w8", "b8"]
    weight_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in names]
    out = pl.pallas_call(
        functools.partial(_kernel, multires=multires),
        name="nero_sdf_fwd",
        out_shape=jax.ShapeDtypeStruct((n, 128), jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec((BLOCK, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] + weight_specs,
        out_specs=pl.BlockSpec((BLOCK, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pts_padded, *[packed[k] for k in names])
    return out[:, 0]


# per-row matmul FLOPs: w0 [128,256], w1..w3 [256,256], skip (w4a [256,256]
# + w4b [128,256]), w5..w7 [256,256], w8 [256,128]
_ROW_FLOPS = 2 * (128 * 256 + 3 * 256 * 256 + 256 * 256 + 128 * 256
                  + 3 * 256 * 256 + 256 * 128)


def hlo_flops(name: str, out_shapes, in_shapes):
    if name == "nero_sdf_fwd":
        return float(out_shapes[0][0]) * _ROW_FLOPS    # out (n, 128)
    return None


def sdf_fwd_fused(packed, pts: jnp.ndarray, cfg: SDFConfig,
                  interpret: bool = False) -> jnp.ndarray:
    """Fused no-grad SDF forward: [..., 3] -> [..., 1]. TPU fast path
    (interpret=True runs the same kernel in the Pallas interpreter for tests)."""
    from nero_tpu.ops.pallas.interp import resolve
    interpret = resolve(interpret)
    # no-grad kernel: sever tangents BEFORE the pallas_call so autodiff never
    # asks it for a JVP (callers use it only on stop-gradient paths)
    packed = jax.tree_util.tree_map(jax.lax.stop_gradient, packed)
    pts = jax.lax.stop_gradient(pts)
    shape = pts.shape[:-1]
    flat = pts.reshape(-1, 3) * cfg.scale
    n = flat.shape[0]
    n_pad = (-n) % BLOCK
    flat = jnp.pad(flat, ((0, n_pad), (0, 0)))
    pts128 = jnp.pad(flat, ((0, 0), (0, 128 - 3)))
    sdf = _sdf_fwd_padded(pts128, packed, cfg.multires, interpret)
    return sdf[:n].reshape(*shape, 1)


def pallas_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
