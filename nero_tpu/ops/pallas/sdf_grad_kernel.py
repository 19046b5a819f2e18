"""Fused SDF-with-spatial-gradient kernel, forward AND backward in VMEM.

The Stage-I training step is HBM-bandwidth-bound: the XLA lowering of
`fields/sdf.py::sdf_with_grad` + its outer VJP round-trips every [R*S, 256]
activation (primal + 3 jvp tangent columns + adjoints) through HBM — measured
3.1 GB/fwd and 15.7 GB/vjp at the training lattice [512x128], saturating the
chip's HBM while the MXU idles at ~20% (tools/trace_stage1.py: 57% of device
time in elementwise fusions, 23% in matmuls).

This kernel computes, per block of sample points and entirely in VMEM:

  forward:  PE(6) -> 9-layer weight-norm-resolved MLP (softplus beta=100,
            skip concat at layer 4) carrying the primal row-block plus 3
            forward-mode tangent row-blocks (d/dx,d/dy,d/dz) through the
            same matmuls -> (sdf, feats[256], grad[3]).
            HBM traffic: pts in, (sdf,grad) + feats out. Nothing else.
  backward: recomputes the forward in VMEM (flash-attention-style), then
            reverse-propagates the (d_sdf, d_feats, d_grad) cotangents
            through the tangent-carrying structure — the second-order
            softplus'' term included — accumulating parameter gradients
            across the grid in VMEM. d/d(pts) is NOT produced (returned as
            zeros): sample positions are detached upstream (z_vals are
            detached in render/shape.py::sample_z_vals; ray origins/dirs are
            data), so no gradient flows through them by construction.

Tangent algebra per layer (z = h@W + b, h' = act(z)):
    primal   h_{l+1} = softplus_b(z_l)
    tangent  u_{l+1} = sigmoid(b z_l) * (u_l @ W)           [no bias]
  reverse, given cotangents (h^, u^):
    z^  = s*h^ + b*s*(1-s) * sum_j v_j * u^_j               [2nd order]
    v^_j = s * u^_j
    dW  += h^T z^ + sum_j u_j^T v^_j   (one stacked contraction)
    h^_prev = z^ @ W^T,  u^_prev,j = v^_j @ W^T

The PE is built in-register from a constant trig-matmul: PE = x@E +
sin(x@F + P) (identity columns via E, octave frequencies via F, cos as a
pi/2 phase), so tangent-PE_j = E_j + cos(x@F + P) * F_j. No concats.

Parity target: reference network/field.py:60-181 (SDFNetwork with
create_graph=True double backprop, field.py:155-167); the kernel reproduces
`sdf_with_grad` within bf16-activation noise (tests/test_sdf_grad_kernel.py).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from nero_tpu.fields.sdf import SDFConfig
from nero_tpu.ops.mlp import resolve_weight_norm

BB_FWD = 512   # rows (sample points) per forward program
BB_BWD = 256    # rows per backward program (VMEM: 9 stored preact layers)
PE_PAD = 128    # 39 PE channels padded to one lane tile
OUT_PAD = 384   # 257 outputs padded to three lane tiles

_PACK_NAMES = ("w0", "w1", "w2", "w3", "w4a", "w4b", "w5", "w6", "w7",
               "w8", "b", "const")


def _pe_consts(cfg: SDFConfig) -> np.ndarray:
    """[8, PE_PAD] rows: 0-2 identity selector E, 3-5 frequency F, 6 phase P,
    7 trig mask."""
    pe = 3 + 6 * cfg.multires
    c = np.zeros((8, PE_PAD), np.float32)
    for k in range(3):
        c[k, k] = 1.0                       # identity columns
    for i in range(cfg.multires):
        for k in range(3):
            s_col = 3 + 6 * i + k
            c_col = 3 + 6 * i + 3 + k
            c[3 + k, s_col] = 2.0 ** i
            c[3 + k, c_col] = 2.0 ** i
            c[6, c_col] = math.pi / 2.0     # cos = sin(. + pi/2)
            c[7, s_col] = 1.0
            c[7, c_col] = 1.0
    assert pe <= PE_PAD
    return c


def pack_sdf_grad_params(params, cfg: SDFConfig):
    """Weight-norm resolution + padding into the kernel layout (all
    differentiable jnp ops — the custom_vjp boundary sits below this)."""
    assert cfg.n_layers == 8 and cfg.skip == 4 and cfg.d_hidden == 256 \
        and cfg.d_out == 257 and cfg.multires > 0, "kernel supports the default topology"
    pe = 3 + 6 * cfg.multires
    skip_w = cfg.d_hidden - pe              # 217
    layers = resolve_weight_norm(params)
    ws = [l["w"] for l in layers]
    bs = [l["b"] for l in layers]
    inv_s2 = 1.0 / math.sqrt(2.0)

    def pad_to(a, rows, cols):
        return jnp.pad(a, ((0, rows - a.shape[0]), (0, cols - a.shape[1])))

    packed = {
        "w0": pad_to(ws[0], PE_PAD, 256),
        "w1": ws[1], "w2": ws[2],
        "w3": pad_to(ws[3], 256, 256),                    # 217 out cols
        "w4a": pad_to(ws[4][:skip_w] * inv_s2, 256, 256),  # h-part rows
        "w4b": pad_to(ws[4][skip_w:] * inv_s2, PE_PAD, 256),  # PE-part rows
        "w5": ws[5], "w6": ws[6], "w7": ws[7],
        "w8": pad_to(ws[8], 256, OUT_PAD),
    }
    b = jnp.zeros((16, OUT_PAD))
    for l in range(9):
        b = b.at[l, :bs[l].shape[0]].set(bs[l])
    packed["b"] = b
    packed["const"] = jnp.asarray(_pe_consts(cfg))
    return packed


def unpack_sdf_grad_param_grads(grads: dict, params, cfg: SDFConfig):
    """Kernel-layout param grads -> plain-weight grads [(dw, db) per layer]."""
    pe = 3 + 6 * cfg.multires
    skip_w = cfg.d_hidden - pe
    inv_s2 = 1.0 / math.sqrt(2.0)
    dws = [
        grads["dw0"][:pe],
        grads["dwmid"][0], grads["dwmid"][1],
        grads["dwmid"][2][:, :skip_w],
        jnp.concatenate([grads["dwmid"][3][:skip_w] * inv_s2,
                         grads["dw4b"][:pe] * inv_s2], axis=0),
        grads["dwmid"][4], grads["dwmid"][5], grads["dwmid"][6],
        grads["dw8"][:, :257],
    ]
    widths = [256, 256, 256, skip_w, 256, 256, 256, 256, 257]
    dbs = [grads["db"][l, :widths[l]] for l in range(9)]
    return dws, dbs


# ---------------------------------------------------------------------------
# shared in-kernel pieces
# ---------------------------------------------------------------------------


def _bf(a):
    return a.astype(jnp.bfloat16)


def _mm(h, w):
    """[rows, k] @ [k, cols] on the MXU, bf16 in / f32 accumulate."""
    return jnp.dot(_bf(h), _bf(w), preferred_element_type=jnp.float32)


def _mm_t(g, w):
    """g [rows, d_out] @ w^T -> [rows, d_in] without materialising w^T."""
    return jax.lax.dot_general(_bf(g), _bf(w),
                               dimension_numbers=(((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_dw(h, g):
    """h [rows, d_in], g [rows, d_out] -> dW [d_in, d_out] (contract rows)."""
    return jax.lax.dot_general(_bf(h), _bf(g),
                               dimension_numbers=(((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _pe_blocks(pts, const, scale, bb):
    """pts [bb, 8] (x,y,z,...) -> stacked [4*bb, PE_PAD]: PE + 3 tangent-PEs.

    Built with f32 VPU ops (per-coordinate broadcasts, no matmul) so the
    encoding is exact — the top octave (2^5 x) is far below bf16 resolution.
    The bf16 cast happens at the consuming matmul, exactly like the XLA
    bf16_hidden path (PE in f32, cast_hidden after). Tangents are w.r.t. the
    UNSCALED input (chain rule through x*scale)."""
    E = const[0:3]                 # [3, PE_PAD]
    F = const[3:6]
    P = const[6:7]
    M = const[7:8]
    xs = [pts[:, k:k + 1] * scale for k in range(3)]     # [bb,1] f32 each
    A = xs[0] * F[0:1] + xs[1] * F[1:2] + xs[2] * F[2:3] + P
    ident = xs[0] * E[0:1] + xs[1] * E[1:2] + xs[2] * E[2:3]
    pe = ident + jnp.sin(A) * M
    cosA = jnp.cos(A) * M
    tangents = [scale * (jnp.broadcast_to(E[j:j + 1], (bb, PE_PAD))
                         + cosA * jnp.broadcast_to(F[j:j + 1], (bb, PE_PAD)))
                for j in range(3)]
    return jnp.concatenate([pe] + tangents, axis=0)


def _softplus_b(z, beta):
    return jax.nn.softplus(beta * z) * (1.0 / beta)


def _fwd_layers(pe_all, packed_refs, beta, bb, keep_preacts=False):
    """Run the 9 layers on the stacked [4*bb, .] block.

    Returns (z8 [4bb, OUT_PAD], preacts list) — preacts[l] is the full
    stacked pre-activation of layer l (f32), only kept when requested."""
    (w0, w1, w2, w3, w4a, w4b, w5, w6, w7, w8, b, _const) = packed_refs
    rows = jax.lax.broadcasted_iota(jnp.int32, (4 * bb, 1), 0)
    bias_mask = (rows < bb).astype(jnp.float32)         # bias: primal rows only
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
    mask217 = (lane < 217).astype(jnp.float32)

    preacts = []

    def act(z, width_mask=None):
        zp = z[:bb]
        zt = z[bb:]
        s = jax.nn.sigmoid(beta * zp)
        h = jnp.concatenate([_softplus_b(zp, beta),
                             jnp.concatenate([s, s, s], axis=0) * zt], axis=0)
        if width_mask is not None:
            h = h * width_mask
        return h

    z = _mm(pe_all, w0) + b[0:1, :256] * bias_mask
    if keep_preacts:
        preacts.append(_bf(z))  # bf16 store: 9 stacked layers must fit VMEM
    h = act(z)
    for l, w in [(1, w1), (2, w2), (3, w3)]:
        z = _mm(h, w) + b[l:l + 1, :256] * bias_mask
        if keep_preacts:
            preacts.append(_bf(z))
        h = act(z, mask217 if l == 3 else None)
    # skip: z4 = (concat(h3, pe)/sqrt2) @ w4 + b4, as two matmuls
    z = _mm(h, w4a) + _mm(pe_all, w4b) + b[4:5, :256] * bias_mask
    if keep_preacts:
        preacts.append(_bf(z))
    h = act(z)
    for l, w in [(5, w5), (6, w6), (7, w7)]:
        z = _mm(h, w) + b[l:l + 1, :256] * bias_mask
        if keep_preacts:
            preacts.append(_bf(z))
        h = act(z)
    z8 = _mm(h, w8) + b[8:9] * bias_mask
    return z8, preacts


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(pts_ref, *rest, beta, scale, bb):
    packed_refs = [r[...] for r in rest[:-2]]
    sg_ref, feats_ref = rest[-2], rest[-1]
    pe_all = _pe_blocks(pts_ref[...], packed_refs[-1], scale, bb)
    z8, _ = _fwd_layers(pe_all, packed_refs, beta, bb)
    feats_ref[...] = z8[:bb, 1:257]
    sdf = z8[:bb, 0:1]
    grad = jnp.concatenate([z8[bb * (j + 1):bb * (j + 2), 0:1]
                            for j in range(3)], axis=1)
    sg = jnp.concatenate([sdf, grad], axis=1)           # [bb, 4]
    sg_ref[...] = jnp.pad(sg, ((0, 0), (0, 4)))


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(pts_ref, gsg_ref, gfeats_ref, *rest, beta, scale, bb):
    packed_refs = [r[...] for r in rest[:12]]
    (w0, w1, w2, w3, w4a, w4b, w5, w6, w7, w8, b, _const) = packed_refs
    dw0_ref, dwmid_ref, dw4b_ref, dw8_ref, db_ref = rest[12:]

    pe_all = _pe_blocks(pts_ref[...], packed_refs[-1], scale, bb)
    _, preacts = _fwd_layers(pe_all, packed_refs, beta, bb, keep_preacts=True)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
    mask217 = (lane < 217).astype(jnp.float32)

    def h_of(l):
        """Stacked post-activation input of layer l+1 (recomputed)."""
        z = preacts[l].astype(jnp.float32)
        zp, zt = z[:bb], z[bb:]
        s = jax.nn.sigmoid(beta * zp)
        h = jnp.concatenate([_softplus_b(zp, beta),
                             jnp.concatenate([s, s, s], axis=0) * zt], axis=0)
        return h * mask217 if l == 3 else h

    # cotangent of z8: primal rows [d_sdf, d_feats]; tangent rows j get
    # d_grad_j in the sdf column (concat-built: scatter has no TPU lowering)
    gsg = gsg_ref[...]                                   # [bb, 8]
    zcol = jnp.zeros((bb, OUT_PAD - 257), jnp.float32)
    primal = jnp.concatenate([gsg[:, 0:1], gfeats_ref[...], zcol], axis=1)
    zrest = jnp.zeros((bb, OUT_PAD - 1), jnp.float32)
    tang = [jnp.concatenate([gsg[:, j + 1:j + 2], zrest], axis=1)
            for j in range(3)]
    gz = jnp.concatenate([primal] + tang, axis=0)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw0_ref[...] = jnp.zeros_like(dw0_ref)
        dwmid_ref[...] = jnp.zeros_like(dwmid_ref)
        dw4b_ref[...] = jnp.zeros_like(dw4b_ref)
        dw8_ref[...] = jnp.zeros_like(dw8_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    def through_act(gh, l):
        """Cotangent of h_{l+1}=act(z_l) -> cotangent of z_l (2nd order)."""
        z = preacts[l].astype(jnp.float32)
        zp, zt = z[:bb], z[bb:]
        s = jax.nn.sigmoid(beta * zp)
        s2 = beta * s * (1.0 - s)                        # softplus_b''
        ghp, ght = gh[:bb], gh[bb:]
        mix = (zt[:bb] * ght[:bb] + zt[bb:2 * bb] * ght[bb:2 * bb]
               + zt[2 * bb:] * ght[2 * bb:])
        gzp = s * ghp + s2 * mix
        gzt = jnp.concatenate([s, s, s], axis=0) * ght
        gz = jnp.concatenate([gzp, gzt], axis=0)
        return gz * mask217 if l == 3 else gz

    def accum_db(l, gz, width):
        db_ref[l:l + 1, :width] += jnp.sum(gz[:bb, :width], axis=0,
                                           keepdims=True)

    # layer 8
    h7 = h_of(7)
    dw8_ref[...] += _mm_dw(h7, gz)
    accum_db(8, gz, OUT_PAD)
    gh = _mm_t(gz, w8)                                   # [4bb, 256]

    for l, w in [(7, w7), (6, w6), (5, w5)]:
        gz = through_act(gh, l)
        dwmid_ref[l - 1] += _mm_dw(h_of(l - 1), gz)
        accum_db(l, gz, 256)
        gh = _mm_t(gz, w)

    # layer 4 (skip): z4 = h3a @ w4a + pe @ w4b
    gz = through_act(gh, 4)
    dwmid_ref[3] += _mm_dw(h_of(3), gz)
    dw4b_ref[...] += _mm_dw(pe_all, gz)
    accum_db(4, gz, 256)
    gh = _mm_t(gz, w4a)

    for l, w in [(3, w3), (2, w2), (1, w1)]:
        gz = through_act(gh, l)
        dwmid_ref[l - 1] += _mm_dw(h_of(l - 1), gz)
        accum_db(l, gz, 256)
        gh = _mm_t(gz, w)

    gz = through_act(gh, 0)
    dw0_ref[...] += _mm_dw(pe_all, gz)
    accum_db(0, gz, 256)
    # d_pts intentionally not computed (detached upstream; see module doc)


# ---------------------------------------------------------------------------
# pallas_call plumbing + custom VJP
# ---------------------------------------------------------------------------

from jax.experimental import pallas as pl          # noqa: E402
from jax.experimental.pallas import tpu as pltpu   # noqa: E402


def _param_specs():
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in _PACK_NAMES]


@functools.partial(jax.jit, static_argnames=("beta", "scale", "interpret"))
def _fwd_call(pts8, packed_tuple, beta, scale, interpret=False):
    n = pts8.shape[0]
    bb = BB_FWD
    grid = (n // bb,)
    sg, feats = pl.pallas_call(
        functools.partial(_fwd_kernel, beta=beta, scale=scale, bb=bb),
        name="nero_sdf_grad_fwd",
        out_shape=(jax.ShapeDtypeStruct((n, 8), jnp.float32),
                   jax.ShapeDtypeStruct((n, 256), jnp.float32)),
        grid=grid,
        in_specs=[pl.BlockSpec((bb, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] + _param_specs(),
        out_specs=(pl.BlockSpec((bb, 8), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((bb, 256), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(pts8, *packed_tuple)
    return sg, feats


@functools.partial(jax.jit, static_argnames=("beta", "scale", "interpret"))
def _bwd_call(pts8, gsg, gfeats, packed_tuple, beta, scale, interpret=False):
    n = pts8.shape[0]
    bb = BB_BWD
    grid = (n // bb,)
    acc = lambda *shape: pl.BlockSpec(shape, lambda i: tuple([0] * len(shape)),
                                      memory_space=pltpu.VMEM)
    dw0, dwmid, dw4b, dw8, db = pl.pallas_call(
        functools.partial(_bwd_kernel, beta=beta, scale=scale, bb=bb),
        name="nero_sdf_grad_bwd",
        out_shape=(jax.ShapeDtypeStruct((PE_PAD, 256), jnp.float32),
                   jax.ShapeDtypeStruct((7, 256, 256), jnp.float32),
                   jax.ShapeDtypeStruct((PE_PAD, 256), jnp.float32),
                   jax.ShapeDtypeStruct((256, OUT_PAD), jnp.float32),
                   jax.ShapeDtypeStruct((16, OUT_PAD), jnp.float32)),
        grid=grid,
        in_specs=[pl.BlockSpec((bb, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((bb, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((bb, 256), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] + _param_specs(),
        out_specs=(acc(PE_PAD, 256), acc(7, 256, 256), acc(PE_PAD, 256),
                   acc(256, OUT_PAD), acc(16, OUT_PAD)),
        interpret=interpret,
    )(pts8, gsg, gfeats, *packed_tuple)
    return dw0, dwmid, dw4b, dw8, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _sdf_core(packed_tuple, pts8, beta, scale, interpret):
    sg, feats = _fwd_call(pts8, packed_tuple, beta, scale, interpret)
    return sg, feats


def _sdf_core_fwd(packed_tuple, pts8, beta, scale, interpret):
    out = _sdf_core(packed_tuple, pts8, beta, scale, interpret)
    return out, (packed_tuple, pts8)


def _sdf_core_bwd(beta, scale, interpret, res, cots):
    packed_tuple, pts8 = res
    gsg, gfeats = cots
    dw0, dwmid, dw4b, dw8, db = _bwd_call(pts8, gsg, gfeats, packed_tuple,
                                          beta, scale, interpret)
    g = {"w0": dw0,
         "w1": dwmid[0], "w2": dwmid[1], "w3": dwmid[2], "w4a": dwmid[3],
         "w4b": dw4b,
         "w5": dwmid[4], "w6": dwmid[5], "w7": dwmid[6],
         "w8": dw8, "b": db[:16], "const": jnp.zeros((8, PE_PAD))}
    gpacked = tuple(g[name] for name in _PACK_NAMES)
    # sample positions are detached upstream by construction (module doc)
    return gpacked, jnp.zeros_like(pts8)


_sdf_core.defvjp(_sdf_core_fwd, _sdf_core_bwd)


# ---------------------------------------------------------------------------
# analytic FLOP accounting (core/mfu.py; XLA's cost_analysis reports 0 for
# custom calls, so the kernel publishes its own closed-form matmul counts)
# ---------------------------------------------------------------------------

# sum of K*N over the forward matmuls (rows are the 4x-stacked point block)
_K_FWD = 2 * PE_PAD * 256 + 7 * 256 * 256 + 256 * OUT_PAD
# reverse sweep: dW outer products + cotangent back-matmuls
_K_REV = (2 * 256 * OUT_PAD                    # dw8 + gh8
          + 6 * 2 * 256 * 256                  # layers 7,6,5,3,2,1
          + 256 * 256 + PE_PAD * 256 + 256 * 256   # layer 4 (skip)
          + PE_PAD * 256)                      # dw0


def hlo_flops(name: str, out_shapes, in_shapes):
    """Matmul FLOPs of one kernel invocation, from its HLO shapes.

    The 4x row stacking (primal + 3 tangent blocks) rides every matmul; the
    backward recomputes the forward in VMEM before the reverse sweep.
    Elementwise/transcendental ops are <2% here and are not counted
    (verified against XLA cost analysis of the equivalent unfused math in
    tests/test_mfu.py)."""
    if name == "nero_sdf_grad_fwd":
        n = out_shapes[0][0]                   # (n, 8)
        return 2.0 * 4 * n * _K_FWD
    if name == "nero_sdf_grad_bwd":
        n = in_shapes[0][0]                    # pts8 (n, 8)
        return 2.0 * 4 * n * (_K_FWD + _K_REV)
    return None


def sdf_with_grad_fused(params, x: jnp.ndarray, cfg: SDFConfig,
                        interpret: bool = False):
    """Drop-in for fields/sdf.py::sdf_with_grad on the training lattice.

    Returns (sdf [...,1], feats [...,256], grad [...,3]). Gradients flow to
    `params` (through weight-norm) but NOT to `x` (see module docstring).
    """
    shape = x.shape[:-1]
    n = int(np.prod(shape))
    packed = pack_sdf_grad_params(params, cfg)
    from nero_tpu.ops.pallas.interp import resolve
    interpret = resolve(interpret)
    packed_tuple = tuple(packed[k] for k in _PACK_NAMES)
    bb = max(BB_FWD, BB_BWD)
    n_pad = (-n) % bb
    pts8 = jnp.pad(x.reshape(n, 3), ((0, n_pad), (0, 5)))
    sg, feats = _sdf_core(packed_tuple, pts8, float(cfg.beta),
                          float(cfg.scale), interpret)
    sdf = sg[:n, 0:1].reshape(*shape, 1)
    grad = sg[:n, 1:4].reshape(*shape, 3)
    feats = feats[:n].reshape(*shape, 256)
    return sdf, feats, grad
