"""Whole-shader fused kernel: Stage-I appearance shading, fwd AND bwd in VMEM.

Parity target: reference network/field.py:486-657 (`AppShadingNetwork`) —
the six `make_predictor` heads (metallic / roughness / albedo / outer light
/ inner light / occ weight), the Ref-NeRF IDE and NeRF positional encodings
feeding them, and the split-sum combine. The final FG-LUT gather and the
linear->sRGB combine stay OUTSIDE the kernel (they touch only [N,<=3]
tensors — byte-trivial — and the gather doesn't lower well in Mosaic).

Why fuse the WHOLE shader rather than per-head (ops/pallas/predictor_kernel
.py — whose round-3 "measured neutral" A/B later turned out to be vacuous,
XLA vs itself; see tools/bench_stage1_ab.py): the round-4 bytes ledger
(tools/profile_core_parts.py, data/r4_tpu/parts_bf16.log) shows the shader
VJP at 12.4 ms / 14.8 GB — ~56% of the fused step's counted bytes — and the
traffic is the *encodings* (IDE 72ch x 2 calls + PE 51/39ch), the six head
inputs, and their saved activations + cotangents. A per-head kernel still
round-trips every encoding and head input through HBM; this kernel's HBM
traffic is (geo 16ch + feats 256ch) in, a packed 24-channel raw-output
tensor out, and the parameters.

Backward strategy: instead of hand-deriving the spherical-harmonic IDE
gradients, the backward kernel RECOMPUTES the block forward and applies the
cotangent with `jax.vjp` *inside* the kernel body — linearization happens
at kernel-trace time, so Mosaic sees one flat VMEM-resident program
(validated exact vs XLA's own vjp; see tests/test_shader_kernel.py).
Parameter gradients accumulate across the row-block grid in f32 VMEM
accumulators (grid execution is sequential on TPU), exactly like
ops/pallas/predictor_kernel.py.

The one reference-op translation: `integrated_dir_encode`'s sequential
de-Moivre recurrence + static gather (utils/encodings.py:119-129) becomes
a VPU-wide polar evaluation — see `_ide_block`. Narrow [N,1] chains waste
127/128 VPU lanes inside a kernel; the first (recurrence-faithful) version
of this kernel measured 2.2x slower than XLA's forward for exactly that
reason, the wide form measures faster than XLA.

Supported topology: feats_dim=256, 4-layer 256-wide heads.
`sphere_direction` IS supported (it only widens the outer-light head input
72->144 and adds elementwise sphere geometry), and since round 5 so is
`human_light` (the GlossyReal regime): the per-point [3,4] camera poses
ride as 12 extra geometry channels (GEO_H=24), and the camera-plane
intersection + mip-NeRF IPE + the 7th head run in-kernel (_human_block) —
all elementwise VPU work plus one more head matmul chain, with the exp
activation, hit mask, and human/direct mixing outside in XLA.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nero_tpu.ops.mlp import resolve_weight_norm
from nero_tpu.utils.encodings import _ide_tables, ide_dim, positional_encode_dim

BB = 512          # rows per program
HID = 256
GEO = 16          # packed geometry channels: pts 0:3, normal 3:6, view 6:9
GEO_H = 24        # + human camera poses: R row-major 9:18, t 18:21, pad
OUT = 24          # packed raw outputs, see _unpack_out
N_CONST_ROWS = 40

HEAD_ORDER = ("metallic", "roughness", "albedo", "outer_light",
              "inner_light", "inner_weight")
# the GlossyReal camera-plane ("human") light head rides as a 7th head
# when cfg.human_light — its IPE encoding + plane intersection run
# in-kernel (see _human_block)
HEAD_ORDER_HUMAN = HEAD_ORDER + ("human_light",)


def _heads(human: bool):
    return HEAD_ORDER_HUMAN if human else HEAD_ORDER


def _bf(a):
    return a.astype(jnp.bfloat16)


def _mm(h, w):
    return jnp.dot(_bf(h), _bf(w), preferred_element_type=jnp.float32)


def _pad_dim(d: int) -> int:
    return max(128, -(-d // 128) * 128)


# ---------------------------------------------------------------------------
# IDE constants: selection matrices instead of the static gather
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _ide_consts_np(deg_view: int):
    """Rows 0:L+1 = z-Vandermonde coefficient matrix; then one row each of
    sigma, m (per ml entry), k = 0..L, odd(k). One [N_CONST_ROWS,128] f32."""
    m_arr, sigma, mat, l_max = _ide_tables(deg_view)
    n_ml = mat.shape[1]
    const = np.zeros((N_CONST_ROWS, 128), np.float32)
    const[:l_max + 1, :n_ml] = mat
    const[l_max + 1, :n_ml] = sigma
    const[l_max + 2, :n_ml] = m_arr.astype(np.float32)
    k = np.arange(l_max + 1, dtype=np.float32)
    const[l_max + 3, :l_max + 1] = k
    const[l_max + 4, :l_max + 1] = (np.arange(l_max + 1) % 2).astype(np.float32)
    return const, l_max, n_ml


def _ide_block(const, xyz, kappa_inv, l_max: int, n_ml: int):
    """In-kernel integrated directional encoding, VPU-wide formulation.

    The reference math (utils/encodings.py::integrated_dir_encode) builds
    (x+iy)^m by a sequential de-Moivre recurrence of [N,1] tensors and
    gathers per (m,l) entry — 30+ ops each using 1/128 of the VPU lanes.
    Here (x+iy)^m = r^m (cos m*phi, sin m*phi) is evaluated directly at all
    n_ml entries as [BB, n_ml]-wide ops, and the z-Vandermonde powers as
    exp(k*log|z|) with a parity sign — a handful of full-width
    transcendentals (measured: the narrow form made the fused forward 2.2x
    slower than XLA; this form is what makes the kernel competitive).
    NaN-safety under vjp: where() guards route the r=0 / z=0 gradients to
    constants, so padded rows can't poison the weight-grad accumulators.
    The z-Vandermonde matmul stays f32 (z^16 needs mantissa)."""
    mat = const[:l_max + 1, :n_ml]
    sigma = const[l_max + 1:l_max + 2, :n_ml]
    m_row = const[l_max + 2:l_max + 3, :n_ml]
    k_row = const[l_max + 3:l_max + 4, :l_max + 1]
    k_odd = const[l_max + 4:l_max + 5, :l_max + 1]
    x, y, z = xyz[:, 0:1], xyz[:, 1:2], xyz[:, 2:3]

    r2 = x * x + y * y
    safe = r2 > 1e-24
    phi = _atan2_poly(jnp.where(safe, y, 0.0), jnp.where(safe, x, 1.0))
    logr = 0.5 * jnp.log(jnp.maximum(r2, 1e-24))
    mphi = phi * m_row                                        # [BB, n_ml]
    rm = jnp.exp(logr * m_row)
    re_m = rm * jnp.cos(mphi)
    im_m = rm * jnp.sin(mphi)

    logz = jnp.log(jnp.maximum(jnp.abs(z), 1e-24))
    zpow = jnp.exp(logz * k_row)                              # [BB, L+1]
    sgn = jnp.where(z < 0, -1.0, 1.0)
    zpow = zpow * jnp.where(k_odd > 0.5, sgn, 1.0)
    pz = jnp.dot(zpow, mat, preferred_element_type=jnp.float32)

    atten = jnp.exp(-sigma * kappa_inv)                       # [BB, n_ml]
    return jnp.concatenate([re_m * pz * atten, im_m * pz * atten], axis=-1)


@functools.lru_cache(maxsize=None)
def _atan_coeffs():
    """Chebyshev fit of atan on t in [0,1] (monomial coeffs, highest first).
    Mosaic has no atan2 lowering; max |err| of the fit is ~1e-9 (f64),
    evaluation noise in f32 is the usual ~1e-6."""
    from numpy.polynomial import chebyshev as C
    t = np.linspace(0.0, 1.0, 4001)
    ch = C.Chebyshev.fit(t, np.arctan(t), deg=14, domain=[0.0, 1.0])
    return tuple(float(c) for c in ch.convert(kind=np.polynomial.Polynomial).coef[::-1])


def _atan2_poly(y, x):
    """atan2 via octant reduction + polynomial atan (elementwise, vjp-safe)."""
    ax, ay = jnp.abs(x), jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    t = jnp.minimum(ax, ay) / jnp.maximum(mx, 1e-24)
    acc = None
    for c in _atan_coeffs():
        acc = t * acc + c if acc is not None else jnp.full_like(t, c)
    at = acc
    half_pi = math.pi / 2.0
    phi = jnp.where(ay > ax, half_pi - at, at)
    phi = jnp.where(x < 0, math.pi - phi, phi)
    return jnp.where(y < 0, -phi, phi)


def _posenc_block(x, num_freqs: int):
    # one wide sin + one wide cos over all octaves (not 2*nf narrow calls),
    # then reorder slices to the reference's per-octave channel layout
    scaled = jnp.concatenate([x * (2.0 ** i) for i in range(num_freqs)], axis=-1)
    s, c = jnp.sin(scaled), jnp.cos(scaled)
    outs = [x]
    for i in range(num_freqs):
        outs.append(s[:, 3 * i:3 * i + 3])
        outs.append(c[:, 3 * i:3 * i + 3])
    return jnp.concatenate(outs, axis=-1)


def _normalize(v):
    n = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    return v / jnp.maximum(n, 1e-12)


def _head_fwd(p, x):
    """(w1,w2,w3,w4,bpack) fused 4-layer head; returns [BB, DOpad]."""
    w1, w2, w3, w4, b = p
    h = jnp.maximum(_mm(x, w1) + b[0:1], 0.0)
    h = jnp.maximum(_mm(h, w2) + b[1:2], 0.0)
    h = jnp.maximum(_mm(h, w3) + b[2:3], 0.0)
    z = _mm(h, w4)
    return z + b[3:4, :z.shape[1]]


def _pad_cols(a, width: int):
    d = a.shape[-1]
    if d == width:
        return a
    return jnp.concatenate([a, jnp.zeros(a.shape[:-1] + (width - d,), a.dtype)],
                           axis=-1)


# ---------------------------------------------------------------------------
# The whole-shader block forward (pure function of VMEM values)
# ---------------------------------------------------------------------------


def _human_block(p_human, geo, pts, reflective, roughness):
    """Camera-plane ("human") light head, parity with
    fields/app_shading.py::predict_human_light: rigid transform into the
    camera frame (pose rows packed in geo 9:21), XoY-plane intersection,
    mip-NeRF IPE of the masked 2-D hit (6 octaves, diagonal Gaussian with
    roughness-scaled variance — expected_sin is elementwise, VPU-wide),
    then the standard 4-layer head. Returns (human_z [BB,4], hitsf [BB,1]);
    the exp activation + hit mask + mixing run outside in XLA."""
    R = [geo[:, 9 + 3 * i:12 + 3 * i] for i in range(3)]   # rows of R
    t = geo[:, 18:21]
    dot = lambda a, b: jnp.sum(a * b, axis=-1, keepdims=True)
    pts_h = jnp.concatenate([dot(R[i], pts) for i in range(3)], -1) + t
    dirs_h = jnp.concatenate([dot(R[i], reflective) for i in range(3)], -1)
    hits = jnp.abs(dirs_h[:, 2:3]) > 1e-4
    dirs_z = jnp.where(hits, dirs_h[:, 2:3], 1e-4)
    dist = -pts_h[:, 2:3] / dirs_z
    inter_xy = pts_h[:, 0:2] + dist * dirs_h[:, 0:2]
    scale = 0.3
    mean = inter_xy * scale
    var = roughness * (dist * scale) ** 2
    hits = hits & (jnp.sqrt(jnp.sum(mean * mean, -1, keepdims=True)) < 1.5) \
        & (dist > 0)
    hitsf = hits.astype(mean.dtype)
    mean = mean * hitsf
    var = var * hitsf
    # IPE, deg 0..5: ordering matches utils/encodings.py::
    # integrated_pos_encode — all sin rows (octave-major, dim-minor), then
    # all cos rows; E[sin] over the Gaussian = exp(-var/2) sin(mean)
    sins, coss = [], []
    for i in range(6):
        s = 2.0 ** i
        att = jnp.exp(-0.5 * var * (s * s))
        sins.append(att * jnp.sin(mean * s))
        coss.append(att * jnp.cos(mean * s))
    ipe = jnp.concatenate(sins + coss, axis=-1)            # [BB, 24]
    human_z = _head_fwd(p_human, _pad_cols(ipe, p_human[0].shape[0]))[:, 0:4]
    return human_z, hitsf


def _shader_block(params, geo, feats, const, *, deg: int, pos_freq: int,
                  sphere_direction: bool, human: bool = False):
    """params: list of 6 (7 with human_light) head tuples. geo [BB,GEO or
    GEO_H], feats [BB,256]. Returns packed [BB, OUT] raw outputs:
      0 metallic_z | 1 roughness_z | 2:5 albedo_z | 5:8 diffuse_light_z |
      8:11 direct_light_z | 11:14 inner_light_z | 14 occ_z |
      15:18 reflective | 18 NoV | 19:23 human_z | 23 human hitsf
      (19:24 zero pad when human_light is off)
    Raw = pre-(sigmoid/exp/affine) head outputs; the final activations and
    the split-sum combine run outside in XLA (cheap [N,<=3] elementwise).
    """
    _, l_max, n_ml = _ide_consts_np(deg)
    p_met, p_rough, p_alb, p_outer, p_inner, p_occ = params[:6]

    pts = geo[:, 0:3]
    normals = _normalize(geo[:, 3:6])
    view = _normalize(geo[:, 6:9])
    NoV = jnp.sum(normals * view, axis=-1, keepdims=True)
    reflective = NoV * normals * 2.0 - view

    # materials (shared input). NOTE: a "split first layer" variant (feats
    # matmul + pts as three [BB,1]x[1,256] broadcast FMAs, no zero padding)
    # was measured and REJECTED: full step 126.6 -> 133.3 ms @2048 rays —
    # the narrow broadcasts and their vjp reductions lower worse than the
    # padded [BB,384] matmul.
    x_mat = _pad_cols(jnp.concatenate([feats, pts], axis=-1), 384)
    metallic_z = _head_fwd(p_met, x_mat)[:, 0:1]
    roughness_z = _head_fwd(p_rough, x_mat)[:, 0:1]
    albedo_z = _head_fwd(p_alb, x_mat)[:, 0:3]
    roughness = jax.nn.sigmoid(roughness_z)

    def sphere_enc(directions, rough):
        # offset_points_to_sphere + ray/unit-sphere hit (utils/sphere.py)
        norm = jnp.sqrt(jnp.sum(pts * pts, axis=-1, keepdims=True))
        scaled = pts / jnp.maximum(norm, 1e-12) * 0.999
        sp = jnp.where(norm > 0.999, scaled, pts)
        dtx = jnp.sum(sp * directions, axis=-1, keepdims=True)
        xtx = jnp.sum(sp * sp, axis=-1, keepdims=True)
        dist = -dtx + jnp.sqrt(jnp.maximum(dtx ** 2 - xtx + 1.0, 0.0) + 1e-6)
        hit = _normalize(sp + directions * dist)
        return _ide_block(const, hit, rough, l_max, n_ml)

    # diffuse light: IDE(normal, kappa_inv=1)
    ones = jnp.ones_like(pts[:, 0:1])
    ide_n = _ide_block(const, normals, ones, l_max, n_ml)
    if sphere_direction:
        ide_n = jnp.concatenate([ide_n, sphere_enc(normals, ones)], axis=-1)
    diffuse_z = _head_fwd(p_outer, _pad_cols(ide_n, p_outer[0].shape[0]))[:, 0:3]

    # specular lights: IDE(reflective, roughness)
    ide_r = _ide_block(const, reflective, roughness, l_max, n_ml)
    if sphere_direction:
        outer_in = jnp.concatenate(
            [ide_r, sphere_enc(reflective, roughness)], axis=-1)
    else:
        outer_in = ide_r
    direct_z = _head_fwd(p_outer, _pad_cols(outer_in, p_outer[0].shape[0]))[:, 0:3]

    pe_pts = _posenc_block(pts, pos_freq)
    inner_in = jnp.concatenate([pe_pts, ide_r], axis=-1)
    inner_z = _head_fwd(p_inner, _pad_cols(inner_in, p_inner[0].shape[0]))[:, 0:3]

    pe_ref = _posenc_block(reflective, 6)
    occ_in = jax.lax.stop_gradient(jnp.concatenate([pe_pts, pe_ref], axis=-1))
    occ_z = _head_fwd(p_occ, _pad_cols(occ_in, p_occ[0].shape[0]))[:, 0:1]

    if human:
        human_z, hitsf = _human_block(params[6], geo, pts, reflective,
                                      roughness)
        tail = jnp.concatenate([human_z, hitsf], axis=-1)
    else:
        tail = jnp.zeros((geo.shape[0], OUT - 19), geo.dtype)
    return jnp.concatenate(
        [metallic_z, roughness_z, albedo_z, diffuse_z, direct_z, inner_z,
         occ_z, reflective, NoV, tail], axis=-1)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(geo_ref, feats_ref, const_ref, *rest, deg, pos_freq,
                sphere_direction, human):
    param_refs, out_ref = rest[:-1], rest[-1]
    params = _unflatten_params([r[...] for r in param_refs])
    out_ref[...] = _shader_block(params, geo_ref[...], feats_ref[...],
                                 const_ref[...], deg=deg, pos_freq=pos_freq,
                                 sphere_direction=sphere_direction,
                                 human=human)


def _bwd_kernel(geo_ref, feats_ref, const_ref, *rest, deg, pos_freq,
                sphere_direction, human):
    n_p = 5 * len(_heads(human))
    param_refs = rest[:n_p]
    gout_ref = rest[n_p]
    dgeo_ref, dfeats_ref = rest[n_p + 1], rest[n_p + 2]
    dparam_refs = rest[n_p + 3:]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in dparam_refs:
            r[...] = jnp.zeros_like(r)

    const = const_ref[...]
    # f32 leaves so jax.vjp emits f32 parameter cotangents; _mm re-casts the
    # matmul operands to bf16, so the f32 copies are transient in VMEM
    flat = [r[...].astype(jnp.float32) for r in param_refs]

    def f(flat_vals, geo, feats):
        return _shader_block(_unflatten_params(flat_vals), geo, feats, const,
                             deg=deg, pos_freq=pos_freq,
                             sphere_direction=sphere_direction, human=human)

    _, vjp = jax.vjp(f, flat, geo_ref[...], feats_ref[...])
    dflat, dgeo, dfeats = vjp(gout_ref[...])
    dgeo_ref[...] = dgeo
    dfeats_ref[...] = dfeats
    for r, d in zip(dparam_refs, dflat):
        r[...] += d


def _unflatten_params(flat):
    return [tuple(flat[5 * i:5 * i + 5]) for i in range(len(flat) // 5)]


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------


def _head_dims(cfg):
    """d_in per head (unpadded), parity with fields/app_shading.py::init_app_shading."""
    sph = ide_dim(cfg.ide_deg)
    pos = positional_encode_dim(3, cfg.light_pos_freq)
    ref = positional_encode_dim(3, 6)
    outer = sph * (2 if cfg.sphere_direction else 1)
    f = cfg.feats_dim
    return {"metallic": (f + 3, 1), "roughness": (f + 3, 1),
            "albedo": (f + 3, 3), "outer_light": (outer, 3),
            "inner_light": (pos + sph, 3), "inner_weight": (pos + ref, 1),
            "human_light": (2 * 2 * 6, 4)}


def pack_shader_params(params, cfg):
    """Shader param dict -> flat kernel layout (differentiable jnp ops).

    Per head: w1 [DIpad,256] bf16, w2/w3 [256,256] bf16, w4 [256,128] bf16,
    bpack [8,256] f32 (rows 0-2 hidden biases, row 3 output bias). bf16
    weight storage halves kernel VMEM residency; matmuls consume bf16
    operands either way (production bf16_hidden semantics).
    """
    dims = _head_dims(cfg)
    flat = []
    for name in _heads(cfg.human_light):
        layers = resolve_weight_norm(params[name])
        d_in, d_out = dims[name]
        ws = [l["w"] for l in layers]
        bs = [l["b"] for l in layers]
        assert ws[0].shape == (d_in, HID), (name, ws[0].shape, d_in)
        DI = _pad_dim(d_in)
        w1 = jnp.pad(ws[0], ((0, DI - d_in), (0, 0)))
        w4 = jnp.pad(ws[3], ((0, 0), (0, 128 - d_out)))
        b = jnp.zeros((8, HID))
        for l in range(3):
            b = b.at[l].set(bs[l])
        b = b.at[3, :d_out].set(bs[3])
        flat += [_bf(w1), _bf(ws[1]), _bf(ws[2]), _bf(w4), b]
    return tuple(flat)


# ---------------------------------------------------------------------------
# pallas_call plumbing + custom VJP
# ---------------------------------------------------------------------------


def _vspec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _row_spec(width):
    return pl.BlockSpec((BB, width), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _flops_per_row(flat, deg, sphere_direction) -> int:
    """Matmul FLOPs per lattice row: the 24 head matmuls + the IDE
    z-Vandermonde matmuls. Baked into the kernel name so core/mfu.py can
    count Pallas FLOPs from compiled HLO (operand shapes alone are not
    reliably recoverable from the custom-call text)."""
    f = 0
    for i, w in enumerate(flat):
        if i % 5 < 4:                      # (w1,w2,w3,w4,b) x 6 heads
            f += 2 * w.shape[0] * w.shape[1]
    _, l_max, n_ml = _ide_consts_np(deg)
    n_ide = 4 if sphere_direction else 2
    f += n_ide * 2 * (l_max + 1) * n_ml
    return int(f)


@functools.partial(jax.jit, static_argnames=("deg", "pos_freq",
                                             "sphere_direction", "interpret"))
def _fwd_call(geo, feats, const, flat, deg, pos_freq, sphere_direction,
              interpret=False):
    n = geo.shape[0]
    gw = geo.shape[1]                      # GEO, or GEO_H with human poses
    kern = functools.partial(_fwd_kernel, deg=deg, pos_freq=pos_freq,
                             sphere_direction=sphere_direction,
                             human=gw > GEO)
    return pl.pallas_call(
        kern,
        name=f"nero_shader_fwd_f{_flops_per_row(flat, deg, sphere_direction)}",
        out_shape=jax.ShapeDtypeStruct((n, OUT), jnp.float32),
        grid=(n // BB,),
        in_specs=[_row_spec(gw), _row_spec(HID), _vspec()] + [_vspec()] * len(flat),
        out_specs=_row_spec(OUT),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(geo, feats, const, *flat)


@functools.partial(jax.jit, static_argnames=("deg", "pos_freq",
                                             "sphere_direction", "interpret"))
def _bwd_call(geo, feats, const, flat, gout, deg, pos_freq, sphere_direction,
              interpret=False):
    n = geo.shape[0]
    gw = geo.shape[1]                      # GEO, or GEO_H with human poses
    kern = functools.partial(_bwd_kernel, deg=deg, pos_freq=pos_freq,
                             sphere_direction=sphere_direction,
                             human=gw > GEO)
    acc_shapes = tuple(jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in flat)
    acc_specs = tuple(
        pl.BlockSpec(w.shape, lambda i, _s=w.shape: tuple([0] * len(_s)),
                     memory_space=pltpu.VMEM) for w in flat)
    # recompute + dx + dw per matmul = 3x the forward matmul work
    return pl.pallas_call(
        kern,
        name=f"nero_shader_bwd_f{3 * _flops_per_row(flat, deg, sphere_direction)}",
        out_shape=(jax.ShapeDtypeStruct((n, gw), jnp.float32),
                   jax.ShapeDtypeStruct((n, HID), jnp.float32)) + acc_shapes,
        grid=(n // BB,),
        in_specs=[_row_spec(gw), _row_spec(HID), _vspec()]
                 + [_vspec()] * len(flat) + [_row_spec(OUT)],
        out_specs=(_row_spec(gw), _row_spec(HID)) + acc_specs,
        # the vjp residuals of all six heads are live at once; v5e's
        # physical VMEM (128M) is far above Mosaic's default 16M scoped cap
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(geo, feats, const, *flat, gout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _shader_core(flat, geo, feats, deg, pos_freq, sphere_direction, interpret):
    const = jnp.asarray(_ide_consts_np(deg)[0])
    return _fwd_call(geo, feats, const, tuple(flat), deg, pos_freq,
                     sphere_direction, interpret)


def _shader_core_fwd(flat, geo, feats, deg, pos_freq, sphere_direction, interpret):
    out = _shader_core(flat, geo, feats, deg, pos_freq, sphere_direction, interpret)
    return out, (tuple(flat), geo, feats)


def _shader_core_bwd(deg, pos_freq, sphere_direction, interpret, res, gout):
    flat, geo, feats = res
    const = jnp.asarray(_ide_consts_np(deg)[0])
    outs = _bwd_call(geo, feats, const, flat, gout, deg, pos_freq,
                     sphere_direction, interpret)
    dgeo, dfeats = outs[0], outs[1]
    dflat = tuple(
        d.astype(w.dtype) for d, w in zip(outs[2:], flat))
    return dflat, dgeo, dfeats


_shader_core.defvjp(_shader_core_fwd, _shader_core_bwd)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

# forward-padded rows must stay NaN-free through the in-kernel normalize /
# rsqrt (their cotangent is zero, but NaN * 0 = NaN would poison the weight
# accumulators): pad with a point inside the sphere and unit axes
_SAFE_GEO_ROW = np.array([0.0, 0.0, 0.5, 0.0, 0.0, 1.0, 0.0, 0.0, 1.0]
                         + [0.0] * (GEO - 9), np.float32)
# human layout: + identity R, t=0 (plane dist < 0 -> hitsf 0, all finite)
_SAFE_GEO_ROW_H = np.array(
    list(_SAFE_GEO_ROW[:9]) + [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
    + [0.0] * (GEO_H - 18), np.float32)


def shader_fused_raw(params, cfg, points, normals, view_dirs, feats,
                     human_poses=None, interpret: bool = False):
    """Fused shader raw outputs as a dict of [..., c] arrays.

    Gradients flow to `params` (all heads), points, normals, view_dirs,
    feats (and human_poses when cfg.human_light). The caller applies final
    activations + split-sum combine (fields/app_shading.py::
    _app_shading_apply_fused) for exact XLA-path parity.
    """
    shape = points.shape[:-1]
    n = int(np.prod(shape))
    flat = pack_shader_params(params, cfg)
    from nero_tpu.ops.pallas.interp import resolve
    interpret = resolve(interpret)

    human = bool(cfg.human_light)
    cols = [points.reshape(n, 3), normals.reshape(n, 3),
            view_dirs.reshape(n, 3)]
    if human:
        poses = jnp.broadcast_to(human_poses,
                                 shape + (3, 4)).reshape(n, 3, 4)
        # pose channels: R row-major 9:18, t 18:21 (see _human_block)
        cols += [poses[:, :, :3].reshape(n, 9), poses[:, :, 3]]
    gw = GEO_H if human else GEO
    used = 21 if human else 9
    cols.append(jnp.zeros((n, gw - used), points.dtype))
    geo = jnp.concatenate(cols, axis=-1).astype(jnp.float32)
    n_pad = (-n) % BB
    if n_pad:
        safe = _SAFE_GEO_ROW_H if human else _SAFE_GEO_ROW
        geo = jnp.concatenate(
            [geo, jnp.broadcast_to(jnp.asarray(safe), (n_pad, gw))])
    f = feats.reshape(n, -1).astype(jnp.float32)
    assert f.shape[1] == HID, f.shape
    if n_pad:
        f = jnp.concatenate([f, jnp.zeros((n_pad, HID), jnp.float32)])

    out = _shader_core(flat, geo, f, cfg.ide_deg, cfg.light_pos_freq,
                       bool(cfg.sphere_direction), interpret)[:n]
    rs = lambda a: a.reshape(*shape, a.shape[-1])
    raw = {
        "metallic_z": rs(out[:, 0:1]), "roughness_z": rs(out[:, 1:2]),
        "albedo_z": rs(out[:, 2:5]), "diffuse_light_z": rs(out[:, 5:8]),
        "direct_light_z": rs(out[:, 8:11]), "inner_light_z": rs(out[:, 11:14]),
        "occ_z": rs(out[:, 14:15]), "reflective": rs(out[:, 15:18]),
        "NoV": rs(out[:, 18:19]),
    }
    if human:
        raw["human_z"] = rs(out[:, 19:23])
        raw["human_hits"] = rs(jax.lax.stop_gradient(out[:, 23:24]))
    return raw


# ---------------------------------------------------------------------------
# MFU accounting (core/mfu.py)
# ---------------------------------------------------------------------------


import re as _re

_NAME_RE = _re.compile(r"nero_shader_(?:fwd|bwd)_f(\d+)")


def hlo_flops(name: str, out_shapes, in_shapes):
    """Matmul FLOPs of one shader-kernel invocation (core/mfu.py). The
    per-row FLOP count is baked into the kernel name by `_flops_per_row`;
    the row count comes from the first result shape ([n, GEO] for bwd,
    [n, OUT] for fwd)."""
    m = _NAME_RE.fullmatch(name)
    if m is None:
        return None
    n = out_shapes[0][0] if out_shapes and out_shapes[0] else 0
    return float(n) * float(m.group(1))
