"""Fused Stage-II light kernel: inner + outer light MLPs, fwd AND bwd in VMEM.

Parity target: reference network/field.py:812-854 (`MCShadingNetwork`'s
`predict_outer_lights` / `get_inner_lights`) — the two light predictors
evaluated on every (surface point x sample direction) row of the material
step's lattice, plus the IDE / positional encodings feeding them. The final
exp activations, hit selection, and human-light mixing stay OUTSIDE (they
touch only [N,3] tensors and the human path keeps per-row [3,4] poses).

Why: the round-4 Stage-II ceiling analysis (IMPLEMENTATION_NOTES, data/
r4_tpu/ceiling2_*.log) puts lights+BRDF at ~43% of the step, HBM-bound AT
THE ROOF (hbm_frac 0.78-1.10) — the traffic is the encodings (IDE 72ch x
1-2 + PE 51ch over 512x768 = 393k rows), the two head inputs, and their
saved activations + cotangents, ~1.6 GB per pass. This kernel's HBM
traffic is a 16-channel geometry tensor in, an 8-channel raw-output tensor
out, and the parameters — the same bytes-cut the whole-shader kernel
applied to Stage I (ops/pallas/shader_kernel.py, whose _ide_block /
_posenc_block / _head_fwd / vjp-in-kernel machinery this reuses).

Engagement: only when outer compaction is OFF. With inner compaction ON
(convex scenes: hit rate ~1%, the gather saves ~16x inner-MLP work) the
kernel runs in mode='outer' (outer head only) and the compacted inner path
stays in XLA; with both compactions off (the concave regime — bowl — where
the step is slowest) mode='both' fuses both heads. Resolution mirrors
fields/app_shading.py::_fused_shader_active (TPU v4+ / force_interpret).

Backward: jax.vjp INSIDE the kernel body (recompute-and-grad, linearized
at kernel-trace time); parameter cotangents accumulate across the
sequential row-block grid in f32 VMEM accumulators. Gradients flow to the
head parameters and to the geometry rows (specular sample directions carry
roughness gradients through the sampler; points feed sphere_direction).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nero_tpu.ops.mlp import resolve_weight_norm
from nero_tpu.ops.pallas.shader_kernel import (_bf, _head_fwd, _ide_block,
                                               _ide_consts_np, _normalize,
                                               _pad_cols, _pad_dim,
                                               _posenc_block, _row_spec,
                                               _vspec)
from nero_tpu.utils.encodings import ide_dim, positional_encode_dim

BB = 512          # rows per program
GEO = 16          # points 0:3 | dirs 3:6 | inters 6:9 | hit-normals 9:12
OUT = 8           # inner_z 0:3 | outer_z 3:6 | zero pad

HEAD_ORDER = ("inner_light", "outer_light")

# padded rows must stay NaN-free through normalize/rsqrt under vjp: point
# inside the sphere, unit direction/normal
_SAFE_GEO_ROW = np.array([0.0, 0.0, 0.5, 0.0, 0.0, 1.0, 0.0, 0.0, 0.5,
                          0.0, 0.0, 1.0] + [0.0] * (GEO - 12), np.float32)


# ---------------------------------------------------------------------------
# block forward (pure function of VMEM values)
# ---------------------------------------------------------------------------


def _lights_block(params, geo, const, *, deg: int, inner_pos_freq: int,
                  sphere_direction: bool, mode: str):
    """params: list of head tuples per HEAD_ORDER (inner first; absent in
    mode='outer'). geo [BB,GEO]. Returns [BB,OUT] raw (pre-exp) outputs."""
    _, l_max, n_ml = _ide_consts_np(deg)

    pts = geo[:, 0:3]
    # RAW directions for the outer path: predict_outer_lights consumes the
    # sample directions unnormalized (they are unit by construction), so
    # normalizing here would project the radial component out of d-dirs
    # and diverge from the XLA gradients
    dirs = geo[:, 3:6]
    zeros = jnp.zeros_like(pts[:, 0:1])

    # outer light: IDE(direction, kappa_inv=0) (+ IDE(sphere hit) for the
    # sphere_direction real-scene variant — utils/sphere.py geometry)
    ide_d = _ide_block(const, dirs, zeros, l_max, n_ml)
    if sphere_direction:
        norm = jnp.sqrt(jnp.sum(pts * pts, axis=-1, keepdims=True))
        scaled = pts / jnp.maximum(norm, 1e-12) * 0.999
        sp = jnp.where(norm > 0.999, scaled, pts)
        dtx = jnp.sum(sp * dirs, axis=-1, keepdims=True)
        xtx = jnp.sum(sp * sp, axis=-1, keepdims=True)
        dist = -dtx + jnp.sqrt(jnp.maximum(dtx ** 2 - xtx + 1.0, 0.0) + 1e-6)
        hit_pt = _normalize(sp + dirs * dist)
        ide_d = jnp.concatenate(
            [ide_d, _ide_block(const, hit_pt, zeros, l_max, n_ml)], axis=-1)
    if mode == "outer":
        p_outer, = params
    else:
        p_inner, p_outer = params
    outer_z = _head_fwd(p_outer, _pad_cols(ide_d, p_outer[0].shape[0]))[:, 0:3]

    if mode == "outer":
        inner_z = jnp.zeros_like(outer_z)
    else:
        # inner light: PE(hit point, 8) + IDE(reflection of -dir about the
        # hit normal, kappa_inv=0) — fields/mc_shading.py::get_inner_lights
        inters = geo[:, 6:9]
        normals = _normalize(geo[:, 9:12])
        view = _normalize(-dirs)  # get_inner_lights normalizes view_dirs
        refl = jnp.sum(view * normals, axis=-1, keepdims=True) * normals * 2.0 - view
        pe_pts = _posenc_block(inters, inner_pos_freq)
        ide_r = _ide_block(const, refl, zeros, l_max, n_ml)
        inner_in = jnp.concatenate([pe_pts, ide_r], axis=-1)
        inner_z = _head_fwd(p_inner, _pad_cols(inner_in, p_inner[0].shape[0]))[:, 0:3]

    return jnp.concatenate(
        [inner_z, outer_z, jnp.zeros_like(geo[:, :OUT - 6])], axis=-1)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(geo_ref, const_ref, *rest, deg, inner_pos_freq,
                sphere_direction, mode):
    param_refs, out_ref = rest[:-1], rest[-1]
    params = _unflatten_params([r[...] for r in param_refs])
    out_ref[...] = _lights_block(params, geo_ref[...], const_ref[...],
                                 deg=deg, inner_pos_freq=inner_pos_freq,
                                 sphere_direction=sphere_direction, mode=mode)


def _bwd_kernel(geo_ref, const_ref, *rest, deg, inner_pos_freq,
                sphere_direction, mode, n_params):
    param_refs = rest[:n_params]
    gout_ref = rest[n_params]
    dgeo_ref = rest[n_params + 1]
    dparam_refs = rest[n_params + 2:]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in dparam_refs:
            r[...] = jnp.zeros_like(r)

    const = const_ref[...]
    flat = [r[...].astype(jnp.float32) for r in param_refs]

    def f(flat_vals, geo):
        return _lights_block(_unflatten_params(flat_vals), geo, const,
                             deg=deg, inner_pos_freq=inner_pos_freq,
                             sphere_direction=sphere_direction, mode=mode)

    _, vjp = jax.vjp(f, flat, geo_ref[...])
    dflat, dgeo = vjp(gout_ref[...])
    dgeo_ref[...] = dgeo
    for r, d in zip(dparam_refs, dflat):
        r[...] += d


def _unflatten_params(flat):
    return [tuple(flat[5 * i:5 * i + 5]) for i in range(len(flat) // 5)]


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------


def _head_dims(cfg, mode: str):
    sph = ide_dim(cfg.ide_deg)
    pos = positional_encode_dim(3, 8)
    outer = sph * (2 if cfg.outer_light_version == "sphere_direction" else 1)
    dims = {"outer_light": (outer, 3)}
    if mode == "both":
        dims["inner_light"] = (pos + sph, 3)
    return dims


def pack_light_params(params, cfg, mode: str = "both"):
    """Light head dicts -> flat kernel layout (differentiable jnp ops).
    Same per-head layout as shader_kernel.pack_shader_params: w1 [DIpad,256]
    bf16, w2/w3 [256,256] bf16, w4 [256,128] bf16, bpack [8,256] f32."""
    dims = _head_dims(cfg, mode)
    flat = []
    for name in HEAD_ORDER:
        if name not in dims:
            continue
        layers = resolve_weight_norm(params[name])
        d_in, d_out = dims[name]
        ws = [l["w"] for l in layers]
        bs = [l["b"] for l in layers]
        assert ws[0].shape == (d_in, 256), (name, ws[0].shape, d_in)
        DI = _pad_dim(d_in)
        w1 = jnp.pad(ws[0], ((0, DI - d_in), (0, 0)))
        w4 = jnp.pad(ws[3], ((0, 0), (0, 128 - d_out)))
        b = jnp.zeros((8, 256))
        for l in range(3):
            b = b.at[l].set(bs[l])
        b = b.at[3, :d_out].set(bs[3])
        flat += [_bf(w1), _bf(ws[1]), _bf(ws[2]), _bf(w4), b]
    return tuple(flat)


def _flops_per_row(flat, deg, sphere_direction) -> int:
    f = 0
    for i, w in enumerate(flat):
        if i % 5 < 4:
            f += 2 * w.shape[0] * w.shape[1]
    _, l_max, n_ml = _ide_consts_np(deg)
    n_ide = (3 if sphere_direction else 2) if len(flat) == 10 else \
        (2 if sphere_direction else 1)
    f += n_ide * 2 * (l_max + 1) * n_ml
    return int(f)


# ---------------------------------------------------------------------------
# pallas_call plumbing + custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("deg", "inner_pos_freq",
                                             "sphere_direction", "mode",
                                             "interpret"))
def _fwd_call(geo, const, flat, deg, inner_pos_freq, sphere_direction, mode,
              interpret=False):
    n = geo.shape[0]
    kern = functools.partial(_fwd_kernel, deg=deg,
                             inner_pos_freq=inner_pos_freq,
                             sphere_direction=sphere_direction, mode=mode)
    return pl.pallas_call(
        kern,
        name=f"nero_lights_fwd_f{_flops_per_row(flat, deg, sphere_direction)}",
        out_shape=jax.ShapeDtypeStruct((n, OUT), jnp.float32),
        grid=(n // BB,),
        in_specs=[_row_spec(GEO), _vspec()] + [_vspec()] * len(flat),
        out_specs=_row_spec(OUT),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(geo, const, *flat)


@functools.partial(jax.jit, static_argnames=("deg", "inner_pos_freq",
                                             "sphere_direction", "mode",
                                             "interpret"))
def _bwd_call(geo, const, flat, gout, deg, inner_pos_freq, sphere_direction,
              mode, interpret=False):
    n = geo.shape[0]
    kern = functools.partial(_bwd_kernel, deg=deg,
                             inner_pos_freq=inner_pos_freq,
                             sphere_direction=sphere_direction, mode=mode,
                             n_params=len(flat))
    acc_shapes = tuple(jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in flat)
    acc_specs = tuple(
        pl.BlockSpec(w.shape, lambda i, _s=w.shape: tuple([0] * len(_s)),
                     memory_space=pltpu.VMEM) for w in flat)
    # recompute + dx + dw per matmul = 3x the forward matmul work
    return pl.pallas_call(
        kern,
        name=f"nero_lights_bwd_f{3 * _flops_per_row(flat, deg, sphere_direction)}",
        out_shape=(jax.ShapeDtypeStruct((n, GEO), jnp.float32),) + acc_shapes,
        grid=(n // BB,),
        in_specs=[_row_spec(GEO), _vspec()] + [_vspec()] * len(flat)
                 + [_row_spec(OUT)],
        out_specs=(_row_spec(GEO),) + acc_specs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(geo, const, *flat, gout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _lights_core(flat, geo, deg, inner_pos_freq, sphere_direction, mode,
                 interpret):
    const = jnp.asarray(_ide_consts_np(deg)[0])
    return _fwd_call(geo, const, tuple(flat), deg, inner_pos_freq,
                     sphere_direction, mode, interpret)


def _lights_core_fwd(flat, geo, deg, inner_pos_freq, sphere_direction, mode,
                     interpret):
    out = _lights_core(flat, geo, deg, inner_pos_freq, sphere_direction,
                       mode, interpret)
    return out, (tuple(flat), geo)


def _lights_core_bwd(deg, inner_pos_freq, sphere_direction, mode, interpret,
                     res, gout):
    flat, geo = res
    const = jnp.asarray(_ide_consts_np(deg)[0])
    outs = _bwd_call(geo, const, flat, gout, deg, inner_pos_freq,
                     sphere_direction, mode, interpret)
    dgeo = outs[0]
    dflat = tuple(d.astype(w.dtype) for d, w in zip(outs[1:], flat))
    return dflat, dgeo


_lights_core.defvjp(_lights_core_fwd, _lights_core_bwd)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


def lights_fused_raw(params, cfg, points, directions, inters, normals,
                     mode: str = "both", interpret: bool = False):
    """Raw (pre-exp) light head outputs: (inner_z, outer_z), each [..., 3].

    Gradients flow to the head params and to points/directions (specular
    directions carry roughness gradients); inters/normals arrive behind the
    tracer's stop_gradient. mode='outer' skips the inner head (its rows in
    inner_z are zeros) for the inner-compacted regime.
    """
    from nero_tpu.ops.pallas.interp import resolve
    interpret = resolve(interpret)

    shape = points.shape[:-1]
    n = int(np.prod(shape))
    flat = pack_light_params(params, cfg, mode)

    zeros3 = jnp.zeros((n, 3), jnp.float32)
    geo = jnp.concatenate([
        points.reshape(n, 3), directions.reshape(n, 3),
        (zeros3 if mode == "outer" else inters.reshape(n, 3)),
        (zeros3 if mode == "outer" else normals.reshape(n, 3)),
        jnp.zeros((n, GEO - 12), jnp.float32)], axis=-1).astype(jnp.float32)
    n_pad = (-n) % BB
    if n_pad:
        geo = jnp.concatenate(
            [geo, jnp.broadcast_to(jnp.asarray(_SAFE_GEO_ROW), (n_pad, GEO))])

    out = _lights_core(flat, geo, cfg.ide_deg, 8,
                       cfg.outer_light_version == "sphere_direction", mode,
                       interpret)[:n]
    rs = lambda a: a.reshape(*shape, 3)
    return rs(out[:, 0:3]), rs(out[:, 3:6])


# ---------------------------------------------------------------------------
# MFU accounting (core/mfu.py)
# ---------------------------------------------------------------------------


import re as _re

_NAME_RE = _re.compile(r"nero_lights_(?:fwd|bwd)_f(\d+)")


def hlo_flops(name: str, out_shapes, in_shapes):
    """Matmul FLOPs of one light-kernel invocation: per-row count baked in
    the name x row count from the first result shape ([n,GEO] bwd /
    [n,OUT] fwd)."""
    m = _NAME_RE.fullmatch(name)
    if m is None:
        return None
    n = out_shapes[0][0] if out_shapes and out_shapes[0] else 0
    return float(n) * float(m.group(1))
