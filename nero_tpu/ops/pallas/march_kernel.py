"""Fully-fused ray-march kernel: the neural tracer's ENTIRE march — coarse
sign-change scan + bisection refinement — in ONE pallas_call.

Replaces (geometry/neural_tracer.py): one big coarse field eval, an XLA
argmax/take_along_axis scan, and 8 separate bisection field evals — ~10
kernel launches and an [R, n_coarse] HBM round trip per Stage-II step —
with a single VMEM-resident kernel. Per block of rays, the weights load
once, every sample point is generated in-register, and only (t_hit, found)
leave the chip's VMEM. HBM traffic: 8 floats per ray in, 8 out.

Two kernel-level wins over the round-1 field kernel (measured on v5e):
  * positional encoding via the sin/cos double-angle recurrence — 2
    transcendentals per coordinate instead of 2*pe; the VPU sin/cos was
    the actual bottleneck (28.9 -> 48.3 TF/s on the same MLP).
  * the march state (t_lo/t_hi/found) lives in registers across the
    fori_loop, so bisection costs exactly n_refine extra MLP evals.

Reference counterpart: the CUDA BVH trace consumed by
/root/reference/network/field.py:856-880 via raytracer.py:21-49. The
TPU-native answer is matmul marching (see geometry/neural_tracer.py
module docstring for the design rationale).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Rays per program instance. A pure partitioning knob — per-ray numerics are
# identical under any block size — picked by dependent-step train A/B on v5e
# (tools/ceiling_stage2.py march_block, data/r5_tpu/ceiling2_march_block.log):
# 2048 -> 42.49 ms, 4096 -> 41.52, 8192 -> 40.83 (+1.7%); 16384 exceeds the
# 16M scoped-VMEM stack at compile (two [128,16384] f32 intermediates).
# Standalone kernel timing can NOT pick this knob through the axon tunnel —
# see tools/tunnel_timing_control.py.
BLOCK_R = 8192
FEAT_PAD = 48   # 3 + 6*pe rows padded to a sublane multiple (pe=6 -> 39 -> 48)


def _pe_rows(xyz, pe: int):
    """[3,N] -> [3+6*pe, N] positional encoding, transposed layout.

    Octave i is derived from octave i-1 by the exact double-angle
    identities (sin 2a = 2 sin a cos a; cos 2a = 1 - 2 sin^2 a), so only
    the base octave pays the transcendental. f32 drift at pe=6 is <1e-5.
    Row order matches utils/encodings.py::positional_encode.
    """
    s = jnp.sin(xyz)
    c = jnp.cos(xyz)
    rows = [xyz]
    for i in range(pe):
        rows.append(s)
        rows.append(c)
        if i + 1 < pe:
            s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
    return jnp.concatenate(rows, axis=0)


def _field_eval_t(pts_t, w0, b0, w1, b1, w2, b2, w3t, b3, pe: int):
    """Distilled-SDF MLP on transposed points [3,N] -> values [1,N].

    First matmul contracts the sublane (feature) axis; the last is computed
    output-transposed (w3t^T @ h^T) so no lane transposes appear anywhere.
    """
    feats = _pe_rows(pts_t, pe)
    feats = jnp.concatenate(
        [feats, jnp.zeros((FEAT_PAD - feats.shape[0], feats.shape[1]),
                          feats.dtype)], axis=0)
    cast = lambda a: a.astype(jnp.bfloat16)
    h = jax.lax.dot_general(cast(feats), cast(w0),
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = jax.nn.relu(h + b0)
    h = jax.nn.relu(jnp.dot(cast(h), cast(w1),
                            preferred_element_type=jnp.float32) + b1)
    h = jax.nn.relu(jnp.dot(cast(h), cast(w2),
                            preferred_element_type=jnp.float32) + b2)
    out = jax.lax.dot_general(cast(w3t), cast(h),
                              dimension_numbers=(((0,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return out[0:1] + b3[0, 0]


def _pe_rows_wide(xyz):
    """[3,N] -> [WIDE_DIM,N] dual-chain PE (bases 1 and sqrt2, 10 octaves
    each via the double-angle recurrence — 4 transcendentals per coord
    total). Row order matches neural_tracer.wide_encode."""
    from nero_tpu.geometry.neural_tracer import WIDE_CHAINS

    rows = [xyz]
    for base, n_oct in WIDE_CHAINS:
        s = jnp.sin(xyz * base)
        c = jnp.cos(xyz * base)
        for i in range(n_oct):
            rows.append(s)
            rows.append(c)
            if i + 1 < n_oct:
                s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
    return jnp.concatenate(rows, axis=0)


def _field_eval_t_wide(pts_t, w0, b0, w1, b1, w2t, b2):
    """Wide-topology eval: [3,N] -> [1,N] in THREE full-K matmuls
    ([128pad,128] @ K=123, [128,128], output-transposed [128,8])."""
    feats = _pe_rows_wide(pts_t)
    feats = jnp.concatenate(
        [feats, jnp.zeros((128 - feats.shape[0], feats.shape[1]),
                          feats.dtype)], axis=0)
    cast = lambda a: a.astype(jnp.bfloat16)
    h = jax.lax.dot_general(cast(feats), cast(w0),
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = jax.nn.relu(h + b0)
    h = jax.nn.relu(jnp.dot(cast(h), cast(w1),
                            preferred_element_type=jnp.float32) + b1)
    out = jax.lax.dot_general(cast(w2t), cast(h),
                              dimension_numbers=(((0,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return out[0:1] + b2[0, 0]


def _weight_names(topology: str):
    return (["w0", "b0", "w1", "b1", "w2t", "b2"] if topology == "wide"
            else ["w0", "b0", "w1", "b1", "w2", "b2", "w3t", "b3"])


def _make_field(ws, pe: int, topology: str):
    """field(pts_t [3,N]) -> [1,N] closure over loaded weight refs."""
    if topology == "wide":
        return lambda p: _field_eval_t_wide(p, *ws)
    return lambda p: _field_eval_t(p, *ws, pe)


def _march_kernel(rays_ref, *refs, pe, n_coarse, n_refine, t0, topology):
    out_ref = refs[-1]
    ws = [w[...] for w in refs[:-1]]
    r = rays_ref[...]          # [8, BR]: rows 0-2 origin, 3-5 dir, 6/7 t range
    o = r[0:3]
    d = r[3:6]
    t_enter = r[6:7]
    t_exit = r[7:8]
    dt = (t_exit - t_enter) / (n_coarse - 1)
    fld = _make_field(ws, pe, topology)

    def field(t):              # t [1, BR] -> sdf values [1, BR]
        return fld(o + d * t)

    v0 = field(t_enter)
    # `found` rides the loop as f32 0/1 — Mosaic can't legalize i1 vector
    # carries through scf.for
    start_inside = ((v0 <= 0.0) & (t_enter <= t0 + 1e-6)).astype(jnp.float32)

    def coarse_body(i, carry):
        t_lo, t_hi, found, prev_v = carry
        t_i = t_enter + dt * i.astype(jnp.float32)
        v = field(t_i)
        change = (prev_v > 0.0) & (v <= 0.0) & (found < 0.5)
        t_lo = jnp.where(change, t_i - dt, t_lo)
        t_hi = jnp.where(change, t_i, t_hi)
        found = jnp.maximum(found, change.astype(jnp.float32))
        return t_lo, t_hi, found, v

    t_lo, t_hi, found, _ = jax.lax.fori_loop(
        1, n_coarse, coarse_body, (t_enter, t_enter, start_inside, v0))

    def bisect_body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        v = field(mid)
        return jnp.where(v > 0.0, mid, lo), jnp.where(v > 0.0, hi, mid)

    t_lo, t_hi = jax.lax.fori_loop(0, n_refine, bisect_body, (t_lo, t_hi))

    zero = jnp.zeros((6, r.shape[1]), jnp.float32)
    out_ref[...] = jnp.concatenate([0.5 * (t_lo + t_hi), found, zero], axis=0)


@functools.partial(jax.jit,
                   static_argnames=("pe", "n_coarse", "n_refine", "t0",
                                    "interpret", "topology"))
def _march_t(rays_t, packed, pe: int, n_coarse: int, n_refine: int,
             t0: float, interpret: bool = False, topology: str = "std"):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = rays_t.shape[1]
    names = _weight_names(topology)
    suffix = "_w" if topology == "wide" else ""
    return pl.pallas_call(
        functools.partial(_march_kernel, pe=pe, n_coarse=n_coarse,
                          n_refine=n_refine, t0=t0, topology=topology),
        # field evals/ray = n_coarse + n_refine, encoded in the name so
        # core/mfu.py can recover the trip counts from the compiled HLO
        # (the _w suffix selects the wide per-eval FLOP count)
        name=f"nero_march_c{n_coarse}_r{n_refine}{suffix}",
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        grid=(n // BLOCK_R,),
        in_specs=[pl.BlockSpec((8, BLOCK_R), lambda i: (0, i),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in names],
        out_specs=pl.BlockSpec((8, BLOCK_R), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rays_t, *[packed[k] for k in names])


def _illinois_refine(field, t_lo, t_hi, f_lo, f_hi, n_refine):
    """Bracketed regula-falsi (Illinois variant) root refinement.

    The bracket's accuracy floor is the distilled field's error (~2x its
    near-band RMS), NOT bracket resolution — so the job of refinement is
    to reach that floor in as few field evals as possible. On the smooth
    128x4 MLP field the secant point converges superlinearly where
    bisection halves: 2-3 Illinois evals land where 8 bisections do
    (measured: tools/ab_sphere_march.py refine). The Illinois rule (halve
    the retained endpoint's f whenever the other endpoint moves) prevents
    the one-sided stagnation of naive false position; clamping the secant
    point into the bracket keeps it correct for non-found rays whose
    degenerate bracket is [t_enter, t_enter]."""
    def body(_, carry):
        lo, hi, flo, fhi = carry
        denom = flo - fhi
        mid = jnp.where(jnp.abs(denom) > 1e-12,
                        (flo * hi - fhi * lo) / jnp.where(denom == 0.0, 1.0,
                                                          denom),
                        0.5 * (lo + hi))
        mid = jnp.clip(mid, lo, hi)
        v = field(mid)
        pos = v > 0.0
        return (jnp.where(pos, mid, lo), jnp.where(pos, hi, mid),
                jnp.where(pos, v, 0.5 * flo), jnp.where(pos, 0.5 * fhi, v))

    t_lo, t_hi, f_lo, f_hi = jax.lax.fori_loop(
        0, n_refine, body, (t_lo, t_hi, f_lo, f_hi))
    # weight the endpoint estimate by the endpoint f's (one last free
    # secant step — no extra field eval)
    denom = f_lo - f_hi
    t = jnp.where(jnp.abs(denom) > 1e-12,
                  (f_lo * t_hi - f_hi * t_lo) / jnp.where(denom == 0.0, 1.0,
                                                          denom),
                  0.5 * (t_lo + t_hi))
    t = jnp.clip(t, t_lo, t_hi)
    return t


def _sphere_march_kernel(rays_ref, *refs, pe, n_sphere, n_refine, t0,
                         margin, lip, dt_frac, cap_frac, topology, refine):
    """Fixed-iteration sphere trace of the distilled SDF + bracketed refine.

    The uniform coarse march (_march_kernel) pays n_coarse field evals per
    ray regardless of where the surface is. The distilled field IS an
    approximate SDF, so step lengths can scale with |f| (classic sphere
    tracing): big leaps through empty space, automatic refinement near the
    surface — the same first-crossing bracket in ~half the evals. Floors and
    caps keep it honest against field error:
      step = clip(lip*f - margin, dt_min, cap)     per iteration
    dt_min = dt_frac * chord reproduces the uniform march's thin-feature
    floor near surfaces (where f is small, steps never exceed what the
    uniform march would take anyway); margin (~3x distill RMS) guards
    against the field underestimating proximity; cap bounds the damage of a
    mid-range overestimate. Rays that neither cross nor escape within
    n_sphere iterations report miss — the near-band agreement gate
    (tests/test_neural_tracer.py, >=0.98 vs the exact BVH) is the arbiter,
    as for every other tracer approximation.
    """
    out_ref = refs[-1]
    ws = [w[...] for w in refs[:-1]]
    r = rays_ref[...]          # [8, BR]
    o = r[0:3]
    d = r[3:6]
    t_enter = r[6:7]
    t_exit = r[7:8]
    chord = t_exit - t_enter
    dt_min = chord * dt_frac
    cap = chord * cap_frac
    fld = _make_field(ws, pe, topology)

    def field(t):
        return fld(o + d * t)

    def step_of(v):
        return jnp.clip(lip * v - margin, dt_min, cap)

    v0 = field(t_enter)
    start_inside = ((v0 <= 0.0) & (t_enter <= t0 + 1e-6)).astype(jnp.float32)
    t = jnp.minimum(t_enter + step_of(v0), t_exit)

    def body(i, carry):
        t_prev, v_prev, t, found, t_lo, t_hi, f_lo, f_hi = carry
        v = field(t)
        cross = (v <= 0.0) & (found < 0.5)
        t_lo = jnp.where(cross, t_prev, t_lo)
        t_hi = jnp.where(cross, t, t_hi)
        f_lo = jnp.where(cross, v_prev, f_lo)
        f_hi = jnp.where(cross, v, f_hi)
        found = jnp.maximum(found, cross.astype(jnp.float32))
        t_next = jnp.minimum(t + step_of(v), t_exit)
        frozen = found > 0.5
        return (jnp.where(frozen, t_prev, t), jnp.where(frozen, v_prev, v),
                jnp.where(frozen, t, t_next), found, t_lo, t_hi, f_lo, f_hi)

    _, _, _, found, t_lo, t_hi, f_lo, f_hi = jax.lax.fori_loop(
        1, n_sphere, body,
        (t_enter, v0, t, start_inside, t_enter, t_enter, v0, v0))

    if refine == "illinois":
        t_mid = _illinois_refine(field, t_lo, t_hi, f_lo, f_hi, n_refine)
    else:
        def bisect_body(_, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            v = field(mid)
            return jnp.where(v > 0.0, mid, lo), jnp.where(v > 0.0, hi, mid)

        t_lo, t_hi = jax.lax.fori_loop(0, n_refine, bisect_body,
                                       (t_lo, t_hi))
        t_mid = 0.5 * (t_lo + t_hi)

    zero = jnp.zeros((6, r.shape[1]), jnp.float32)
    out_ref[...] = jnp.concatenate([t_mid, found, zero], axis=0)


@functools.partial(jax.jit,
                   static_argnames=("pe", "n_sphere", "n_refine", "t0",
                                    "margin", "lip", "dt_frac", "cap_frac",
                                    "interpret", "topology", "refine"))
def _sphere_march_t(rays_t, packed, pe, n_sphere, n_refine, t0, margin, lip,
                    dt_frac, cap_frac, interpret=False, topology="std",
                    refine="bisect"):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = rays_t.shape[1]
    names = _weight_names(topology)
    suffix = "_w" if topology == "wide" else ""
    rtag = "i" if refine == "illinois" else ""
    return pl.pallas_call(
        functools.partial(_sphere_march_kernel, pe=pe, n_sphere=n_sphere,
                          n_refine=n_refine, t0=t0, margin=margin, lip=lip,
                          dt_frac=dt_frac, cap_frac=cap_frac,
                          topology=topology, refine=refine),
        # evals/ray = n_sphere + n_refine, encoded for core/mfu.py
        # (an `i` tag marks Illinois refinement — same 1 eval/iteration —
        # and the _w suffix selects the wide per-eval FLOP count)
        name=f"nero_smarch_s{n_sphere}_r{n_refine}{rtag}{suffix}",
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        grid=(n // BLOCK_R,),
        in_specs=[pl.BlockSpec((8, BLOCK_R), lambda i: (0, i),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in names],
        out_specs=pl.BlockSpec((8, BLOCK_R), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rays_t, *[packed[k] for k in names])


def sphere_march_fused(packed, rays_o, rays_d, t_enter, t_exit, *,
                       pe: int = 6, n_sphere: int = 16, n_refine: int = 8,
                       t0: float = 0.012, margin: float = 0.003,
                       lip: float = 0.9, dt_frac: float = 1.0 / 31.0,
                       cap_frac: float = 0.25, interpret: bool = False,
                       topology: str = "std", refine: str = "bisect"):
    """Sphere-traced march of [R] rays. Returns (t_hit [R], found [R] bool).

    Same contract as march_fused; ~ (n_sphere+n_refine)/(n_coarse+n_refine)
    of its FLOPs. dt_frac defaults to the uniform-32 march's step so the
    thin-feature floor is unchanged. refine='illinois' replaces bisection
    with bracketed regula falsi (see _illinois_refine) — the production
    default runs it at n_refine=3 for 5 fewer field evals per ray at the
    same depth-error floor."""
    from nero_tpu.ops.pallas.interp import resolve
    interpret = resolve(interpret)
    packed = jax.tree_util.tree_map(jax.lax.stop_gradient, packed)
    stack = jnp.concatenate([
        jax.lax.stop_gradient(rays_o).T,
        jax.lax.stop_gradient(rays_d).T,
        jax.lax.stop_gradient(t_enter)[None],
        jax.lax.stop_gradient(t_exit)[None],
    ], axis=0)  # [8, R]
    n = stack.shape[1]
    n_pad = (-n) % BLOCK_R
    stack = jnp.pad(stack, ((0, 0), (0, n_pad)))
    out = _sphere_march_t(stack, packed, pe, n_sphere, n_refine, t0,
                          float(margin), lip, dt_frac, cap_frac,
                          interpret=interpret, topology=topology,
                          refine=refine)
    return out[0, :n], out[1, :n] > 0.5


def hlo_flops(name: str, out_shapes, in_shapes):
    """Matmul FLOPs of one march invocation: rays x (field evals); the _w
    suffix selects the wide 3-matmul per-eval count, the `i` refine tag
    (Illinois) costs the same 1 eval/iteration as bisection. Uniform march
    evals = n_coarse + n_refine; sphere march = n_sphere + n_refine."""
    import re as _re

    from nero_tpu.ops.pallas.field_kernel import POINT_FLOPS, POINT_FLOPS_WIDE
    m = _re.fullmatch(r"nero_s?march_[cs](\d+)_r(\d+)i?(_w)?", name)
    if m is None:
        return None
    evals = int(m.group(1)) + int(m.group(2))
    per_eval = POINT_FLOPS_WIDE if m.group(3) else POINT_FLOPS
    return float(out_shapes[0][1]) * evals * per_eval   # out (8, N)


def march_fused(packed, rays_o, rays_d, t_enter, t_exit, *, pe: int = 6,
                n_coarse: int = 48, n_refine: int = 8, t0: float = 0.012,
                interpret: bool = False, topology: str = "std"):
    """Fused march of [R] rays. Returns (t_hit [R], found [R] bool).

    ``found`` does NOT account for bounding-sphere validity — callers mask
    with their own validity, exactly as neural_trace does. No gradients
    flow (visibility is a discrete decision); tangents are severed.
    """
    from nero_tpu.ops.pallas.interp import resolve
    interpret = resolve(interpret)
    packed = jax.tree_util.tree_map(jax.lax.stop_gradient, packed)
    stack = jnp.concatenate([
        jax.lax.stop_gradient(rays_o).T,
        jax.lax.stop_gradient(rays_d).T,
        jax.lax.stop_gradient(t_enter)[None],
        jax.lax.stop_gradient(t_exit)[None],
    ], axis=0)  # [8, R]
    n = stack.shape[1]
    n_pad = (-n) % BLOCK_R
    stack = jnp.pad(stack, ((0, 0), (0, n_pad)))
    out = _march_t(stack, packed, pe, n_coarse, n_refine, t0,
                   interpret=interpret, topology=topology)
    return out[0, :n], out[1, :n] > 0.5
