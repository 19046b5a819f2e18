"""Stage-II Monte-Carlo BRDF shader (Cook-Torrance GGX with traced visibility).

Parity target: reference network/field.py:660-1087 (`MaterialFeatsNetwork`,
`MCShadingNetwork`): per-point material features -> metallic/roughness/albedo
heads; cosine-sampled diffuse + GGX-importance-sampled specular directions
from precomputed Fibonacci-sphere stratification with random azimuth rotation
in training; every sample direction is ray-traced against the fixed mesh —
hits query the indirect-light MLP, misses the environment MLP (+ optional
camera-plane "human" light); an MIS-style mixed estimator combines them;
plus material-smoothness and min/max regularisers.

TPU-first notes: the [points, 768 dirs] block is shaded fully vectorised —
both light MLPs are evaluated on the full lattice and selected by the trace
hit mask (branch-free; keeps the MXU dense), the BVH traversal is the XLA
wavefront kernel (geometry/bvh_jax.py), and all RNG is explicit keys.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from nero_tpu.fields.app_shading import get_camera_plane_intersection
from nero_tpu.ops.mlp import (apply_dense, apply_predictor, hidden_dtype,
                              init_dense, init_predictor, resolve_weight_norm)
from nero_tpu.utils.color import linear_to_srgb
from nero_tpu.utils.encodings import (ide_dim, integrated_dir_encode,
                                      integrated_pos_encode, positional_encode,
                                      positional_encode_dim)
from nero_tpu.utils.sphere import (az_el_to_points, get_sphere_intersection,
                                   sample_sphere)


class MCShadingConfig(NamedTuple):
    diffuse_sample_num: int = 512
    specular_sample_num: int = 256
    human_lights: bool = True
    light_exp_max: float = 5.0
    inner_light_exp_max: float = 5.0
    outer_light_version: str = "direction"  # | "sphere_direction"
    geometry_type: str = "schlick"          # | "ggx_smith"
    reg_change: bool = True
    change_eps: float = 0.05
    change_type: str = "gaussian"
    reg_lambda1: float = 0.005
    reg_min_max: bool = True
    random_azimuth: bool = True
    is_real: bool = False
    ide_deg: int = 5
    # store hidden MLP activations in bf16 (see render/shape.py bf16_hidden —
    # the Stage-II light/material MLPs run on [pts x sample_dirs] batches where
    # activation HBM traffic dominates; f32 accumulation/outputs unchanged).
    # None = auto (on iff the backend is TPU — XLA:CPU emulates bf16 ~10x
    # slower); resolved in ONE place, `hidden_act_dtype`, so direct
    # construction and from_dict agree.
    bf16_hidden: bool | None = None
    # Hit-compacted inner-light evaluation: gather the traced HIT directions
    # into K = ceil(frac * pn * sn) static slots (hits-first, stable order),
    # run the inner-light MLP (fwd AND bwd) only on those, and scatter the
    # results back over the miss-branch lights. The reference evaluates
    # inner_light only on actual hits via dynamic torch indexing (reference
    # network/field.py:812-818) so its cost is hit-rate-adaptive; this is the
    # fixed-shape XLA equivalent. Hits beyond capacity fall back to the miss
    # branch (outer light) — NeROMaterialModel resolves frac at init by
    # measuring the scene's hemisphere hit rate and adding headroom, and
    # logs if a step could overflow. 0.0 = off (inner MLP on every dir).
    inner_compact_frac: float = 0.0
    # Miss-compacted outer-light evaluation — the symmetric optimization for
    # CONCAVE scenes (bowl: hit rate 0.61, so 61% of outer-light + human
    # IDE/MLP work evaluates directions whose result is discarded by the
    # hit select). Outer light (+ human light) runs only on K = ceil(frac *
    # pn*sn) compacted MISS slots; misses beyond capacity keep zero light
    # (init-time headroom makes that statistically unreachable, and the
    # compaction is train-only — validation always shades the full lattice).
    # 0.0 = off (outer MLP on every dir).
    outer_compact_frac: float = 0.0
    # run the light predictors (inner + outer heads + their IDE/PE
    # encodings) through the fused VMEM Pallas kernel
    # (ops/pallas/light_kernel.py, fwd AND bwd in-kernel) instead of XLA —
    # the Stage-II analogue of the Stage-I whole-shader kernel. MEASURED AND
    # REJECTED as a default (tools/ab_lights.py, data/r5_tpu/ab_lights.log,
    # v5e): bowl 52.2 -> 88.0 ms, sphere 44.6 -> 76.6 ms. The kernel does
    # cut counted bytes (bowl 33.7 -> 23.6 GB) but the light MLPs' HBM
    # traffic was already hidden behind the compute-bound march kernel
    # (57% of the step), so the saved bytes buy nothing, while the
    # vjp-in-kernel backward recompute triples the light FLOPs at ~25 TF/s
    # effective. None = off (resolved by `_fused_lights_active`); True
    # opts in on TPU v4+ / force_interpret where outer compaction is off
    # (with inner compaction on, the kernel runs outer-only). NOTE: like
    # the shader kernel, head weights AND their cotangents are bf16
    # in-kernel — quality-gated by tools/quality_lights_ab.py.
    fused_lights: bool | None = None

    @property
    def hidden_act_dtype(self):
        import jax.numpy as _jnp
        from nero_tpu.render.shape import _on_tpu
        on = _on_tpu() if self.bf16_hidden is None else self.bf16_hidden
        return _jnp.bfloat16 if on else None


def mc_config_from_dict(cfg: dict) -> MCShadingConfig:
    fields = {k: v for k, v in cfg.items() if k in MCShadingConfig._fields}
    return MCShadingConfig(**fields)


_warned_fused_lights_downgrade = False


def _fused_lights_active(cfg: MCShadingConfig) -> bool:
    """Resolve cfg.fused_lights at apply time (mirrors
    fields/app_shading.py::_fused_shader_active). Auto = OFF — the kernel
    measured 41-42% slower than the XLA light path in both compaction
    regimes (see the fused_lights field comment); True opts in where
    supported (TPU v4+ or force_interpret, outer compaction off)."""
    import jax

    from nero_tpu.fields.app_shading import _tpu_vmem_ok
    from nero_tpu.ops.pallas.interp import interpret_forced

    try:
        on_tpu = ((jax.default_backend() == "tpu" and _tpu_vmem_ok())
                  or interpret_forced())
    except Exception:
        on_tpu = False
    supported = cfg.outer_compact_frac == 0.0 and cfg.ide_deg <= 5
    if cfg.fused_lights is None:
        return False
    if cfg.fused_lights and not (on_tpu and supported):
        global _warned_fused_lights_downgrade
        if not _warned_fused_lights_downgrade:
            _warned_fused_lights_downgrade = True
            import warnings
            warnings.warn(
                "fused_lights=True was requested but the light kernel is "
                f"unsupported here (backend={jax.default_backend()}, "
                f"outer_compact_frac={cfg.outer_compact_frac}); falling "
                "back to the XLA light path.", RuntimeWarning, stacklevel=3)
        return False
    return bool(cfg.fused_lights)


# ---------------------------------------------------------------------------
# Material feature network
# ---------------------------------------------------------------------------

def init_material_feats(key):
    """PE(8) -> two 4x256 weight-norm blocks with a skip (reference field.py:660-689)."""
    in_dim = positional_encode_dim(3, 8)
    run = 256
    keys = jax.random.split(key, 8)
    m0 = [init_dense(keys[0], in_dim, run), init_dense(keys[1], run, run),
          init_dense(keys[2], run, run), init_dense(keys[3], run, run)]
    m1 = [init_dense(keys[4], in_dim + run, run), init_dense(keys[5], run, run),
          init_dense(keys[6], run, run), init_dense(keys[7], run, run)]
    return {"m0": m0, "m1": m1}


def material_feats_apply(params, x: jnp.ndarray) -> jnp.ndarray:
    enc = positional_encode(x, 8)
    h = enc
    for layer in params["m0"]:
        h = jax.nn.relu(apply_dense(layer, h))
    h = jnp.concatenate([h, enc], axis=-1)
    for i, layer in enumerate(params["m1"]):
        h = apply_dense(layer, h)
        if i < len(params["m1"]) - 1:
            h = jax.nn.relu(h)
    return h


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_mc_shading(key, cfg: MCShadingConfig = MCShadingConfig()):
    keys = jax.random.split(key, 8)
    sph = ide_dim(cfg.ide_deg)
    pos_dim = positional_encode_dim(3, 8)
    params = {
        "feats": init_material_feats(keys[0]),
        "metallic": init_predictor(keys[1], 256 + 3, 1),
        "roughness": init_predictor(keys[2], 256 + 3, 1),
        "albedo": init_predictor(keys[3], 256 + 3, 3),
        "outer_light": init_predictor(
            keys[4], sph * (2 if cfg.outer_light_version == "sphere_direction" else 1),
            3, final_bias=math.log(0.5)),
        "inner_light": init_predictor(keys[5], pos_dim + sph, 3,
                                      final_bias=math.log(0.5)),
    }
    if cfg.human_lights:
        params["human_light"] = init_predictor(keys[6], 2 * 2 * 6, 4,
                                               final_bias=math.log(0.02))
    return params


def make_direction_samples(cfg: MCShadingConfig):
    """Stratified Fibonacci-sphere (az, el) pairs scaled to [0,1]^2 (constants)."""
    def scaled(n):
        az, el = sample_sphere(n, 0)
        return np.stack([az * 0.5 / np.pi, 1 - 2 * el / np.pi], -1).astype(np.float32)
    az8, el8 = sample_sphere(8192, 0)
    return {
        "diffuse": jnp.asarray(scaled(cfg.diffuse_sample_num)),
        "specular": jnp.asarray(scaled(cfg.specular_sample_num)),
        "light_pts": jnp.asarray(az_el_to_points(az8, el8).astype(np.float32)),
    }


# ---------------------------------------------------------------------------
# Direction sampling
# ---------------------------------------------------------------------------

def get_orthogonal_directions(directions: jnp.ndarray) -> jnp.ndarray:
    x, y, z = directions[..., 0:1], directions[..., 1:2], directions[..., 2:3]
    otho0 = jnp.concatenate([y, -x, jnp.zeros_like(x)], -1)
    otho1 = jnp.concatenate([-z, jnp.zeros_like(x), x], -1)
    use0 = (jnp.linalg.norm(otho0, axis=-1, keepdims=True)
            > jnp.linalg.norm(otho1, axis=-1, keepdims=True))
    otho = jnp.where(use0, otho0, otho1)
    return otho / jnp.maximum(jnp.linalg.norm(otho, axis=-1, keepdims=True), 1e-12)


def sample_diffuse_directions(samples, normals, key=None):
    """Cosine-hemisphere dirs around normals; [pn, sn, 3]."""
    z = normals
    x = get_orthogonal_directions(normals)
    y = jnp.cross(z, x)
    az = samples[None, :, 0:1] * (2 * jnp.pi)
    el = samples[None, :, 1:2]
    if key is not None:
        rot = jax.random.uniform(key, (normals.shape[0], 1, 1)) * 2 * jnp.pi
        az = (az + rot) % (2 * jnp.pi)
    el_sqrt = jnp.sqrt(el + 1e-7)
    coeff_z = jnp.sqrt(1 - el + 1e-7)
    coeff_x = el_sqrt * jnp.cos(az)
    coeff_y = el_sqrt * jnp.sin(az)
    return (coeff_x * x[:, None] + coeff_y * y[:, None] + coeff_z * z[:, None])


def sample_specular_directions(samples, reflections, roughness, key=None):
    """GGX-importance dirs around reflections; roughness is already squared."""
    z = reflections
    x = get_orthogonal_directions(reflections)
    y = jnp.cross(z, x)
    a = roughness[:, None]                      # [pn,1,1]
    az = samples[None, :, 0:1]
    el = samples[None, :, 1:2]
    phi = 2 * jnp.pi * az
    cos_theta = jnp.sqrt((1.0 - el + 1e-6) / (1.0 + (a ** 2 - 1.0) * el + 1e-6) + 1e-6)
    sin_theta = jnp.sqrt(1 - cos_theta ** 2 + 1e-6)
    if key is not None:
        rot = jax.random.uniform(key, (reflections.shape[0], 1, 1)) * 2 * jnp.pi
        phi = (phi + rot) % (2 * jnp.pi)
    coeff_x = jnp.cos(phi) * sin_theta
    coeff_y = jnp.sin(phi) * sin_theta
    return (coeff_x * x[:, None] + coeff_y * y[:, None] + cos_theta * z[:, None])


# ---------------------------------------------------------------------------
# BRDF terms
# ---------------------------------------------------------------------------

def saturate_dot(v0, v1):
    return jnp.clip(jnp.sum(v0 * v1, axis=-1, keepdims=True), 0.0, 1.0)


def fresnel_schlick(F0, HoV):
    return F0 + (1.0 - F0) * jnp.clip(1.0 - HoV, 0.0, 1.0) ** 5.0


def distribution_ggx(NoH, roughness):
    a2 = roughness ** 2  # roughness is already alpha (= perceptual^2)
    denom = NoH ** 2 * (a2 - 1.0) + 1.0
    return a2 / (jnp.pi * denom ** 2 + 1e-4)


def geometry_schlick(NoV, NoL, roughness):
    def ggx(NoX):
        k = roughness / 2
        return NoX / (NoX * (1 - k) + k + 1e-5)
    return ggx(NoV) * ggx(NoL)


def geometry_ggx_smith(NoV, NoL, roughness):
    def lam(alpha2, cos_t):
        cos2 = cos_t ** 2
        tan2 = (1 - cos2) / (cos2 + 1e-7)
        return 0.5 * jnp.sqrt(1 + alpha2 * tan2) - 0.5
    alpha2 = roughness ** 2
    return 1.0 / (1.0 + lam(alpha2, NoV) + lam(alpha2, NoL))


def geometry_term(cfg: MCShadingConfig, NoV, NoL, roughness):
    if cfg.geometry_type == "schlick":
        return geometry_schlick(NoV, NoL, roughness)
    if cfg.geometry_type == "ggx_smith":
        return geometry_ggx_smith(NoV, NoL, roughness)
    raise NotImplementedError(cfg.geometry_type)


# ---------------------------------------------------------------------------
# Lights
# ---------------------------------------------------------------------------

def predict_materials_mc(params, pts):
    feats = material_feats_apply(params["feats"], pts)
    inp = jnp.concatenate([feats, pts], -1)
    metallic = apply_predictor(params["metallic"], inp)
    roughness = apply_predictor(params["roughness"], inp)
    rmax, rmin = 1.0, 0.04 ** 2
    roughness = roughness * (rmax - rmin) + rmin  # squared-roughness convention
    albedo = apply_predictor(params["albedo"], inp)
    return metallic, roughness, albedo


def get_inner_lights(params, cfg, points, view_dirs, normals):
    pos_enc = positional_encode(points, 8)
    normals = normals / jnp.maximum(jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12)
    view_dirs = view_dirs / jnp.maximum(jnp.linalg.norm(view_dirs, axis=-1, keepdims=True), 1e-12)
    reflections = jnp.sum(view_dirs * normals, -1, keepdims=True) * normals * 2 - view_dirs
    dir_enc = integrated_dir_encode(reflections, 0.0, cfg.ide_deg)
    return apply_predictor(params["inner_light"],
                           jnp.concatenate([pos_enc, dir_enc], -1),
                           activation="exp", exp_max=cfg.inner_light_exp_max)


def get_human_light(params, points, directions, human_poses):
    inter, dists, hits = get_camera_plane_intersection(points, directions, human_poses)
    scale = 0.3
    mean = inter[..., :2] * scale
    hits = hits & (jnp.linalg.norm(mean, axis=-1) < 1.5) & (dists > 0)
    hitsf = hits.astype(mean.dtype)[..., None]
    mean = mean * hitsf
    var = jnp.zeros_like(mean)
    pos_enc = integrated_pos_encode(mean, var, 0, 6)
    human = apply_predictor(params["human_light"], pos_enc,
                            activation="exp", exp_max=0.0) * hitsf
    return human[..., :3], jnp.clip(human[..., 3:], 0.0, 1.0)


def predict_outer_lights(params, cfg: MCShadingConfig, points, directions):
    outer_enc = integrated_dir_encode(directions, 0.0, cfg.ide_deg)
    if cfg.outer_light_version == "direction":
        return apply_predictor(params["outer_light"], outer_enc,
                               activation="exp", exp_max=cfg.light_exp_max)
    if cfg.outer_light_version == "sphere_direction":
        norm = jnp.linalg.norm(points, axis=-1, keepdims=True)
        pts = jnp.where(norm > 0.999, points * 0.999 / jnp.maximum(norm, 1e-12), points)
        dists = get_sphere_intersection(pts, directions)
        sphere_pts = pts + directions * dists
        sphere_enc = integrated_dir_encode(sphere_pts, 0.0, cfg.ide_deg)
        return apply_predictor(params["outer_light"],
                               jnp.concatenate([outer_enc, sphere_enc], -1),
                               activation="exp", exp_max=cfg.light_exp_max)
    raise NotImplementedError(cfg.outer_light_version)


def get_lights(params, cfg: MCShadingConfig, trace_fn, points, directions, human_poses):
    """Trace every sample direction; hit -> indirect MLP, miss -> env (+human).

    points/directions [pn,sn,3], human_poses [pn,sn,3,4] or None.
    Returns (lights [pn,sn,3], human_contrib, inters, normals, hit_mask)."""
    shape = points.shape[:-1]
    eps = 1e-5
    # The tracer is non-differentiable (as is the reference's CUDA BVH);
    # stop gradients at its boundary so reverse-mode never sees the while_loop.
    flat_o = jax.lax.stop_gradient(points.reshape(-1, 3) + directions.reshape(-1, 3) * eps)
    flat_d = jax.lax.stop_gradient(directions.reshape(-1, 3))
    inters, normals, depth, hit = jax.tree_util.tree_map(
        jax.lax.stop_gradient, trace_fn(flat_o, flat_d))
    inters = inters.reshape(*shape, 3)
    normals = normals.reshape(*shape, 3)
    depth = depth.reshape(*shape, 1)
    hit = hit.reshape(*shape)

    # NeuS-convention flip (reference renderer.py:719-729)
    normals = -normals

    # fused VMEM light kernel (ops/pallas/light_kernel.py): both heads when
    # nothing is compacted (the concave regime), outer-only when inner
    # compaction is active; final exp / hit-select / human mixing stay here
    inner_raw = None
    if cfg.outer_compact_frac == 0.0 and _fused_lights_active(cfg):
        from nero_tpu.ops.mlp import exp_activation
        from nero_tpu.ops.pallas.light_kernel import lights_fused_raw

        mode = "outer" if cfg.inner_compact_frac > 0.0 else "both"
        inner_z, outer_z = lights_fused_raw(params, cfg, points, directions,
                                            inters, normals, mode=mode)
        outer = exp_activation(outer_z, cfg.light_exp_max)
        if mode == "both":
            inner_raw = exp_activation(inner_z, cfg.inner_light_exp_max)
    elif cfg.outer_compact_frac == 0.0:
        outer = predict_outer_lights(params, cfg, points, directions)

    if cfg.outer_compact_frac > 0.0:
        miss_light, human_part = _compacted_miss_lights(
            params, cfg, points, directions, human_poses, hit)
    else:
        if cfg.human_lights:
            human_lights, human_weights = get_human_light(params, points,
                                                          directions, human_poses)
        else:
            human_lights = jnp.zeros_like(outer)
            human_weights = jnp.zeros_like(outer[..., :1])
        miss_light = outer * (1 - human_weights) + human_lights * human_weights
        human_part = human_lights * human_weights

    if cfg.inner_compact_frac > 0.0:
        lights = _compacted_inner_lights(params, cfg, inters, directions,
                                         normals, hit, miss_light)
    else:
        inner = (inner_raw if inner_raw is not None else
                 get_inner_lights(params, cfg, inters, -directions, normals))
        lights = jnp.where(hit[..., None], inner, miss_light)
    near_mask = (depth > eps).astype(lights.dtype)
    lights = lights * near_mask  # a surface immediately in front emits nothing
    human_contrib = jnp.where(hit[..., None], 0.0, human_part)
    return lights, human_contrib, inters, normals, hit


def _compacted_miss_lights(params, cfg, points, directions, human_poses, hit):
    """Outer (+human) light on MISS directions only, via static compaction.

    Mirror of _compacted_inner_lights for the concave regime (most sample
    dirs re-hit the object, so full-lattice outer light is mostly discarded
    work). Misses pack (stable order) into K = ceil(frac*N) slots; the outer
    MLP (+ camera-plane human light) runs on the [K] batch and scatters back
    over a zero base — hit entries stay zero and are overwritten by the
    inner branch anyway. Misses beyond capacity keep zero light; capacity is
    sized at init from the measured miss rate with 1.5x headroom and this
    path is train-only (validation shades the full lattice).
    Returns (miss_light [pn,sn,3], human_contrib [pn,sn,3])."""
    shape = hit.shape  # [pn, sn]
    n = int(np.prod(shape))
    k = -(-int(n * cfg.outer_compact_frac) // 128) * 128  # lane-multiple
    k = min(k, n)
    miss_flat = ~hit.reshape(-1)
    rank = jnp.cumsum(miss_flat) - 1
    n_miss = rank[-1] + 1
    slot = jnp.where(miss_flat, jnp.minimum(rank, k), k)
    compact_src = jnp.zeros((k + 1,), jnp.int32).at[slot].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")[:k]

    take = lambda a: a.reshape(n, -1)[compact_src]
    pts_k = take(points)
    dirs_k = take(directions)
    outer_k = predict_outer_lights(params, cfg, pts_k[:, None],
                                   dirs_k[:, None])[:, 0]
    if cfg.human_lights:
        hp_k = take(human_poses).reshape(-1, 1, 3, 4)
        human_k, hw_k = get_human_light(params, pts_k[:, None], dirs_k[:, None],
                                        hp_k)
        human_k, hw_k = human_k[:, 0], hw_k[:, 0]
        human_part_k = human_k * hw_k
        miss_k = outer_k * (1 - hw_k) + human_part_k
    else:
        human_part_k = jnp.zeros_like(outer_k)
        miss_k = outer_k

    valid = jnp.arange(k) < n_miss
    scatter_to = jnp.where(valid, compact_src, n)
    base = jnp.zeros((n + 1, 3), miss_k.dtype)
    miss_light = base.at[scatter_to].set(miss_k, mode="drop")[:n]
    human_part = base.at[scatter_to].set(human_part_k, mode="drop")[:n]
    return miss_light.reshape(*shape, 3), human_part.reshape(*shape, 3)


def _compacted_inner_lights(params, cfg, inters, directions, normals, hit,
                            miss_light):
    """Inner-light MLP on hit directions only, via static-capacity compaction.

    Hits are packed (stable order) into K = ceil(frac*N) slots with one
    cumsum + scatter; the MLP runs on the [K] batch and results scatter back
    over the miss-branch lights. Hits beyond capacity keep the miss light
    (the same fallback the near-surface mask applies); unfilled slots write
    to a trash row. Indices carry no gradient (the tracer is stop_gradient'd)
    so reverse-mode sees plain gather/scatter around a [K]-batch MLP."""
    shape = hit.shape  # [pn, sn]
    n = int(np.prod(shape))
    k = -(-int(n * cfg.inner_compact_frac) // 128) * 128  # lane-multiple
    k = min(k, n)
    hit_flat = hit.reshape(-1)
    rank = jnp.cumsum(hit_flat) - 1                     # rank among hits
    n_hits = rank[-1] + 1
    slot = jnp.where(hit_flat, jnp.minimum(rank, k), k)  # misses/overflow -> k
    # compact_src[i] = flat ray index occupying slot i (trash slot k dropped)
    compact_src = jnp.zeros((k + 1,), jnp.int32).at[slot].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")[:k]

    take = lambda a: a.reshape(n, -1)[compact_src]
    inner_k = get_inner_lights(params, cfg, take(inters),
                               -take(directions), take(normals))
    # slots past the hit count hold stale index 0 — route them to a trash row
    valid = jnp.arange(k) < n_hits
    scatter_to = jnp.where(valid, compact_src, n)
    lights = jnp.concatenate([miss_light.reshape(n, 3),
                              jnp.zeros((1, 3), miss_light.dtype)], axis=0)
    lights = lights.at[scatter_to].set(inner_k, mode="drop")
    return lights[:n].reshape(*shape, 3)


# ---------------------------------------------------------------------------
# Mixed MIS estimator
# ---------------------------------------------------------------------------

def shade_mixed(params, cfg: MCShadingConfig, samples, trace_fn, pts, normals,
                view_dirs, reflections, metallic, roughness, albedo, human_poses,
                key=None):
    F0 = 0.04 * (1 - metallic) + metallic * albedo

    if key is not None and cfg.random_azimuth:
        k_d, k_s = jax.random.split(key)
    else:
        k_d = k_s = None
    diffuse_dirs = sample_diffuse_directions(samples["diffuse"], normals, k_d)
    specular_dirs = sample_specular_directions(samples["specular"], reflections,
                                               roughness, k_s)
    dn = diffuse_dirs.shape[1]
    sn_ = specular_dirs.shape[1]
    total = dn + sn_

    NoL_d = saturate_dot(diffuse_dirs, normals[:, None])
    diffuse_prob = NoL_d / jnp.pi * (dn / total)

    H_s = view_dirs[:, None] + specular_dirs
    H_s = H_s / jnp.maximum(jnp.linalg.norm(H_s, axis=-1, keepdims=True), 1e-12)
    NoH_s = saturate_dot(normals[:, None], H_s)
    VoH_s = saturate_dot(view_dirs[:, None], H_s)
    specular_prob = (distribution_ggx(NoH_s, roughness[:, None]) * NoH_s
                     / (4 * VoH_s + 1e-5) * (sn_ / total))

    directions = jnp.concatenate([diffuse_dirs, specular_dirs], 1)
    probability = jnp.concatenate([diffuse_prob, specular_prob], 1)

    H = view_dirs[:, None] + directions
    H = H / jnp.maximum(jnp.linalg.norm(H, axis=-1, keepdims=True), 1e-12)
    HoV = saturate_dot(H, view_dirs[:, None])
    fresnel = fresnel_schlick(F0[:, None], HoV)
    NoV = saturate_dot(normals, view_dirs)[:, None]
    NoL = saturate_dot(normals[:, None], directions)
    geom = geometry_term(cfg, NoV, NoL, roughness[:, None])
    NoH = saturate_dot(normals[:, None], H)
    dist = distribution_ggx(NoH, roughness[:, None])

    hp = (jnp.broadcast_to(human_poses[:, None], (pts.shape[0], total, 3, 4))
          if human_poses is not None else None)
    pts_rep = jnp.broadcast_to(pts[:, None], (pts.shape[0], total, 3))
    lights, hl, light_pts, light_normals, light_hit = get_lights(
        params, cfg, trace_fn, pts_rep, directions, hp)

    specular_weights = dist * geom / (4 * NoV * probability + 1e-5)
    specular_lights = lights * specular_weights
    specular_colors = jnp.mean(fresnel * specular_lights, axis=1)

    kd = 1 - metallic[:, None]
    diffuse_lights = lights[:, :dn]
    diffuse_colors = jnp.mean(albedo[:, None] * kd[:, :dn] * diffuse_lights, axis=1)

    colors = linear_to_srgb(diffuse_colors + specular_colors)

    outputs = {
        "albedo": albedo,
        "roughness": roughness,
        "metallic": metallic,
        "human_lights": hl.reshape(-1, 3),
        "diffuse_light": jnp.clip(linear_to_srgb(jnp.mean(diffuse_lights, axis=1)), 0, 1),
        "specular_light": jnp.clip(linear_to_srgb(jnp.mean(specular_lights, axis=1)), 0, 1),
        "diffuse_color": jnp.clip(linear_to_srgb(diffuse_colors), 0, 1),
        "specular_color": jnp.clip(linear_to_srgb(specular_colors), 0, 1),
    }
    outputs["approximate_light"] = jnp.clip(
        linear_to_srgb(jnp.mean(kd[:, :dn] * diffuse_lights, axis=1))
        + outputs["specular_color"], 0, 1)
    return colors, outputs


def mc_shading_apply(params, cfg: MCShadingConfig, samples, trace_fn, pts,
                     view_dirs, normals, human_poses, key=None):
    """Full Stage-II shading (reference field.py:1014-1018)."""
    params = resolve_weight_norm(params)
    with hidden_dtype(cfg.hidden_act_dtype):
        view_dirs = view_dirs / jnp.maximum(jnp.linalg.norm(view_dirs, axis=-1, keepdims=True), 1e-12)
        normals = normals / jnp.maximum(jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12)
        reflections = jnp.sum(view_dirs * normals, -1, keepdims=True) * normals * 2 - view_dirs
        metallic, roughness, albedo = predict_materials_mc(params, pts)
        return shade_mixed(params, cfg, samples, trace_fn, pts, normals, view_dirs,
                           reflections, metallic, roughness, albedo, human_poses, key)


# ---------------------------------------------------------------------------
# Regularisers + environment export
# ---------------------------------------------------------------------------

def material_regularization(params, cfg: MCShadingConfig, key, pts, normals,
                            metallic, roughness, albedo, step):
    """Material smoothness + early min/max clamping (reference field.py:1061-1087)."""
    reg = jnp.zeros((pts.shape[0],))
    if cfg.reg_change:
        n = normals / jnp.maximum(jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12)
        x = get_orthogonal_directions(n)
        y = jnp.cross(n, x)
        k_ang, k_eps = jax.random.split(key)
        ang = jax.random.uniform(k_ang, (pts.shape[0], 1)) * 2 * jnp.pi
        if cfg.change_type == "constant":
            change = (jnp.cos(ang) * x + jnp.sin(ang) * y) * cfg.change_eps
        elif cfg.change_type == "gaussian":
            eps = cfg.change_eps * jax.random.normal(k_eps, (pts.shape[0], 1))
            change = (jnp.cos(ang) * x + jnp.sin(ang) * y) * eps
        else:
            raise NotImplementedError(cfg.change_type)
        m0, r0, a0 = predict_materials_mc(params, pts + change)
        reg = reg + jnp.mean(
            (jnp.abs(m0 - metallic) + jnp.abs(r0 - roughness) + jnp.abs(a0 - albedo))
            * cfg.reg_lambda1, axis=1)

    if cfg.reg_min_max:
        early = jnp.asarray(step < 2000, reg.dtype) if not isinstance(step, int) \
            else float(step < 2000)
        clamp = (jnp.sum(jnp.maximum(roughness - 0.98 ** 2, 0.0))
                 + jnp.sum(jnp.maximum(0.02 ** 2 - roughness, 0.0))
                 + jnp.sum(jnp.maximum(metallic - 0.98, 0.0))
                 + jnp.sum(jnp.maximum(0.02 - metallic, 0.0)))
        reg = reg + clamp * early
    return reg


def env_light_image(params, cfg: MCShadingConfig, h: int, w: int, gamma: bool = True):
    """Render the learned environment as a lat-long image (reference field.py:1020-1047)."""
    azs = jnp.linspace(1.0, 0.0, w) * jnp.pi * 2 - jnp.pi / 2
    els = jnp.linspace(1.0, -1.0, h) * jnp.pi / 2
    els, azs = jnp.meshgrid(els, azs, indexing="ij")
    if cfg.is_real:
        x = jnp.cos(els) * jnp.cos(azs)
        y = jnp.cos(els) * jnp.sin(azs)
        z = jnp.sin(els)
    else:
        z = jnp.cos(els) * jnp.cos(azs)
        x = jnp.cos(els) * jnp.sin(azs)
        y = jnp.sin(els)
    xyz = jnp.stack([x, y, z], -1).reshape(-1, 3)
    light = predict_outer_lights_pts(params, cfg, xyz)
    if gamma:
        light = linear_to_srgb(light)
    return light.reshape(h, w, 3)


def predict_outer_lights_pts(params, cfg: MCShadingConfig, pts):
    enc = integrated_dir_encode(pts, 0.0, cfg.ide_deg)
    if cfg.outer_light_version == "direction":
        return apply_predictor(params["outer_light"], enc,
                               activation="exp", exp_max=cfg.light_exp_max)
    if cfg.outer_light_version == "sphere_direction":
        return apply_predictor(params["outer_light"],
                               jnp.concatenate([enc, enc], -1),
                               activation="exp", exp_max=cfg.light_exp_max)
    raise NotImplementedError(cfg.outer_light_version)
