"""Stage-I appearance shader (split-sum light approximation).

Parity target: reference network/field.py:486-657 (`AppShadingNetwork`):
metallic / roughness / albedo heads on (SDF features, position); direct
light from an IDE-encoded reflection-direction MLP; indirect light and an
occlusion-probability head on positionally-encoded inputs; optional
"human light" (light reflected off the photographer) via a camera-plane
intersection with mip-NeRF IPE; split-sum specular with an FG LUT; final
linear->sRGB. Everything is fixed-shape jnp, branch-free via jnp.where.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from nero_tpu.ops.fg_lut import fg_lookup
from nero_tpu.ops.mlp import apply_predictor, init_predictor
from nero_tpu.utils.color import linear_to_srgb
from nero_tpu.utils.encodings import (ide_dim, integrated_dir_encode,
                                      integrated_pos_encode, positional_encode,
                                      positional_encode_dim)
from nero_tpu.utils.sphere import get_sphere_intersection, offset_points_to_sphere


class AppShadingConfig(NamedTuple):
    human_light: bool = False
    sphere_direction: bool = False
    light_pos_freq: int = 8
    inner_init: float = -0.95
    roughness_init: float = 0.0
    metallic_init: float = 0.0
    light_exp_max: float = 0.0
    feats_dim: int = 256
    ide_deg: int = 5
    # run the 4-layer heads through the fused Pallas predictor kernel
    # (ops/pallas/predictor_kernel.py) — TPU only, resolved by
    # render/shape.py::shape_config_from_dict
    fused_heads: bool = False
    # run the ENTIRE shader (6 heads + IDE/PE encodings) through the fused
    # whole-shader Pallas kernel (ops/pallas/shader_kernel.py, forward AND
    # backward VMEM-resident). Unlike fused_heads (measured neutral), this
    # also keeps the encodings and head inputs out of HBM — the shader VJP
    # was 12.4 ms / 14.8 GB of the 29.6 ms step (round-4 bytes ledger).
    # None = auto, resolved at apply time by `_fused_shader_active` below
    # (TPU with >=64M VMEM per core + supported topology + bf16 hidden
    # resolved on). human_light configs fall back to the XLA path
    # (camera-plane IPE not in-kernel). NOTE: the kernel stores HEAD
    # WEIGHTS in bf16 and quantizes their cotangents to bf16 too — a
    # lower-precision gradient path than XLA bf16_hidden (which keeps f32
    # weights/grads); gated by the 30k training-quality A/B
    # (tools/quality_shader_ab.py, data/evidence/quality_shader_ab_*.json).
    fused_shader: bool | None = None


def shading_config_from_dict(cfg: dict) -> AppShadingConfig:
    fields = AppShadingConfig._fields
    return AppShadingConfig(**{k: v for k, v in cfg.items() if k in fields})


def init_app_shading(key, cfg: AppShadingConfig = AppShadingConfig()):
    keys = jax.random.split(key, 8)
    sph_dim = ide_dim(cfg.ide_deg)                      # 72 for deg 5
    pos_dim = positional_encode_dim(3, cfg.light_pos_freq)
    dir_dim = positional_encode_dim(3, 6)
    feats = cfg.feats_dim

    params = {
        "metallic": init_predictor(keys[0], feats + 3, 1,
                                   final_bias=cfg.metallic_init if cfg.metallic_init != 0 else None),
        "roughness": init_predictor(keys[1], feats + 3, 1,
                                    final_bias=cfg.roughness_init if cfg.roughness_init != 0 else None),
        "albedo": init_predictor(keys[2], feats + 3, 3),
        "outer_light": init_predictor(keys[3], sph_dim * (2 if cfg.sphere_direction else 1), 3,
                                      final_bias=math.log(0.5)),
        "inner_light": init_predictor(keys[4], pos_dim + sph_dim, 3, final_bias=math.log(0.5)),
        "inner_weight": init_predictor(keys[5], pos_dim + dir_dim, 1, final_bias=cfg.inner_init),
    }
    if cfg.human_light:
        params["human_light"] = init_predictor(keys[6], 2 * 2 * 6, 4, final_bias=math.log(0.01))
    return params


# ---------------------------------------------------------------------------
# Camera-plane ("human") light
# ---------------------------------------------------------------------------

def get_camera_plane_intersection(pts: jnp.ndarray, dirs: jnp.ndarray, poses: jnp.ndarray):
    """Intersect rays with the camera XoY plane in 'human' coordinates.

    pts, dirs [...,3]; poses [...,3,4]. Returns (inter [...,3], dist [...], hits [...]).
    """
    R = poses[..., :, :3]
    t = poses[..., :, 3]
    pts_h = jnp.einsum("...ij,...j->...i", R, pts) + t
    dirs_h = jnp.einsum("...ij,...j->...i", R, dirs)
    hits = jnp.abs(dirs_h[..., 2]) > 1e-4
    dirs_z = jnp.where(hits, dirs_h[..., 2], 1e-4)
    dist = -pts_h[..., 2] / dirs_z
    inter = pts_h + dist[..., None] * dirs_h
    return inter, dist, hits


def predict_human_light(params, cfg: AppShadingConfig, points, reflective, human_poses, roughness):
    inter, dists, hits = get_camera_plane_intersection(points, reflective, human_poses)
    scale = 0.3
    mean = inter[..., :2] * scale
    var = roughness * (dists[..., None] * scale) ** 2
    hits = hits & (jnp.linalg.norm(mean, axis=-1) < 1.5) & (dists > 0)
    hitsf = hits.astype(mean.dtype)[..., None]
    mean = mean * hitsf
    var = jnp.broadcast_to(var * hitsf, mean.shape)
    pos_enc = integrated_pos_encode(mean, var, 0, 6)
    # exp clamped at 0 (reference make_predictor default exp_max=0.0) -> <= 1
    human = apply_predictor(params["human_light"], pos_enc, activation="exp",
                            exp_max=0.0, fused=cfg.fused_heads) * hitsf
    human_light, human_weight = human[..., :3], human[..., 3:]
    return human_light, jnp.clip(human_weight, 0.0, 1.0)


# ---------------------------------------------------------------------------
# Forward shading
# ---------------------------------------------------------------------------

def _sphere_dir_enc(cfg, points, directions, roughness):
    sph_points = offset_points_to_sphere(points)
    hit = sph_points + directions * get_sphere_intersection(sph_points, directions)
    hit = hit / jnp.maximum(jnp.linalg.norm(hit, axis=-1, keepdims=True), 1e-12)
    return integrated_dir_encode(hit, roughness, cfg.ide_deg)


def predict_diffuse_lights(params, cfg: AppShadingConfig, points, normals):
    roughness = jnp.ones_like(points[..., :1])
    ref = integrated_dir_encode(normals, roughness, cfg.ide_deg)
    if cfg.sphere_direction:
        sph = _sphere_dir_enc(cfg, points, normals, roughness)
        ref = jnp.concatenate([ref, sph], axis=-1)
    return apply_predictor(params["outer_light"], ref, activation="exp",
                           exp_max=cfg.light_exp_max, fused=cfg.fused_heads)


def predict_specular_lights(params, cfg: AppShadingConfig, points, reflective, roughness, human_poses):
    ref_rough = integrated_dir_encode(reflective, roughness, cfg.ide_deg)
    pts = positional_encode(points, cfg.light_pos_freq)
    if cfg.sphere_direction:
        sph = _sphere_dir_enc(cfg, points, reflective, roughness)
        direct_light = apply_predictor(params["outer_light"],
                                       jnp.concatenate([ref_rough, sph], -1),
                                       activation="exp", exp_max=cfg.light_exp_max,
                                       fused=cfg.fused_heads)
    else:
        direct_light = apply_predictor(params["outer_light"], ref_rough,
                                       activation="exp", exp_max=cfg.light_exp_max,
                                       fused=cfg.fused_heads)

    if cfg.human_light:
        human_light, human_weight = predict_human_light(params, cfg, points, reflective,
                                                        human_poses, roughness)
    else:
        human_light, human_weight = 0.0, 0.0

    indirect_light = apply_predictor(params["inner_light"],
                                     jnp.concatenate([pts, ref_rough], -1),
                                     activation="exp", exp_max=cfg.light_exp_max,
                                     fused=cfg.fused_heads)
    ref_enc = positional_encode(reflective, 6)
    occ_inp = jnp.concatenate([jax.lax.stop_gradient(pts), jax.lax.stop_gradient(ref_enc)], -1)
    occ_prob = apply_predictor(params["inner_weight"], occ_inp, activation="none",
                               fused=cfg.fused_heads)
    occ_prob = occ_prob * 0.5 + 0.5
    occ_prob_c = jnp.clip(occ_prob, 0.0, 1.0)

    light = (indirect_light * occ_prob_c
             + (human_light * human_weight + direct_light * (1 - human_weight)) * (1 - occ_prob_c))
    indirect_light = indirect_light * occ_prob_c
    return light, occ_prob, indirect_light, human_light * human_weight


def predict_materials(params, points, feature_vectors, fused: bool = False):
    inp = jnp.concatenate([feature_vectors, points], -1)
    metallic = apply_predictor(params["metallic"], inp, activation="sigmoid", fused=fused)
    roughness = apply_predictor(params["roughness"], inp, activation="sigmoid", fused=fused)
    albedo = apply_predictor(params["albedo"], inp, activation="sigmoid", fused=fused)
    return metallic, roughness, albedo


def fused_shader_supported(cfg: AppShadingConfig) -> bool:
    """Topology the whole-shader kernel handles (backend gating lives in
    `_fused_shader_active`; tests drive the kernel in interpret mode).
    human_light is supported since round 5: the camera-plane intersection +
    IPE + 7th head run in-kernel (shader_kernel.py::_human_block)."""
    return cfg.feats_dim == 256 and cfg.ide_deg <= 5


_warned_fused_shader_downgrade = False


def _tpu_vmem_ok() -> bool:
    """The shader backward kernel requests a 100M VMEM scoped cap
    (shader_kernel.py::_bwd_call); v4+ cores carry 128M physical VMEM,
    while v2/v3 (16/32M) would fail at Mosaic compile time rather than
    fall back — so generation-gate here (ADVICE r4)."""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return False
    return any(t in kind for t in ("v4", "v5", "v6", "v7"))


def _fused_shader_active(cfg: AppShadingConfig) -> bool:
    """Resolve cfg.fused_shader at apply time, in ONE place for every
    construction path. None = auto: on iff TPU (v4+, see `_tpu_vmem_ok`)
    + supported topology + the bf16 hidden-activation context is active
    (the kernel stores matmul operands in bf16 internally, so an explicit
    bf16_hidden=False must not be silently overridden — same rule as
    ShapeConfig.grad_mode)."""
    from nero_tpu.ops.mlp import current_hidden_dtype
    from nero_tpu.ops.pallas.interp import interpret_forced

    try:
        on_tpu = ((jax.default_backend() == "tpu" and _tpu_vmem_ok())
                  or interpret_forced())
    except Exception:
        on_tpu = False
    if cfg.fused_shader is None:
        # the human_light (GlossyReal) leg is built + parity-tested but
        # MEASURED AND REJECTED as a default (tools/bench_stage1_ab.py
        # shader_human, data/r5_tpu/ab_shader_human.log, v5e): 32.6 ->
        # 40.5 ms @512 rays, 142 -> 169 @2048 — the camera-plane IPE's
        # narrow [BB,2] columns waste VPU lanes in-kernel and the 7-head
        # backward recompute grows, while XLA overlaps the same work.
        # fused_shader=True opts in (quality-gated: quality_shader_ab
        # human).
        return (on_tpu and fused_shader_supported(cfg)
                and not cfg.human_light
                and current_hidden_dtype() == jnp.bfloat16)
    if cfg.fused_shader and not (on_tpu and fused_shader_supported(cfg)):
        global _warned_fused_shader_downgrade
        if not _warned_fused_shader_downgrade:
            _warned_fused_shader_downgrade = True
            import warnings
            warnings.warn(
                "shader_config fused_shader=True was requested but the "
                "whole-shader Pallas kernel is unsupported here "
                f"(backend={jax.default_backend()}, "
                f"device_kind={getattr(jax.devices()[0], 'device_kind', '?')}"
                " — needs TPU v4+ for the 100M VMEM backward, human_light="
                f"{cfg.human_light}, feats_dim={cfg.feats_dim}); falling "
                "back to the XLA shader.", RuntimeWarning, stacklevel=3)
        return False
    return bool(cfg.fused_shader)


def _app_shading_apply_fused(params, cfg, fg_lut, points, normals, view_dirs,
                             feature_vectors, human_poses, inter_results,
                             interpret=False):
    """Whole-shader Pallas path: raw head outputs from the kernel, final
    activations + split-sum combine here (identical math to the XLA path
    below — keep the two in lockstep)."""
    from nero_tpu.ops.mlp import exp_activation
    from nero_tpu.ops.pallas.shader_kernel import shader_fused_raw

    raw = shader_fused_raw(params, cfg, points, normals, view_dirs,
                           feature_vectors, human_poses=human_poses,
                           interpret=interpret)
    metallic = jax.nn.sigmoid(raw["metallic_z"])
    roughness = jax.nn.sigmoid(raw["roughness_z"])
    albedo = jax.nn.sigmoid(raw["albedo_z"])
    diffuse_light = exp_activation(raw["diffuse_light_z"], cfg.light_exp_max)
    direct_light = exp_activation(raw["direct_light_z"], cfg.light_exp_max)
    indirect_raw = exp_activation(raw["inner_light_z"], cfg.light_exp_max)
    occ_prob = raw["occ_z"] * 0.5 + 0.5
    occ_prob_c = jnp.clip(occ_prob, 0.0, 1.0)
    reflective = raw["reflective"]

    if cfg.human_light:
        # exp clamped at 0 (reference make_predictor exp_max=0.0), hit mask
        # applied to the ACTIVATED output — parity with predict_human_light
        human = exp_activation(raw["human_z"], 0.0) * raw["human_hits"]
        human_light = human[..., :3]
        human_weight = jnp.clip(human[..., 3:], 0.0, 1.0)
        direct_mix = (human_light * human_weight
                      + direct_light * (1 - human_weight))
    else:
        human_light, human_weight = 0.0, 0.0
        direct_mix = direct_light

    specular_light = indirect_raw * occ_prob_c + direct_mix * (1 - occ_prob_c)
    indirect_light = indirect_raw * occ_prob_c
    diffuse_albedo = (1 - metallic) * albedo
    diffuse_color = diffuse_albedo * diffuse_light
    specular_albedo = 0.04 * (1 - metallic) + metallic * albedo
    fg = fg_lookup(fg_lut, jnp.clip(raw["NoV"], 0.0, 1.0),
                   jnp.clip(roughness, 0.0, 1.0))
    specular_ref = specular_albedo * fg[..., 0:1] + fg[..., 1:2]
    specular_color = specular_ref * specular_light
    color = jnp.clip(linear_to_srgb(diffuse_color + specular_color), 0.0, 1.0)

    occ_info = {"reflective": reflective, "occ_prob": occ_prob}
    if not inter_results:
        return color, occ_info
    inter = {
        "specular_albedo": specular_albedo,
        "specular_ref": jnp.clip(specular_ref, 0.0, 1.0),
        "specular_light": jnp.clip(linear_to_srgb(specular_light), 0.0, 1.0),
        "specular_color": jnp.clip(linear_to_srgb(specular_color), 0.0, 1.0),
        "diffuse_albedo": diffuse_albedo,
        "diffuse_light": jnp.clip(linear_to_srgb(diffuse_light), 0.0, 1.0),
        "diffuse_color": jnp.clip(linear_to_srgb(diffuse_color), 0.0, 1.0),
        "metallic": metallic,
        "roughness": roughness,
        "occ_prob": jnp.clip(occ_prob, 0.0, 1.0),
        "indirect_light": indirect_light,
    }
    if cfg.human_light:
        inter["human_light"] = linear_to_srgb(human_light * human_weight)
    return color, occ_info, inter


def app_shading_apply(params, cfg: AppShadingConfig, fg_lut, points, normals, view_dirs,
                      feature_vectors, human_poses, inter_results: bool = False):
    """Shade surface samples; returns (color_srgb, occ_info[, intermediates])."""
    if _fused_shader_active(cfg):
        return _app_shading_apply_fused(params, cfg, fg_lut, points, normals,
                                        view_dirs, feature_vectors,
                                        human_poses, inter_results)
    normals = normals / jnp.maximum(jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12)
    view_dirs = view_dirs / jnp.maximum(jnp.linalg.norm(view_dirs, axis=-1, keepdims=True), 1e-12)
    reflective = jnp.sum(view_dirs * normals, -1, keepdims=True) * normals * 2 - view_dirs
    NoV = jnp.sum(normals * view_dirs, -1, keepdims=True)

    metallic, roughness, albedo = predict_materials(params, points, feature_vectors,
                                                    fused=cfg.fused_heads)

    diffuse_albedo = (1 - metallic) * albedo
    diffuse_light = predict_diffuse_lights(params, cfg, points, normals)
    diffuse_color = diffuse_albedo * diffuse_light

    specular_albedo = 0.04 * (1 - metallic) + metallic * albedo
    specular_light, occ_prob, indirect_light, human_light = predict_specular_lights(
        params, cfg, points, reflective, roughness, human_poses)

    fg = fg_lookup(fg_lut, jnp.clip(NoV, 0.0, 1.0), jnp.clip(roughness, 0.0, 1.0))
    specular_ref = specular_albedo * fg[..., 0:1] + fg[..., 1:2]
    specular_color = specular_ref * specular_light

    color = diffuse_color + specular_color
    color = jnp.clip(linear_to_srgb(color), 0.0, 1.0)

    occ_info = {"reflective": reflective, "occ_prob": occ_prob}
    if not inter_results:
        return color, occ_info

    inter = {
        "specular_albedo": specular_albedo,
        "specular_ref": jnp.clip(specular_ref, 0.0, 1.0),
        "specular_light": jnp.clip(linear_to_srgb(specular_light), 0.0, 1.0),
        "specular_color": jnp.clip(linear_to_srgb(specular_color), 0.0, 1.0),
        "diffuse_albedo": diffuse_albedo,
        "diffuse_light": jnp.clip(linear_to_srgb(diffuse_light), 0.0, 1.0),
        "diffuse_color": jnp.clip(linear_to_srgb(diffuse_color), 0.0, 1.0),
        "metallic": metallic,
        "roughness": roughness,
        "occ_prob": jnp.clip(occ_prob, 0.0, 1.0),
        "indirect_light": indirect_light,
    }
    if cfg.human_light:
        inter["human_light"] = linear_to_srgb(human_light)
    return color, occ_info, inter
