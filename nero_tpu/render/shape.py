"""Stage-I shape renderer: NeuS-style SDF volume rendering with split-sum shading.

Parity target: reference network/renderer.py:63-647 (`NeROShapeRenderer`):
hierarchical sampling (64 uniform + 4 upsample rounds of 16, clamped inv_s),
NeuS alpha from SDF section estimates with cosine annealing, NeRF++ outer
background, AppShadingNetwork colors, alpha compositing, eikonal/occ/init-sdf
regularisers.

TPU-first redesign (vs the reference's dynamic boolean indexing,
renderer.py:567-572):
  * the full [rays, 160] sample lattice is evaluated branch-free — the SDF
    branch over the 128 inner-lattice samples and the background NeRF over
    all 160 — and combined with `jnp.where` masks, so every step compiles to
    one static XLA program that keeps the MXU busy;
  * the occlusion loss's dynamic subset (renderer.py:535-541) becomes a
    fixed-size top-k-of-random-scores selection, masked by validity;
  * RNG is explicit (threaded keys), the step index is a traced scalar so
    one compiled program serves all steps.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from nero_tpu.fields.app_shading import (AppShadingConfig, app_shading_apply,
                                         shading_config_from_dict)
from nero_tpu.fields.bg_nerf import BgNeRFConfig, bg_nerf_apply, init_bg_nerf
from nero_tpu.fields.intersection import get_intersection
from nero_tpu.fields.sdf import SDFConfig, init_sdf, sdf_value, sdf_with_grad
from nero_tpu.fields.variance import init_variance, inv_s as variance_inv_s
from nero_tpu.fields.app_shading import init_app_shading
from nero_tpu.ops.mlp import hidden_dtype, resolve_weight_norm
from nero_tpu.ops.sample_pdf import sample_pdf
from nero_tpu.utils.color import linear_to_srgb


class ShapeConfig(NamedTuple):
    # sampling
    n_samples: int = 64
    n_bg_samples: int = 32
    n_importance: int = 64
    up_sample_steps: int = 4
    perturb: float = 1.0
    anneal_end: int = 50000
    train_ray_num: int = 512
    test_ray_num: int = 1024
    clip_sample_variance: bool = True
    # variance net
    std_act: str = "exp"
    inv_s_init: float = 0.3
    freeze_inv_s_step: int | None = None
    # sdf net
    sdf_n_layers: int = 8
    sdf_freq: int = 6
    sdf_d_out: int = 257
    sdf_bias: float = 0.5
    geometry_init: bool = True
    # losses
    rgb_loss: str = "charbonier"
    apply_occ_loss: bool = True
    occ_loss_step: int = 20000
    occ_loss_max_pn: int = 2048
    occ_sdf_thresh: float = 0.01
    # shader
    shader: AppShadingConfig = AppShadingConfig()
    fixed_camera: bool = False
    # evaluate the background NeRF on the inner lattice too (exact parity with
    # reference renderer.py:567-572, where inner samples that fall outside the
    # unit sphere take the background's alpha/color). The inner z range is the
    # unit-sphere chord, so only a sliver of boundary mid-points lands outside;
    # skipping them (False) drops ~45% of the step's background FLOPs.
    # Measured (tools/bench_stage1_ab.py + tools/eval_bg_on_inner.py, bowl 30k
    # checkpoint): step 48.4 -> 42.5 ms; val PSNR 31.52 -> 31.56 (+0.04 dB);
    # render-vs-render 43.6 dB.
    bg_on_inner: bool = False
    # spatial SDF gradient: 'rev' (reverse-mode, reference double-backprop
    # semantics), 'fwd' (linearize + 3 basis tangents), or 'fused' (Pallas
    # SDF-with-grad kernel, forward AND backward VMEM-resident). Measured on
    # v5e (tools/bench_stage1_ab.py): fwd is a net loss embedded in the train
    # step (54.2 vs 42.5 ms) — the 3 extra linear passes cost more than the
    # VJP-of-VJP they avoid. 'fused' is the round-3 winner on the
    # bandwidth-bound step (34.98 -> 29.53 ms @512 rays, 159.95 -> 130.48
    # @2048; quality gate tools/quality_grad_ab.py: identical 2k-step
    # learning curves and val PSNR vs 'rev'). None = auto ('fused' where the
    # TPU kernel supports the topology — see `grad_mode` — else 'rev'),
    # resolved in ONE place so direct construction and from_dict agree.
    sdf_grad_mode: str | None = None
    # rematerialize the appearance shader in the backward pass
    # (jax.checkpoint, nothing_saveable), trading recompute FLOPs for the
    # saved-activation bytes of the 6 predictor heads + IDE encodings.
    # MEASURED ON v5e AND REJECTED as the default
    # (tools/bench_stage1_ab.py remat): 29.65 -> 32.68 ms @512 rays,
    # 130.4 -> 145.4 @2048 — on this step the shader recompute (incl. the
    # IDE/PE transcendentals) costs more than the bytes it saves; XLA's
    # fusion already avoids round-tripping most elementwise intermediates.
    # Kept as measured infrastructure. None = auto (currently off).
    remat_shader: bool | None = None
    # fused Pallas SDF forward for no-grad paths (proposal sampler, occlusion
    # march) — TPU only, default topology only; ~2x XLA at occ-march batch sizes
    use_fused_sdf: bool = False
    # shade only the top-k inner samples by composited weight once the occ
    # phase starts (0 disables). Post-convergence the weight mass outside the
    # top 48 of 128 samples is <= 7.5e-4 on the worst ray (measured on the
    # trained concave scene; <=1e-2 beyond the top 32), so compaction is
    # render-exact to ~1/255. Measured on v5e it is only a ~2% step win at
    # k=32 (37.9 vs 38.8 ms; k=48 is a small net LOSS at 39.7) — the shader
    # does not shrink linearly at small batches and the branch boundary
    # costs fusion — so it stays OFF by default; flip on for configs with
    # heavier shaders (human_light real scenes, larger sample counts).
    # Training before occ_loss_step, and all validation renders, are always
    # full-lattice.
    shade_top_k: int = 0
    # store hidden MLP activations (SDF net + shader predictors) in bf16 inside
    # the differentiated render core. MXU inputs are bf16 under the default
    # matmul precision either way; this additionally halves the HBM traffic of
    # the saved activations and their cotangents in the (HBM-bound) backward.
    # f32 accumulation and f32 network outputs are unchanged. Measured: step
    # 42.6 -> 39.0 ms; trained-checkpoint render delta +0.005 dB (51 dB
    # render-vs-render agreement); 2.5k-step training from scratch reaches
    # PSNR 36.9 vs 36.8 f32 — default on for TPU. None = auto (on iff the
    # backend is TPU; XLA:CPU emulates bf16 ~10x slower), resolved in ONE
    # place (`hidden_act_dtype`) so direct construction and from_dict agree.
    bf16_hidden: bool | None = None

    @property
    def hidden_act_dtype(self):
        on = _on_tpu() if self.bf16_hidden is None else self.bf16_hidden
        return jnp.bfloat16 if on else None

    @property
    def grad_mode(self) -> str:
        """Resolved sdf_grad_mode. 'fused' needs the TPU Pallas kernel on the
        default topology (and d_out=257); it also stores activations in bf16
        (like bf16_hidden), so the None auto-default only picks it when bf16
        activations are also resolved on — an explicit bf16_hidden=False
        (numerical debugging of the eikonal/second-order path) must not be
        silently overridden by the kernel's internal bf16 storage.
        """
        fused_ok = _fused_sdf_supported(self) and self.sdf_cfg.d_out == 257
        if self.sdf_grad_mode is None:
            return ("fused" if fused_ok and self.hidden_act_dtype is not None
                    else "rev")
        if self.sdf_grad_mode == "fused" and not fused_ok:
            _warn_fused_downgrade(self)
            return "rev"
        return self.sdf_grad_mode

    @property
    def use_remat_shader(self) -> bool:
        """Resolved remat_shader (None = auto: off — measured net loss on
        v5e, see the field comment)."""
        return bool(self.remat_shader)

    @property
    def n_inner(self) -> int:
        return self.n_samples + self.n_importance

    @property
    def n_total(self) -> int:
        return self.n_inner + self.n_bg_samples

    @property
    def sdf_cfg(self) -> SDFConfig:
        return SDFConfig(d_out=self.sdf_d_out, n_layers=self.sdf_n_layers,
                         skip=self.sdf_n_layers // 2, multires=self.sdf_freq,
                         bias=self.sdf_bias, geometric_init=self.geometry_init)


def shape_config_from_dict(cfg: dict) -> ShapeConfig:
    fields = {k: v for k, v in cfg.items() if k in ShapeConfig._fields}
    fields["shader"] = shading_config_from_dict(cfg.get("shader_config", {}))
    scfg = ShapeConfig(**fields)
    # NOTE: fused-SDF stays opt-in — measured 2x faster in isolation at
    # occ-march batch sizes, but a net ~10% step regression when embedded
    # (the pallas_call boundary blocks XLA fusion with surrounding ops).
    if cfg.get("use_fused_sdf") and not _fused_sdf_supported(scfg):
        scfg = scfg._replace(use_fused_sdf=False)
    # fused shader heads need the TPU Pallas predictor kernel
    if scfg.shader.fused_heads and not _on_tpu():
        scfg = scfg._replace(shader=scfg.shader._replace(fused_heads=False))
    # sdf_grad_mode resolution ('fused' auto-default on TPU, fallbacks) lives
    # in the `grad_mode` property so direct construction and from_dict agree.
    return scfg


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


_warned_fused_downgrade = False


def _warn_fused_downgrade(scfg: "ShapeConfig") -> None:
    """One-time loud warning when an explicitly-requested sdf_grad_mode='fused'
    resolves to 'rev' (non-TPU backend or unsupported SDF topology), so a saved
    config can't silently claim the fused kernel while every consumer runs the
    rev path (ADVICE r3)."""
    global _warned_fused_downgrade
    if _warned_fused_downgrade:
        return
    _warned_fused_downgrade = True
    import warnings
    warnings.warn(
        "sdf_grad_mode='fused' was requested but the fused SDF-grad Pallas "
        f"kernel is unsupported here (backend={jax.default_backend()}, "
        f"topology {scfg.sdf_cfg.n_layers}x{scfg.sdf_cfg.d_hidden} "
        f"d_out={scfg.sdf_cfg.d_out}); falling back to 'rev'.",
        RuntimeWarning, stacklevel=3)


def _fused_sdf_supported(scfg: "ShapeConfig") -> bool:
    from nero_tpu.ops.pallas.interp import interpret_forced
    if not (_on_tpu() or interpret_forced()):
        return False
    c = scfg.sdf_cfg
    return (c.n_layers == 8 and c.d_hidden == 256 and c.multires > 0
            and c.skip == 4 and c.weight_norm)


def make_nograd_sdf_fn(params, scfg: "ShapeConfig"):
    """SDF value function for no-grad paths; fused Pallas kernel when enabled."""
    if scfg.use_fused_sdf:
        from nero_tpu.ops.pallas.sdf_kernel import pack_sdf_params, sdf_fwd_fused
        packed = pack_sdf_params(params["sdf"], scfg.sdf_cfg)
        return lambda x: sdf_fwd_fused(packed, x, scfg.sdf_cfg)
    return lambda x: sdf_value(params["sdf"], x, scfg.sdf_cfg)


def init_shape_params(key, scfg: ShapeConfig):
    k_sdf, k_bg, k_shader = jax.random.split(key, 3)
    return {
        "sdf": init_sdf(k_sdf, scfg.sdf_cfg),
        "variance": init_variance(scfg.inv_s_init),
        "bg": init_bg_nerf(k_bg, BgNeRFConfig(rgb_bias_init=math.log(0.5))),
        "shader": init_app_shading(k_shader, scfg.shader),
    }


# ---------------------------------------------------------------------------
# Hierarchical sampling
# ---------------------------------------------------------------------------

def _upsample_z(rays_o, rays_d, z_vals, sdf, n_new, inv_s):
    """One NeuS upsample round (reference renderer.py:355-385), deterministic."""
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    radius = jnp.linalg.norm(pts, axis=-1)
    inside = (radius[:, :-1] < 1.0) | (radius[:, 1:] < 1.0)

    prev_sdf, next_sdf = sdf[:, :-1], sdf[:, 1:]
    prev_z, next_z = z_vals[:, :-1], z_vals[:, 1:]
    mid_sdf = (prev_sdf + next_sdf) * 0.5
    cos_val = (next_sdf - prev_sdf) / (next_z - prev_z + 1e-5)
    prev_cos = jnp.concatenate([jnp.zeros_like(cos_val[:, :1]), cos_val[:, :-1]], axis=-1)
    cos_val = jnp.minimum(prev_cos, cos_val)
    cos_val = jnp.clip(cos_val, -1e3, 0.0) * inside.astype(sdf.dtype)

    dist = next_z - prev_z
    prev_esti = mid_sdf - cos_val * dist * 0.5
    next_esti = mid_sdf + cos_val * dist * 0.5
    prev_cdf = jax.nn.sigmoid(prev_esti * inv_s)
    next_cdf = jax.nn.sigmoid(next_esti * inv_s)
    alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)
    trans = jnp.cumprod(jnp.concatenate(
        [jnp.ones_like(alpha[:, :1]), 1.0 - alpha + 1e-7], axis=-1), axis=-1)[:, :-1]
    weights = alpha * trans
    return sample_pdf(z_vals, weights, n_new, key=None)


def sample_z_vals(params, scfg: ShapeConfig, rays_o, rays_d, near, far, key=None,
                  perturb: float = 1.0):
    """Inner z values [R, n_inner] + background z values [R, n_bg]; detached."""
    with hidden_dtype(scfg.hidden_act_dtype):
        return _sample_z_vals(params, scfg, rays_o, rays_d, near, far,
                              key=key, perturb=perturb)


def _sample_z_vals(params, scfg: ShapeConfig, rays_o, rays_d, near, far, key=None,
                   perturb: float = 1.0):
    r = rays_o.shape[0]
    sn = scfg.n_samples
    z = jnp.linspace(0.0, 1.0, sn, dtype=rays_o.dtype)
    z_vals = near + (far - near) * z[None, :]

    z_out_lin = jnp.linspace(1e-3, 1.0 - 1.0 / (scfg.n_bg_samples + 1.0), scfg.n_bg_samples,
                             dtype=rays_o.dtype)
    if perturb > 0 and key is not None:
        k1, k2 = jax.random.split(key)
        t_rand = jax.random.uniform(k1, (r, 1)) - 0.5
        z_vals = z_vals + t_rand * 2.0 / sn
        mids = 0.5 * (z_out_lin[1:] + z_out_lin[:-1])
        upper = jnp.concatenate([mids, z_out_lin[-1:]])
        lower = jnp.concatenate([z_out_lin[:1], mids])
        t2 = jax.random.uniform(k2, (r, scfg.n_bg_samples))
        z_out = lower[None, :] + (upper - lower)[None, :] * t2
    else:
        z_out = jnp.broadcast_to(z_out_lin[None, :], (r, scfg.n_bg_samples))

    z_vals_outside = far / jnp.flip(z_out, axis=-1) + 1.0 / scfg.n_bg_samples

    # Upsample rounds (no gradient flows back through the proposal machinery).
    n_new = scfg.n_importance // scfg.up_sample_steps
    base_inv_s = variance_inv_s(params["variance"], scfg.std_act)
    sdf_fn = make_nograd_sdf_fn(params, scfg)
    sdf = sdf_fn(rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None])[..., 0]
    for i in range(scfg.up_sample_steps):
        if scfg.clip_sample_variance:
            inv_s_i = jnp.minimum(base_inv_s, 64.0 * 2 ** i)
        else:
            inv_s_i = jnp.asarray(64.0 * 2 ** i, rays_o.dtype)
        new_z = _upsample_z(rays_o, rays_d, z_vals, sdf, n_new, inv_s_i)
        if i + 1 < scfg.up_sample_steps:
            new_pts = rays_o[:, None, :] + rays_d[:, None, :] * new_z[..., None]
            new_sdf = sdf_fn(new_pts)[..., 0]
            # one multi-operand sort keys (z, sdf) together — replaces
            # argsort + two take_along_axis gathers per round
            z_vals, sdf = jax.lax.sort(
                (jnp.concatenate([z_vals, new_z], axis=-1),
                 jnp.concatenate([sdf, new_sdf], axis=-1)),
                dimension=-1, num_keys=1)
        else:
            z_vals = jax.lax.sort(jnp.concatenate([z_vals, new_z], axis=-1),
                                  dimension=-1)

    return jax.lax.stop_gradient(z_vals), jax.lax.stop_gradient(z_vals_outside)


# ---------------------------------------------------------------------------
# Core rendering
# ---------------------------------------------------------------------------

def compute_sdf_alpha(params, scfg: ShapeConfig, points, dists, dirs, cos_anneal_ratio, step):
    """NeuS alpha on the inner lattice. points [R,S,3]. Returns alpha, grads, feats, inv_s, sdf."""
    if scfg.grad_mode == "fused":
        from nero_tpu.ops.pallas.sdf_grad_kernel import sdf_with_grad_fused
        sdf, feats, grads = sdf_with_grad_fused(params["sdf"], points, scfg.sdf_cfg)
    else:
        sdf, feats, grads = sdf_with_grad(params["sdf"], points, scfg.sdf_cfg,
                                          mode=scfg.grad_mode)
    sdf = sdf[..., 0]
    inv_s = jnp.clip(variance_inv_s(params["variance"], scfg.std_act), 1e-6, 1e6)
    if scfg.freeze_inv_s_step is not None:
        inv_s = jnp.where(step < scfg.freeze_inv_s_step, jax.lax.stop_gradient(inv_s), inv_s)

    true_cos = jnp.sum(dirs * grads, axis=-1)
    iter_cos = -(jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal_ratio)
                 + jax.nn.relu(-true_cos) * cos_anneal_ratio)

    est_next = sdf + iter_cos * dists * 0.5
    est_prev = sdf - iter_cos * dists * 0.5
    prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
    next_cdf = jax.nn.sigmoid(est_next * inv_s)
    alpha = jnp.clip((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5), 0.0, 1.0)
    return alpha, grads, feats, inv_s, sdf


def compute_density_alpha(params, points, dists, dirs):
    """Background NeRF++ alpha/color on arbitrary points (any radius)."""
    norm = jnp.maximum(jnp.linalg.norm(points, axis=-1, keepdims=True), 1e-3)
    pts4 = jnp.concatenate([points / norm, 1.0 / norm], axis=-1)
    density, color = bg_nerf_apply(params["bg"], pts4, dirs)
    alpha = 1.0 - jnp.exp(-jax.nn.softplus(density[..., 0]) * dists)
    color = linear_to_srgb(jnp.exp(jnp.minimum(color, 5.0)))
    return alpha, color


def _composite(alpha):
    """alpha [R,S] -> weights [R,S] with NeuS transmittance."""
    trans = jnp.cumprod(jnp.concatenate(
        [jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-7], axis=-1), axis=-1)[..., :-1]
    return alpha * trans


def compute_occ_loss(params, scfg: ShapeConfig, key, points, reflective, occ_prob,
                     sdf, grads, dirs, step):
    """Fixed-shape occlusion-probability supervision (reference renderer.py:522-548).

    Candidate selection is SEGMENTED per ray: each ray contributes its top
    k' = max_pn // R masked candidates (random scores), instead of one global
    top-k over all R*S flattened samples. A global top_k lowers to a full-array
    sort on TPU, so its cost grew superlinearly with the ray batch (the
    round-2 batch-scaling bottleneck: 12.1k rays/s @512 -> 9.7k @4096); the
    per-row top_k over S=128 is linear in R. The selected set differs from the
    reference's uniform global subsample only in spreading supervision evenly
    across rays (dense rays are capped at k' points), which is
    distribution-neutral for the masked-mean L1 target.
    """
    r, s = points.shape[:2]
    mask = ((jnp.linalg.norm(points, axis=-1) < 0.999)
            & (jnp.abs(sdf) < scfg.occ_sdf_thresh)
            & (jnp.sum(grads * dirs, axis=-1) < 0.0))                   # [R,S]
    score = jnp.where(mask, jax.random.uniform(key, (r, s)), -1.0)
    kpr = max(1, min(scfg.occ_loss_max_pn // r, s))
    top_vals, top_idx = jax.lax.top_k(score, kpr)                       # [R,kpr]
    valid = (top_vals > 0.0).reshape(-1)

    # one-hot matmul gather (see shade_compact): keeps the occ_prob gather and
    # its VJP on the MXU with no scatter
    onehot = (top_idx[:, :, None] ==
              jnp.arange(s)[None, None, :]).astype(points.dtype)        # [R,kpr,S]
    pts_k = jnp.einsum("rks,rsc->rkc", onehot, points).reshape(r * kpr, 3)
    refl_k = jnp.einsum("rks,rsc->rkc", onehot, reflective).reshape(r * kpr, 3)
    occ_k = jnp.einsum("rks,rs->rk", onehot, occ_prob).reshape(r * kpr)

    inv_s = variance_inv_s(params["variance"], scfg.std_act)
    sdf_fun = make_nograd_sdf_fn(params, scfg)
    _, inter_prob, _ = get_intersection(sdf_fun, inv_s, pts_k, refl_k, sn0=64, sn1=16)
    occ_gt = jnp.sum(inter_prob, axis=-1)
    l1 = jnp.abs(occ_k - occ_gt)
    return jnp.sum(l1 * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def render_core(params, scfg: ShapeConfig, fg_lut, rays_o, rays_d, z_full, human_poses,
                cos_anneal_ratio, step, is_train: bool, key=None):
    """z_full [R, n_total] (inner z then bg z). Returns the outputs dict."""
    with hidden_dtype(scfg.hidden_act_dtype):
        return _render_core(params, scfg, fg_lut, rays_o, rays_d, z_full,
                            human_poses, cos_anneal_ratio, step, is_train, key=key)


def _render_core(params, scfg: ShapeConfig, fg_lut, rays_o, rays_d, z_full, human_poses,
                 cos_anneal_ratio, step, is_train: bool, key=None):
    r, s_total = z_full.shape
    s_inner = scfg.n_inner

    dists = z_full[..., 1:] - z_full[..., :-1]
    dists = jnp.concatenate([dists, dists[..., -1:]], axis=-1)
    mid_z = z_full + dists * 0.5

    points = rays_o[:, None, :] + rays_d[:, None, :] * mid_z[..., None]  # [R,S,3]
    inner_mask = jnp.linalg.norm(points, axis=-1) <= 1.0                  # [R,S]
    dirs = jnp.broadcast_to(rays_d[:, None, :], points.shape)
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)

    # --- background branch ---
    if scfg.bg_on_inner:
        # exact parity: background evaluated on the full lattice, selected by
        # the inner mask below
        alpha_bg, color_bg = compute_density_alpha(params, points, dists, -dirs)
    else:
        # fast path: background only on the n_bg outer samples — the inner z
        # range is the unit-sphere chord, so inner samples outside the sphere
        # are a boundary sliver with ~zero background density
        alpha_out, color_out = compute_density_alpha(
            params, points[:, s_inner:], dists[:, s_inner:], -dirs[:, s_inner:])
        alpha_bg = jnp.concatenate(
            [jnp.zeros((r, s_inner), alpha_out.dtype), alpha_out], axis=1)
        color_bg = jnp.concatenate(
            [jnp.zeros((r, s_inner, 3), color_out.dtype), color_out], axis=1)

    # --- inner SDF branch (first n_inner samples) ---
    pts_in = points[:, :s_inner]
    dists_in = dists[:, :s_inner]
    dirs_in = dirs[:, :s_inner]
    alpha_sdf, grads, feats, inv_s, sdf = compute_sdf_alpha(
        params, scfg, pts_in, dists_in, dirs_in, cos_anneal_ratio, step)
    hp_in = jnp.broadcast_to(human_poses[:, None], (r, s_inner, 3, 4))

    inner_in = inner_mask[:, :s_inner]
    alpha = alpha_bg.at[:, :s_inner].set(
        jnp.where(inner_in, alpha_sdf, alpha_bg[:, :s_inner]))
    # weights depend on alpha only — computed BEFORE any shading, so the
    # shader can be restricted to the samples that actually carry mass.
    weights = _composite(alpha)

    # background contribution: every sample not replaced by the SDF branch
    mask_sdf = jnp.concatenate(
        [inner_in, jnp.zeros((r, s_total - s_inner), bool)], axis=1)
    rgb_bg_part = jnp.sum(color_bg * (weights * ~mask_sdf)[..., None], axis=1)

    # remat: don't save the shader's hidden activations for the backward —
    # recompute them (see ShapeConfig.remat_shader). nothing_saveable cuts
    # the most bytes on this HBM-bound step.
    shader_apply = app_shading_apply
    if is_train and scfg.use_remat_shader:
        shader_apply = jax.checkpoint(
            app_shading_apply, static_argnums=(1,),
            policy=jax.checkpoint_policies.nothing_saveable)

    def shade_full(_):
        """Reference semantics: shade all inner-lattice samples."""
        color_sdf, occ_info = shader_apply(
            params["shader"], scfg.shader, fg_lut, pts_in, grads, -dirs_in,
            feats, hp_in)
        w_sdf = weights[:, :s_inner] * inner_in
        rgb = rgb_bg_part + jnp.sum(color_sdf * w_sdf[..., None], axis=1)
        if scfg.apply_occ_loss and is_train:
            loss_occ = jax.lax.cond(
                step >= scfg.occ_loss_step,
                lambda _: compute_occ_loss(params, scfg, key, pts_in,
                                           occ_info["reflective"],
                                           occ_info["occ_prob"][..., 0], sdf,
                                           grads, dirs_in, step),
                lambda _: jnp.zeros(()), operand=None)
        else:
            loss_occ = jnp.zeros(())
        return rgb, loss_occ

    def shade_compact(_):
        """Importance-compacted shading: only the top-k samples by composited
        weight are shaded. Measured on the trained concave scene the weight
        mass outside the top-48 of 128 inner samples is <= 7.5e-4 worst-ray
        (mean 3e-4), so this is render-exact to ~1/255 while cutting ~60% of
        the shader FLOPs. Only active once geometry has concentrated the
        weights — gated on the same step as the occ loss."""
        k = scfg.shade_top_k
        w_in = weights[:, :s_inner] * inner_in
        wk, idx = jax.lax.top_k(w_in, k)                       # [R,k]
        # one-hot matmul gather: TPU scatters (the VJP of take_along_axis)
        # are slow; selection as a [R,k,S] one-hot einsum keeps both the
        # gather and its transpose on the MXU with no scatter anywhere.
        onehot = (idx[:, :, None] ==
                  jnp.arange(s_inner)[None, None, :]).astype(feats.dtype)
        sel2 = lambda a: jnp.einsum("rks,rsc->rkc", onehot, a)
        ptsk = sel2(pts_in)
        gradsk = sel2(grads)
        featsk = sel2(feats)
        dirsk = sel2(dirs_in)
        hpk = sel2(hp_in.reshape(r, s_inner, 12)).reshape(r, k, 3, 4)
        sdfk = jnp.einsum("rks,rs->rk", onehot, sdf)
        colork, occk = shader_apply(
            params["shader"], scfg.shader, fg_lut, ptsk, gradsk, -dirsk,
            featsk, hpk)
        rgb = rgb_bg_part + jnp.sum(colork * wk[..., None], axis=1)
        if scfg.apply_occ_loss and is_train:
            loss_occ = compute_occ_loss(params, scfg, key, ptsk,
                                        occk["reflective"],
                                        occk["occ_prob"][..., 0], sdfk,
                                        gradsk, dirsk, step)
        else:
            loss_occ = jnp.zeros(())
        return rgb, loss_occ

    k = scfg.shade_top_k
    if is_train and k and k < s_inner:
        # the compact branch activates exactly when the occ loss does — by
        # then the geometry (and thus the weight distribution) has converged
        ray_rgb, loss_occ = jax.lax.cond(step >= scfg.occ_loss_step,
                                         shade_compact, shade_full,
                                         operand=None)
    else:
        ray_rgb, loss_occ = shade_full(None)

    # eikonal over inner-lattice inside points (masked mean)
    grad_err = (jnp.linalg.norm(grads, axis=-1) - 1.0) ** 2
    n_inside = jnp.maximum(jnp.sum(inner_in), 1.0)
    gradient_error = jnp.sum(grad_err * inner_in) / n_inside

    outputs = {
        "ray_rgb": ray_rgb,
        "gradient_error": gradient_error.reshape(1),
        "std": jnp.mean(1.0 / inv_s).reshape(1),
    }

    # init-SDF regulariser inputs (first 1000 steps; loss module weights by step)
    outputs["sdf_pts_norm"] = jnp.linalg.norm(pts_in, axis=-1).reshape(-1)
    outputs["sdf_vals"] = sdf.reshape(-1)

    if scfg.apply_occ_loss and is_train:
        outputs["loss_occ"] = loss_occ.reshape(1)

    if not is_train:
        outputs.update(compute_validation_info(
            params, scfg, fg_lut, z_full, rays_o, rays_d, weights, human_poses))
    return outputs


def compute_validation_info(params, scfg: ShapeConfig, fg_lut, z_vals, rays_o, rays_d,
                            weights, human_poses):
    """Depth/normal/material maps + traced occ-prob gt (reference renderer.py:465-482)."""
    depth = jnp.sum(weights * z_vals, axis=-1, keepdims=True)
    points = depth * rays_d + rays_o
    sdf, feats, grads = sdf_with_grad(params["sdf"], points, scfg.sdf_cfg)
    inner = (jnp.linalg.norm(points, axis=-1, keepdims=True) <= 1.0).astype(points.dtype)
    normal = (grads / jnp.maximum(jnp.linalg.norm(grads, axis=-1, keepdims=True), 1e-12)
              + 1.0) * 0.5 * inner

    view = -rays_d / jnp.maximum(jnp.linalg.norm(rays_d, axis=-1, keepdims=True), 1e-12)
    _, occ_info, inter = app_shading_apply(params["shader"], scfg.shader, fg_lut,
                                           points, grads, view, feats, human_poses,
                                           inter_results=True)
    inv_s = variance_inv_s(params["variance"], scfg.std_act)
    sdf_fun = make_nograd_sdf_fn(params, scfg)
    _, occ_prob, _ = get_intersection(sdf_fun, inv_s, points, occ_info["reflective"],
                                      sn0=128, sn1=9)
    outputs = {"depth": depth, "normal": normal,
               "occ_prob_gt": jnp.sum(occ_prob, axis=-1, keepdims=True)}
    for k, v in inter.items():
        outputs[k] = v * inner
    return outputs


def render(params, scfg: ShapeConfig, fg_lut, rays_o, rays_d, near, far, human_poses,
           step, key=None, is_train: bool = True, perturb_overwrite: float = -1.0,
           cos_anneal_ratio=None):
    """Full Stage-I render of a ray batch. step may be a traced scalar."""
    # materialise weight-norm once; keeps the differentiated graph as plain
    # matmuls (autodiff chains back to {v,g} through this tiny transform)
    params = resolve_weight_norm(params)
    perturb = scfg.perturb if perturb_overwrite < 0 else perturb_overwrite
    if cos_anneal_ratio is None:
        if scfg.anneal_end < 0:
            cos_anneal_ratio = 1.0
        else:
            cos_anneal_ratio = jnp.minimum(1.0, step / scfg.anneal_end)
    if key is not None:
        k_sample, k_occ = jax.random.split(key)
    else:
        k_sample = k_occ = None
    z_inner, z_out = sample_z_vals(params, scfg, rays_o, rays_d, near, far,
                                   key=k_sample if perturb > 0 else None, perturb=perturb)
    z_full = jnp.concatenate([z_inner, z_out], axis=-1)
    return render_core(params, scfg, fg_lut, rays_o, rays_d, z_full, human_poses,
                       cos_anneal_ratio, step, is_train, key=k_occ)


# ---------------------------------------------------------------------------
# RGB losses
# ---------------------------------------------------------------------------

def compute_rgb_loss(rgb_pr, rgb_gt, kind: str = "charbonier"):
    if kind == "l2":
        return jnp.sum((rgb_pr - rgb_gt) ** 2, axis=-1)
    if kind == "l1":
        return jnp.sum(jnp.abs(rgb_pr - rgb_gt), axis=-1)
    if kind == "smooth_l1":
        beta = 0.25
        d = jnp.abs(rgb_pr - rgb_gt)
        return jnp.sum(jnp.where(d < beta, 0.5 * d ** 2 / beta, d - 0.5 * beta), axis=-1)
    if kind == "charbonier":
        eps = 0.001
        return jnp.sqrt(jnp.sum((rgb_gt - rgb_pr) ** 2, axis=-1) + eps)
    raise NotImplementedError(kind)
