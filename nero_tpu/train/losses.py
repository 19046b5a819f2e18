"""Loss registry — pure jnp callables composed inside the jitted train step.

Parity target: reference network/loss.py (name2loss registry). Every loss is
`fn(data_pr, data_gt, step, cfg) -> dict`; the trainer sums every returned
key that starts with 'loss' (reference train/trainer.py:134-137). Unlike the
reference's host-side Python conditionals, step-dependent gating is expressed
with jnp.where so a single compiled program covers the whole schedule.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

_PASSTHROUGH_RGB_KEYS = ("loss_rgb", "loss_rgb_fine", "loss_global_rgb",
                         "loss_rgb_inner", "loss_rgb0", "loss_rgb1", "loss_masks")


def nerf_render_loss(data_pr, data_gt, step, cfg):
    return {k: data_pr[k] for k in _PASSTHROUGH_RGB_KEYS if k in data_pr}


def eikonal_loss(data_pr, data_gt, step, cfg):
    weight = cfg.get("eikonal_weight", 0.1)
    begin = cfg.get("eikonal_weight_anneal_begin", 0)
    end = cfg.get("eikonal_weight_anneal_end", 0)
    if end > begin:
        ramp = jnp.clip((step - begin) / (end - begin), 0.0, 1.0)
        w = jnp.where(step < begin, 0.0, weight * ramp)
    else:
        w = weight
    return {"loss_eikonal": data_pr["gradient_error"] * w}


def std_recorder(data_pr, data_gt, step, cfg):
    out = {}
    if "std" in data_pr:
        out["std"] = data_pr["std"]
        if cfg.get("apply_std_loss", False):
            out["loss_std"] = data_pr["std"] * cfg.get("std_loss_weight", 0.05)
    for k in ("inner_std", "outer_std"):
        if k in data_pr:
            out[k] = data_pr[k]
    return out


def occ_loss(data_pr, data_gt, step, cfg):
    if "loss_occ" in data_pr:
        return {"loss_occ": jnp.mean(data_pr["loss_occ"]).reshape(1)}
    return {}


def init_sdf_reg_loss(data_pr, data_gt, step, cfg):
    """Sphere prior on the early SDF (reference network/loss.py:90-122):
    inside a 0.1 ball the sdf must go negative, outside a 1.05 ball positive;
    cosine-annealed to zero over the first 1000 steps. Fixed-shape masked
    version of the reference's boolean-indexed means."""
    if "sdf_vals" not in data_pr or "sdf_pts_norm" not in data_pr:
        return {}
    reg_step = 1000
    small_thr, large_thr = 0.1, 1.05
    norm = data_pr["sdf_pts_norm"]
    sdf = data_pr["sdf_vals"]

    small_mask = norm < small_thr
    bounds_s = norm - small_thr
    small_vec = jnp.maximum(sdf - bounds_s, 0.0) * small_mask
    small_mean = jnp.sum(small_vec) / jnp.maximum(jnp.sum(small_mask), 1.0)
    small_loss = small_mean / ((small_mean > 1e-5).astype(sdf.dtype) + 1e-3)

    large_mask = norm > large_thr
    bounds_l = norm - large_thr
    large_vec = jnp.maximum(bounds_l - sdf, 0.0) * large_mask
    active = jnp.sum((large_vec > 1e-5).astype(sdf.dtype))
    large_loss = jnp.sum(large_vec) / (active + 1e-3)

    anneal = (jnp.cos(jnp.clip(step / reg_step, 0.0, 1.0) * math.pi) + 1.0) / 2.0
    gate = jnp.asarray(step < reg_step, dtype=sdf.dtype)
    return {"loss_sdf_large": (large_loss * anneal * gate).reshape(1),
            "loss_sdf_small": (small_loss * anneal * gate).reshape(1)}


def mat_reg_loss(data_pr, data_gt, step, cfg):
    out = {}
    if "loss_mat_reg" in data_pr:
        out["loss_mat_reg"] = data_pr["loss_mat_reg"]
    if "loss_diffuse_light" in data_pr:
        out["loss_diffuse_light"] = data_pr["loss_diffuse_light"]
    return out


name2loss = {
    "nerf_render": nerf_render_loss,
    "eikonal": eikonal_loss,
    "std": std_recorder,
    "init_sdf_reg": init_sdf_reg_loss,
    "occ": occ_loss,
    "mat_reg": mat_reg_loss,
}


def compute_losses(loss_names, data_pr, data_gt, step, cfg):
    """Run the configured losses; returns the merged log dict."""
    log = {}
    for name in loss_names:
        log.update(name2loss[name](data_pr, data_gt, step, cfg))
    return log


def total_loss(log: dict) -> jnp.ndarray:
    """Sum of means of every 'loss*' key (reference trainer.py:134-137)."""
    total = jnp.zeros(())
    for k, v in log.items():
        if k.startswith("loss"):
            total = total + jnp.mean(v)
    return total
