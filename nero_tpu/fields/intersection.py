"""Sphere-bounded SDF ray march for occlusion probability estimation.

Parity target: reference network/field.py:432-484 (`get_weights`,
`get_intersection`): a 2-pass importance march along reflection rays that
estimates, per ray, the probability mass of hitting the SDF surface before
leaving the unit sphere. The reference uses dynamic boolean indexing over
"inside" points; here everything is fixed-shape and masked (outside rays
produce zero weights / -1 sdf), so the whole march jit-compiles to static
TPU kernels. Gradients are stopped — the march only produces supervision
targets.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from nero_tpu.ops.sample_pdf import sample_pdf
from nero_tpu.utils.sphere import get_sphere_intersection


def get_weights(sdf_fun, inv_s, z_vals, origins, dirs):
    """NeuS alpha/weights from SDF section estimates along given z samples.

    Args:
      sdf_fun: points [..., 3] -> sdf [..., 1].
      inv_s: scalar (or broadcastable) NeuS sharpness.
      z_vals: [P, S]; origins, dirs: [P, 3].

    Returns (weights [P, S-1], mid_sdf [P, S-1]; non-surface sections get -1).
    """
    points = origins[:, None, :] + dirs[:, None, :] * z_vals[..., None]
    sdf = sdf_fun(points)[..., 0]  # [P, S]

    prev_sdf, next_sdf = sdf[:, :-1], sdf[:, 1:]
    prev_z, next_z = z_vals[:, :-1], z_vals[:, 1:]
    mid_sdf = (prev_sdf + next_sdf) * 0.5
    cos_val = (next_sdf - prev_sdf) / (next_z - prev_z + 1e-5)
    surface_mask = cos_val < 0
    cos_val = jnp.minimum(cos_val, 0.0)

    dist = next_z - prev_z
    prev_esti = mid_sdf - cos_val * dist * 0.5
    next_esti = mid_sdf + cos_val * dist * 0.5
    prev_cdf = jax.nn.sigmoid(prev_esti * inv_s)
    next_cdf = jax.nn.sigmoid(next_esti * inv_s)
    alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5) * surface_mask.astype(sdf.dtype)

    trans = jnp.cumprod(jnp.concatenate(
        [jnp.ones_like(alpha[:, :1]), 1.0 - alpha + 1e-7], axis=-1), axis=-1)[:, :-1]
    weights = alpha * trans
    mid_sdf = jnp.where(surface_mask, mid_sdf, -1.0)
    return weights, mid_sdf


def get_intersection(sdf_fun, inv_s, pts, dirs, sn0: int = 128, sn1: int = 9):
    """2-pass importance march from surface points along (reflection) dirs.

    Args: pts, dirs [P, 3]. Returns (hit_z_vals, hit_weights, hit_sdf), each
    [P, sn1-1]; rows whose origin is outside the 0.999-sphere are zeroed
    (weights) / set to -1 (sdf), matching the reference's inside_mask path.
    All outputs are stop_gradient'ed.
    """
    inside = jnp.linalg.norm(pts, axis=-1) < 0.999
    safe_pts = jnp.where(inside[:, None], pts, jnp.zeros_like(pts))

    max_dist = get_sphere_intersection(safe_pts, dirs)  # [P,1]
    z0 = jnp.linspace(0.0, 1.0, sn0, dtype=pts.dtype)
    z_vals = max_dist * z0[None, :]
    weights, _ = get_weights(sdf_fun, inv_s, z_vals, safe_pts, dirs)
    z_new = sample_pdf(z_vals, weights, sn1, key=None)  # deterministic
    weights, mid_sdf = get_weights(sdf_fun, inv_s, z_new, safe_pts, dirs)
    z_mid = (z_new[:, 1:] + z_new[:, :-1]) * 0.5

    insf = inside[:, None]
    hit_z = jnp.where(insf, z_mid, 0.0)
    hit_w = jnp.where(insf, weights, 0.0)
    hit_sdf = jnp.where(insf, mid_sdf, -1.0)
    return (jax.lax.stop_gradient(hit_z),
            jax.lax.stop_gradient(hit_w),
            jax.lax.stop_gradient(hit_sdf))
