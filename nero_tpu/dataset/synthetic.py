"""Procedural analytic test scene (no external data needed).

Renders a small multi-view dataset of a shiny sphere-like object inside the
unit sphere with an analytic environment — exact depth and geometry are
known, so integration tests and benchmarks can run end-to-end without the
GlossySynthetic download. Not present in the reference; this fills the role
of its packaged datasets for CI.
"""
from __future__ import annotations

import numpy as np

from nero_tpu.utils.pose import look_at_pose


def _env_color(d: np.ndarray) -> np.ndarray:
    """Smooth directional environment light (linear RGB)."""
    r = 0.5 + 0.5 * np.sin(3.0 * d[..., 0]) * np.cos(2.0 * d[..., 1])
    g = 0.5 + 0.4 * d[..., 2]
    b = 0.5 + 0.5 * np.cos(2.5 * d[..., 0] + 1.0)
    return np.clip(np.stack([r, g, b], -1), 0.0, 1.0)


def _sphere_hit(o: np.ndarray, d: np.ndarray, radius: float):
    """Ray/sphere intersection; returns (t, hit_mask)."""
    b = np.sum(o * d, -1)
    c = np.sum(o * o, -1) - radius ** 2
    disc = b * b - c
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0.0))
    hit = hit & (t > 0)
    return t, hit


def render_view(pose: np.ndarray, K: np.ndarray, h: int, w: int, radius: float = 0.5):
    """Analytic render: lambertian+specular sphere on an env background.

    Returns (rgb uint8 [h,w,3], depth float32 [h,w], mask bool [h,w]).
    """
    xs, ys = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
    pix = np.stack([xs, ys, np.ones_like(xs)], -1).reshape(-1, 3)
    K_inv = np.linalg.inv(K)
    d_cam = pix @ K_inv.T
    d_cam_norm = np.linalg.norm(d_cam, axis=-1)
    R = pose[:, :3]
    t = pose[:, 3]
    d = d_cam @ R  # R^T d
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(-R.T @ t, d.shape)

    t_hit, hit = _sphere_hit(o, d, radius)
    p = o + d * t_hit[:, None]
    n = p / np.maximum(np.linalg.norm(p, axis=-1, keepdims=True), 1e-9)

    # bumpy albedo so the SDF has texture signal to latch onto
    albedo = 0.35 + 0.3 * np.stack([
        np.sin(7 * p[:, 0]) * np.sin(5 * p[:, 1]),
        np.sin(6 * p[:, 1] + 1.0),
        np.cos(8 * p[:, 2]),
    ], -1)

    light_dir = np.asarray([0.4, 0.3, 0.85])
    light_dir = light_dir / np.linalg.norm(light_dir)
    lambert = np.clip(np.sum(n * light_dir, -1, keepdims=True), 0, 1)
    refl = d - 2 * np.sum(d * n, -1, keepdims=True) * n
    spec_env = _env_color(refl)
    nov = np.clip(-np.sum(d * n, -1, keepdims=True), 0, 1)
    fresnel = 0.04 + 0.96 * (1 - nov) ** 5
    color_obj = albedo * (0.25 + 0.75 * lambert) + 0.6 * fresnel * spec_env

    color_bg = _env_color(d)
    rgb = np.where(hit[:, None], color_obj, color_bg)
    rgb = np.clip(rgb, 0, 1) ** (1 / 2.2)  # simple gamma for display range

    # store pinhole z-depth (t is a distance along the unit ray; camera-space
    # unit-ray z equals 1/||K^-1 p||) so mask_depth_to_pts backprojects exactly
    depth = np.where(hit, t_hit / d_cam_norm, 15.0).astype(np.float32)
    img = (np.clip(rgb, 0, 1) * 255 + 0.5).astype(np.uint8)
    return img.reshape(h, w, 3), depth.reshape(h, w), hit.reshape(h, w)


def make_cameras(n_views: int, h: int, w: int, dist: float = 3.0, seed: int = 0):
    """Ring + elevation jitter cameras looking at the origin."""
    rng = np.random.RandomState(seed)
    Ks, poses = [], []
    f = 1.1 * max(h, w)
    K = np.asarray([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    for i in range(n_views):
        az = 2 * np.pi * i / n_views
        el = 0.25 + 0.5 * rng.rand()
        eye = dist * np.asarray([np.cos(az) * np.cos(el),
                                 np.sin(az) * np.cos(el),
                                 np.sin(el)])
        poses.append(look_at_pose(eye, np.zeros(3)))
        Ks.append(K.copy())
    return np.stack(Ks), np.stack(poses)
