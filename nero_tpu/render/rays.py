"""Ray generation from camera intrinsics/poses — all on-device.

TPU-native data path: instead of materialising a flattened, shuffled buffer
of every ray of every image on the host (reference renderer.py:167-187,
319-330), we keep images + K^-1 + poses as device arrays and generate each
step's rays *inside jit* from sampled (image, pixel) indices. The per-step
host->device transfer disappears entirely.

Conventions match the reference: pixel centres at (x+0.5, y+0.5), w2c poses
[R|t] with camera centre -R^T t, ray dir = normalize(R^T K^-1 [x,y,1]).
Parity: reference renderer.py:167-187 (_construct_ray_batch),
renderer.py:258-272 (_process_ray_batch), renderer.py:240-256
(get_human_coordinate_poses).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from nero_tpu.utils.sphere import near_far_from_sphere


def camera_centers(poses: jnp.ndarray) -> jnp.ndarray:
    """[N,3,4] w2c poses -> [N,3] camera centres in world coords."""
    R = poses[..., :3, :3]
    t = poses[..., :3, 3]
    return -jnp.einsum("...ji,...j->...i", R, t)


def pixel_dirs_cam(coords_xy: jnp.ndarray, K_inv: jnp.ndarray) -> jnp.ndarray:
    """coords_xy [...,2] pixel coords (already +0.5-centred), K_inv [...,3,3] -> cam dirs."""
    ones = jnp.ones_like(coords_xy[..., :1])
    homo = jnp.concatenate([coords_xy, ones], axis=-1)
    return jnp.einsum("...ij,...j->...i", K_inv, homo)


def rays_from_pixels(coords_xy: jnp.ndarray, K_inv: jnp.ndarray, poses: jnp.ndarray):
    """Build world-space rays. coords_xy [...,2], K_inv/poses broadcastable [...,3,3]/[...,3,4].

    Returns rays_o, rays_d (normalized), near, far.
    """
    d_cam = pixel_dirs_cam(coords_xy, K_inv)
    R = poses[..., :3, :3]
    t = poses[..., :3, 3]
    rays_d = jnp.einsum("...ji,...j->...i", R, d_cam)  # R^T d
    rays_d = rays_d / jnp.maximum(jnp.linalg.norm(rays_d, axis=-1, keepdims=True), 1e-12)
    rays_o = -jnp.einsum("...ji,...j->...i", R, t)
    rays_o = jnp.broadcast_to(rays_o, rays_d.shape)
    near, far = near_far_from_sphere(rays_o, rays_d)
    return rays_o, rays_d, near, far


def human_coordinate_poses(poses: jnp.ndarray, fixed_camera: bool = False) -> jnp.ndarray:
    """Per-camera 'human' frame: z-flattened camera frame used by human light.

    [N,3,4] -> [N,3,4]. X/Y/Z rows: Y = world -z, Z = flattened camera z-axis.
    """
    cam_cen = camera_centers(poses)
    if not fixed_camera:
        cam_cen = cam_cen.at[..., 2].set(0.0)
    n = poses.shape[0]
    Y = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0], poses.dtype), (n, 3))
    Z = poses[:, 2, :3]
    Z = Z.at[:, 2].set(0.0)
    Z = Z / jnp.maximum(jnp.linalg.norm(Z, axis=-1, keepdims=True), 1e-12)
    X = jnp.cross(Y, Z)
    R = jnp.stack([X, Y, Z], axis=1)
    t = -jnp.einsum("nij,nj->ni", R, cam_cen)
    return jnp.concatenate([R, t[:, :, None]], axis=-1)


def sample_ray_batch(key, imgs_u8: jnp.ndarray, K_inv: jnp.ndarray, poses: jnp.ndarray,
                     human_poses: jnp.ndarray, batch: int):
    """Sample a uniform random ray batch across all images, fully on device.

    imgs_u8 [N,H,W,3] uint8; K_inv [N,3,3]; poses [N,3,4]; human_poses [N,3,4].
    Returns dict with rays_o/rays_d/near/far/rgb/human_poses, shapes [batch, ...].
    """
    n, h, w, _ = imgs_u8.shape
    idx = jax.random.randint(key, (batch,), 0, n * h * w)
    img_i = idx // (h * w)
    pix = idx % (h * w)
    py = pix // w
    px = pix % w
    coords = jnp.stack([px.astype(jnp.float32) + 0.5, py.astype(jnp.float32) + 0.5], axis=-1)
    rgb = imgs_u8[img_i, py, px].astype(jnp.float32) / 255.0
    rays_o, rays_d, near, far = rays_from_pixels(coords, K_inv[img_i], poses[img_i])
    return {
        "rays_o": rays_o, "rays_d": rays_d, "near": near, "far": far,
        "rgb": rgb, "human_poses": human_poses[img_i],
    }
