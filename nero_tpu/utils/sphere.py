"""Sphere sampling and ray/sphere geometry helpers (pure functions).

Parity targets: reference utils/base_utils.py:800-819 (Fibonacci sphere
sampling, az/el -> xyz) and network/field.py:380-396 (unit-sphere offset
and ray/unit-sphere intersection).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def sample_sphere(num_samples: int, begin_elevation: float = 0.0):
    """Fibonacci-spiral sphere sampling; returns (azimuths, elevations) np arrays."""
    ratio = (begin_elevation + 90.0) / 180.0
    num_points = int(num_samples // (1 - ratio))
    phi = (np.sqrt(5.0) - 1.0) / 2.0
    n = np.arange(num_points - num_samples, num_points, dtype=np.float64)
    z = 2.0 * n / num_points - 1.0
    azimuths = (2.0 * np.pi * n * phi) % (2.0 * np.pi)
    elevations = np.arcsin(z)
    return azimuths, elevations


def az_el_to_points(azimuths, elevations):
    """Azimuth/elevation -> unit xyz (z = up)."""
    z = np.sin(elevations)
    x = np.cos(azimuths) * np.cos(elevations)
    y = np.sin(azimuths) * np.cos(elevations)
    return np.stack([x, y, z], -1)


def offset_points_to_sphere(points: jnp.ndarray, radius: float = 0.999) -> jnp.ndarray:
    """Pull points with |p| > radius back onto the sphere of that radius."""
    norm = jnp.linalg.norm(points, axis=-1, keepdims=True)
    scaled = points / jnp.maximum(norm, 1e-12) * radius
    return jnp.where(norm > radius, scaled, points)


def get_sphere_intersection(pts: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Distance along `dirs` from inside point `pts` to the unit sphere. [..., 1]"""
    dtx = jnp.sum(pts * dirs, axis=-1, keepdims=True)
    xtx = jnp.sum(pts ** 2, axis=-1, keepdims=True)
    dist = dtx ** 2 - xtx + 1.0
    # Callers guarantee |pts| < 1 so dist >= 0; clamp for safety under masking.
    return -dtx + jnp.sqrt(jnp.maximum(dist, 0.0) + 1e-6)


def near_far_from_sphere(rays_o: jnp.ndarray, rays_d: jnp.ndarray):
    """NeuS-style near/far: the +-1 band around the closest approach to origin."""
    a = jnp.sum(rays_d ** 2, axis=-1, keepdims=True)
    b = 2.0 * jnp.sum(rays_o * rays_d, axis=-1, keepdims=True)
    mid = 0.5 * (-b) / a
    near = jnp.maximum(mid - 1.0, 1e-3)
    far = mid + 1.0
    return near, far
