"""SDF grid evaluation (device, chunked) + host iso-surface extraction.

Parity target: reference network/field.py:1090-1117 (`extract_fields` /
`extract_geometry`): evaluate the SDF over a dense grid (points outside the
unit sphere clamped to +1), extract the 0-level set, rescale vertices to the
bounding box. Grid evaluation runs on TPU in fixed-size jitted chunks; the
triangulation runs in C++ (csrc/nero_native.cpp, surface-nets dual
contouring standing in for marching cubes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from nero_tpu.geometry.native import isosurface


def extract_fields(bound_min, bound_max, resolution: int, query_fn,
                   outside_val: float = 1.0, chunk: int = 262144) -> np.ndarray:
    """Evaluate query_fn([...,3]->[...]) over a resolution^3 grid; returns np grid."""
    bound_min = np.asarray(bound_min, np.float32)
    bound_max = np.asarray(bound_max, np.float32)
    xs = np.linspace(bound_min[0], bound_max[0], resolution, dtype=np.float32)
    ys = np.linspace(bound_min[1], bound_max[1], resolution, dtype=np.float32)
    zs = np.linspace(bound_min[2], bound_max[2], resolution, dtype=np.float32)

    @jax.jit
    def eval_chunk(pts):
        val = query_fn(pts)[..., 0] if query_fn(pts).ndim > 1 else query_fn(pts)
        outside = jnp.linalg.norm(pts, axis=-1) >= 1.0
        return jnp.where(outside, outside_val, val)

    total = resolution ** 3
    u = np.empty((total,), np.float32)
    # build grid points lazily per chunk to avoid a 512^3 x3 host allocation
    yz = resolution * resolution
    for start in range(0, total, chunk):
        end = min(start + chunk, total)
        idx = np.arange(start, end)
        xi = idx // yz
        yi = (idx % yz) // resolution
        zi = idx % resolution
        pts = np.stack([xs[xi], ys[yi], zs[zi]], -1)
        n = len(pts)
        if n < chunk:  # pad to the fixed jit shape
            pts = np.concatenate([pts, np.zeros((chunk - n, 3), np.float32)], 0)
        vals = np.asarray(eval_chunk(jnp.asarray(pts)))[:n]
        u[start:end] = vals
    return u.reshape(resolution, resolution, resolution)


def extract_geometry(bound_min, bound_max, resolution: int, threshold: float,
                     query_fn, outside_val: float = 1.0,
                     method: str = "surface_nets"):
    """Full pipeline: grid eval -> iso-surface -> rescale to bbox.

    method: 'surface_nets' (cell-centred vertices, smoother) or
    'marching_tets' (exact edge-interpolated vertices, mcubes-family — the
    reference's pymcubes counterpart, reference network/field.py:1112).
    Returns (vertices [V,3] f32 world coords, triangles [T,3] i32)."""
    u = extract_fields(bound_min, bound_max, resolution, query_fn, outside_val)
    if method == "marching_tets":
        from nero_tpu.geometry.native import isosurface_mt
        vertices, triangles = isosurface_mt(u, threshold)
    else:
        vertices, triangles = isosurface(u, threshold)
    bound_min = np.asarray(bound_min, np.float32)
    bound_max = np.asarray(bound_max, np.float32)
    vertices = vertices / (resolution - 1.0) * (bound_max - bound_min)[None, :] \
        + bound_min[None, :]
    return vertices.astype(np.float32), triangles
