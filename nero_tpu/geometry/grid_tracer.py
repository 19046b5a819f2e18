"""Sphere-traced visibility on a signed-distance grid — the TPU-fast tracer.

The Stage-II hot path traces 512x768 rays per training step. Pointer-chasing
BVH traversal is hostile to the TPU memory system (measured ~0.07 Mrays/s via
the XLA wavefront in geometry/bvh_jax.py); sphere tracing a dense SDF grid is
its TPU-native replacement: a FIXED number of iterations, each a trilinear
gather + pure VPU math, identical for every ray — no divergence, no stacks.

The grid is baked once from the Stage-I mesh by the C++ runtime
(csrc/nero_native.cpp::mesh_sdf_grid: BVH closest-triangle distance + ray
crossing-parity sign). Surface normals come from the grid gradient. This is
also principled for NeRO semantics: Stage I itself supervises occlusion with
SDF ray marching (reference network/field.py:454-484), and the light MLPs
queried at hit points are smooth — sub-voxel hit error is immaterial.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nero_tpu.geometry.bvh_jax import RayTracer
from nero_tpu.geometry.native import mesh_sdf_grid


def _trilerp(grid_flat: jnp.ndarray, res: int, pts01: jnp.ndarray) -> jnp.ndarray:
    """Trilinear sample of an x-major [res^3] grid at normalized coords [R,3]."""
    g = pts01 * (res - 1)
    g0 = jnp.clip(jnp.floor(g), 0, res - 2)
    f = g - g0
    xi = g0[:, 0].astype(jnp.int32)
    yi = g0[:, 1].astype(jnp.int32)
    zi = g0[:, 2].astype(jnp.int32)
    fx, fy, fz = f[:, 0], f[:, 1], f[:, 2]

    def at(dx, dy, dz):
        idx = ((xi + dx) * res + (yi + dy)) * res + (zi + dz)
        return grid_flat[idx]

    c00 = at(0, 0, 0) * (1 - fz) + at(0, 0, 1) * fz
    c01 = at(0, 1, 0) * (1 - fz) + at(0, 1, 1) * fz
    c10 = at(1, 0, 0) * (1 - fz) + at(1, 0, 1) * fz
    c11 = at(1, 1, 0) * (1 - fz) + at(1, 1, 1) * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fx) + c1 * fx


@partial(jax.jit, static_argnames=("res", "n_steps"))
def grid_sphere_trace(grid_flat, bmin, inv_extent, res: int, rays_o, rays_d,
                      far=10.0, n_steps: int = 64, t0: float = 0.015,
                      hit_thresh: float = 2e-3):
    """Sphere trace rays against the SDF grid.

    Returns (t [R], normal [R,3] INWARD (-grad, matching the BVH tracer's
    winding convention so callers' NeuS flip yields outward), hit [R]).
    """
    r = rays_o.shape[0]

    def sample(pts):
        pts01 = jnp.clip((pts - bmin) * inv_extent, 0.0, 1.0)
        d = _trilerp(grid_flat, res, pts01)
        # outside the grid box: distance to box keeps the march moving
        box_lo = (bmin - pts) * 1.0
        box_hi = pts - (bmin + 1.0 / inv_extent)
        out_d = jnp.maximum(jnp.max(box_lo, axis=-1), jnp.max(box_hi, axis=-1))
        return jnp.where(out_d > 0, jnp.maximum(d, out_d), d)

    min_step = 0.5 / (res * jnp.max(inv_extent))  # half-voxel floor

    def body(i, state):
        t, done_t = state
        pts = rays_o + rays_d * t[:, None]
        d = sample(pts)
        hit_now = d < hit_thresh
        done_t = jnp.where((done_t < 0) & hit_now, t, done_t)
        step = jnp.maximum(d, min_step)
        t = jnp.where(done_t < 0, jnp.minimum(t + step, far), t)
        return t, done_t

    t_init = jnp.full((r,), t0, rays_o.dtype)
    done_init = jnp.full((r,), -1.0, rays_o.dtype)
    t, done_t = jax.lax.fori_loop(0, n_steps, body, (t_init, done_init))
    hit = done_t >= 0
    t_hit = jnp.where(hit, done_t, far)

    # one Newton refinement (|grad sdf| ~ 1) + gradient normal at the hit
    pts = rays_o + rays_d * t_hit[:, None]
    d = sample(pts)
    t_hit = jnp.where(hit, jnp.maximum(t_hit + d, 0.0), far)
    pts = rays_o + rays_d * t_hit[:, None]
    eps = 1.0 / (res * jnp.max(inv_extent))
    grad = jnp.stack([
        sample(pts + jnp.asarray([eps, 0, 0])) - sample(pts - jnp.asarray([eps, 0, 0])),
        sample(pts + jnp.asarray([0, eps, 0])) - sample(pts - jnp.asarray([0, eps, 0])),
        sample(pts + jnp.asarray([0, 0, eps])) - sample(pts - jnp.asarray([0, 0, eps])),
    ], axis=-1)
    gn = jnp.linalg.norm(grad, axis=-1, keepdims=True)
    normal = jnp.where(hit[:, None], -grad / jnp.maximum(gn, 1e-9), 0.0)
    return t_hit, normal, hit


class GridTracer:
    """RayTracer-compatible tracer backed by a baked SDF grid.

    trace(rays_o, rays_d) -> (inters, normals, depth [R,1], hit); miss =>
    depth == far. Also owns the exact BVH (host CPU trace for precompute)."""

    def __init__(self, vertices: np.ndarray, triangles: np.ndarray,
                 res: int = 256, far: float = 10.0, margin: float = 0.03,
                 n_steps: int = 64):
        self.far = far
        self.res = res
        self.n_steps = n_steps
        self._bvh_tracer = RayTracer(vertices, triangles, far=far)
        bmin = vertices.min(0) - margin
        bmax = vertices.max(0) + margin
        grid = mesh_sdf_grid(self._bvh_tracer._bvh_np, bmin, bmax, res)
        self.grid_flat = jnp.asarray(grid.reshape(-1))
        self.bmin = jnp.asarray(bmin)
        self.inv_extent = jnp.asarray(1.0 / (bmax - bmin))

    def trace_fn(self):
        grid_flat, bmin, inv_extent = self.grid_flat, self.bmin, self.inv_extent
        res, far, n_steps = self.res, self.far, self.n_steps

        def fn(rays_o, rays_d):
            t, normal, hit = grid_sphere_trace(grid_flat, bmin, inv_extent, res,
                                               rays_o, rays_d, far, n_steps)
            inters = rays_o + rays_d * t[:, None]
            return inters, normal, t[:, None], hit
        return fn

    def trace(self, rays_o, rays_d):
        return self.trace_fn()(rays_o, rays_d)

    def trace_cpu(self, rays_o, rays_d):
        """Exact mesh trace on host (used for the one-time pixel precompute)."""
        return self._bvh_tracer.trace_cpu(rays_o, rays_d)
