"""Geometry stack tests: iso-surface, BVH build/trace (C++ and XLA), rasterizer."""
import jax.numpy as jnp
import numpy as np
import pytest

from nero_tpu.geometry.bvh_jax import RayTracer, bvh_trace
from nero_tpu.geometry.isosurface import extract_geometry
from nero_tpu.geometry.mesh_io import compute_vertex_normals, read_ply, write_ply
from nero_tpu.geometry.native import (bvh_build, bvh_trace_cpu, isosurface,
                                      rasterize_depth, rasterize_uv)


def _sphere_grid(res=48, radius=0.5):
    lin = np.linspace(-1, 1, res, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    return np.sqrt(x * x + y * y + z * z) - radius


def _icosphere_mesh(res=48, radius=0.5):
    grid = _sphere_grid(res, radius)
    verts, tris = isosurface(grid, 0.0)
    verts = verts / (res - 1.0) * 2.0 - 1.0
    return verts.astype(np.float32), tris


def test_isosurface_sphere():
    verts, tris = _icosphere_mesh()
    assert len(verts) > 100 and len(tris) > 100
    r = np.linalg.norm(verts, axis=-1)
    np.testing.assert_allclose(r.mean(), 0.5, atol=0.02)
    assert np.abs(r - 0.5).max() < 0.06
    # watertight-ish: every vertex used, valid indices
    assert tris.min() >= 0 and tris.max() < len(verts)
    # consistent outward orientation (for an SDF that is negative inside)
    v0, v1, v2 = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
    fn = np.cross(v1 - v0, v2 - v0)
    centers = (v0 + v1 + v2) / 3
    outward = np.sum(fn * centers, -1) > 0
    frac = outward.mean()
    assert frac > 0.99 or frac < 0.01, f"inconsistent orientation {frac}"


def test_marching_tets_sphere():
    """MT extractor: exact edge vertices, watertight, surface-nets winding."""
    from nero_tpu.geometry.native import isosurface_mt
    res = 48
    grid = _sphere_grid(res, 0.5)
    verts, tris = isosurface_mt(grid, 0.0)
    verts = verts / (res - 1.0) * 2.0 - 1.0
    r = np.linalg.norm(verts, axis=-1)
    # edge-interpolated vertices sit ON the analytic level set
    assert np.abs(r - 0.5).mean() < 2e-3
    # watertight: every edge shared by exactly two triangles
    edges = {}
    for tri in tris:
        for a, b in [(tri[0], tri[1]), (tri[1], tri[2]), (tri[2], tri[0])]:
            k = (min(a, b), max(a, b))
            edges[k] = edges.get(k, 0) + 1
    assert all(c == 2 for c in edges.values())
    # same winding convention as isosurface(): signed volume negative
    v0, v1, v2 = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
    vol = np.sum(np.einsum("ij,ij->i", v0, np.cross(v1, v2))) / 6.0
    sn_verts, sn_tris = isosurface(grid, 0.0)
    sn_verts = sn_verts / (res - 1.0) * 2.0 - 1.0
    s0, s1, s2 = sn_verts[sn_tris[:, 0]], sn_verts[sn_tris[:, 1]], sn_verts[sn_tris[:, 2]]
    sn_vol = np.sum(np.einsum("ij,ij->i", s0, np.cross(s1, s2))) / 6.0
    assert np.sign(vol) == np.sign(sn_vol)
    np.testing.assert_allclose(abs(vol), 4 / 3 * np.pi * 0.5 ** 3, rtol=0.02)


def test_extract_geometry_scaling():
    verts, tris = extract_geometry([-1, -1, -1], [1, 1, 1], 48, 0.0,
                                   lambda p: jnp.linalg.norm(p, axis=-1, keepdims=True) - 0.5)
    r = np.linalg.norm(verts, axis=-1)
    np.testing.assert_allclose(r.mean(), 0.5, atol=0.02)


def test_ply_roundtrip(tmp_path):
    verts, tris = _icosphere_mesh(24)
    normals = compute_vertex_normals(verts, tris)
    path = str(tmp_path / "m.ply")
    write_ply(path, verts, tris, vertex_normals=normals)
    data = read_ply(path)
    np.testing.assert_allclose(data["vertices"], verts, atol=1e-6)
    np.testing.assert_array_equal(data["triangles"], tris)
    np.testing.assert_allclose(data["normals"], normals, atol=1e-6)


def _brute_force_trace(verts, tris, o, d, far=10.0):
    v0 = verts[tris[:, 0]]
    e1 = verts[tris[:, 1]] - v0
    e2 = verts[tris[:, 2]] - v0
    best = np.full(len(o), far, np.float32)
    for i in range(len(o)):
        p = np.cross(d[i], e2)
        det = np.sum(e1 * p, -1)
        mask = np.abs(det) > 1e-12
        inv = np.where(mask, 1.0 / np.where(mask, det, 1.0), 0.0)
        tv = o[i] - v0
        u = np.sum(tv * p, -1) * inv
        q = np.cross(tv, e1)
        v = np.sum(d[i][None] * q, -1) * inv
        t = np.sum(e2 * q, -1) * inv
        ok = mask & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t > 1e-4)
        if ok.any():
            best[i] = t[ok].min()
    return best


@pytest.fixture(scope="module")
def sphere_mesh():
    return _icosphere_mesh(32)


def test_bvh_cpu_vs_bruteforce(sphere_mesh):
    verts, tris = sphere_mesh
    rng = np.random.RandomState(0)
    n = 64
    o = rng.uniform(-1, 1, (n, 3)).astype(np.float32) * 0.1 + np.asarray([0, 0, -2], np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    bvh = bvh_build(verts, tris)
    inters, normals, depth, hit = bvh_trace_cpu(bvh, o, d)
    ref_t = _brute_force_trace(verts, tris, o, d)
    np.testing.assert_allclose(depth, ref_t, atol=1e-4)
    assert (hit == (ref_t < 10.0)).all()
    # hit points on the sphere surface
    if hit.any():
        r = np.linalg.norm(inters[hit], axis=-1)
        assert np.abs(r - 0.5).max() < 0.06


def test_bvh_jax_matches_cpu(sphere_mesh):
    verts, tris = sphere_mesh
    rng = np.random.RandomState(1)
    n = 128
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = -2.0
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 0.5
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    tracer = RayTracer(verts, tris)
    inters_j, normals_j, depth_j, hit_j = tracer.trace(jnp.asarray(o), jnp.asarray(d))
    inters_c, normals_c, depth_c, hit_c = tracer.trace_cpu(o, d)
    np.testing.assert_array_equal(np.asarray(hit_j), hit_c)
    np.testing.assert_allclose(np.asarray(depth_j)[:, 0], depth_c, atol=1e-3)
    h = hit_c
    # geometric normals agree up to sign-free compare (same winding → same sign)
    dots = np.sum(np.asarray(normals_j)[h] * normals_c[h], -1)
    assert dots.min() > 0.99


def test_rasterize_depth_sphere(sphere_mesh):
    verts, tris = sphere_mesh
    # camera at z=-2 looking +z
    cam_verts = verts.copy()
    cam_verts[:, 2] += 2.0
    K = np.asarray([[64, 0, 32], [0, 64, 32], [0, 0, 1]], np.float32)
    depth = rasterize_depth(cam_verts, tris, K, 64, 64)
    center_d = depth[32, 32]
    assert abs(center_d - 1.5) < 0.05  # front of sphere at z = 2-0.5
    assert depth[0, 0] == 0.0  # background empty


def test_rasterize_uv():
    uv = np.asarray([[0.1, 0.1], [0.9, 0.1], [0.1, 0.9]], np.float32)
    tris = np.asarray([[0, 1, 2]], np.int32)
    attrs = np.asarray([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]], np.float32)
    img, mask = rasterize_uv(uv, tris, attrs, 32, 32)
    assert mask.sum() > 100
    inside = img[mask]
    np.testing.assert_allclose(inside.sum(-1), 1.0, atol=1e-5)  # barycentric partition
