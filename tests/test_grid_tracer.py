"""SDF-grid sphere-trace backend (CPU-sized)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nero_tpu.geometry.grid_tracer import GridTracer
from nero_tpu.geometry.isosurface import extract_geometry
from nero_tpu.geometry.native import mesh_sdf_grid, bvh_build


@pytest.fixture(scope="module")
def tracer():
    verts, tris = extract_geometry(
        [-1, -1, -1], [1, 1, 1], 40, 0.0,
        lambda p: jnp.linalg.norm(p, axis=-1, keepdims=True) - 0.5)
    return GridTracer(verts, tris, res=96)


def test_sdf_grid_values():
    verts, tris = extract_geometry(
        [-1, -1, -1], [1, 1, 1], 40, 0.0,
        lambda p: jnp.linalg.norm(p, axis=-1, keepdims=True) - 0.5)
    bvh = bvh_build(verts, tris)
    grid = mesh_sdf_grid(bvh, [-0.7, -0.7, -0.7], [0.7, 0.7, 0.7], 48)
    lin = np.linspace(-0.7, 0.7, 48)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    expect = np.sqrt(x * x + y * y + z * z) - 0.5
    err = np.abs(grid - expect)
    assert np.median(err) < 0.02, np.median(err)
    # sign agreement away from the surface band
    band = np.abs(expect) > 0.05
    assert (np.sign(grid[band]) == np.sign(expect[band])).mean() > 0.995


def test_grid_trace_agreement(tracer):
    rng = np.random.RandomState(0)
    n = 1024
    p = rng.normal(size=(n, 3))
    p /= np.linalg.norm(p, axis=-1, keepdims=True)
    p = (p * 0.5).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = (p + d * 1e-5).astype(np.float32)
    _, nc, dc, hc = tracer.trace_cpu(o, d)
    _, ng, dg, hg = jax.tree_util.tree_map(
        np.asarray, tracer.trace(jnp.asarray(o), jnp.asarray(d)))
    assert (hg == hc).mean() > 0.9
    m = hc & hg & (dc > 0.1)  # exclude grazing near-tangent hits
    if m.sum() >= 5:
        assert np.median(np.abs(dg[:, 0][m] - dc[m])) < 0.03
        assert np.sum(ng[m] * nc[m], -1).mean() > 0.85
