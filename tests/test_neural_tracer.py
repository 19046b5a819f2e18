"""Neural visibility tracer: distillation + marching accuracy (CPU-sized)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nero_tpu.geometry.isosurface import extract_geometry
from nero_tpu.geometry.neural_tracer import NeuralTracer


@pytest.fixture(scope="module")
def tracer():
    verts, tris = extract_geometry(
        [-1, -1, -1], [1, 1, 1], 48, 0.0,
        lambda p: jnp.linalg.norm(p, axis=-1, keepdims=True) - 0.5)
    return NeuralTracer(verts, tris, distill_steps=600, verbose=False)


def test_distillation_quality(tracer):
    assert tracer.distill_rms < 0.01, tracer.distill_rms


def test_trace_agreement_with_exact(tracer):
    rng = np.random.RandomState(0)
    n = 2048
    # surface-origin rays (the Stage-II pattern)
    p = rng.normal(size=(n, 3))
    p /= np.linalg.norm(p, axis=-1, keepdims=True)
    p = (p * 0.5).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = (p + d * 1e-5).astype(np.float32)

    _, nc, dc, hc = tracer.trace_cpu(o, d)
    ig, ng, dg, hg = jax.tree_util.tree_map(
        np.asarray, tracer.trace(jnp.asarray(o), jnp.asarray(d)))
    agree = (hg == hc).mean()
    assert agree > 0.93, agree
    m = hc & hg & (dc > 0.05)
    if m.any():
        assert np.abs(dg[:, 0][m] - dc[m]).mean() < 0.02
        # inward normals (match the BVH winding convention)
        dots = np.sum(ng[m] * nc[m], -1)
        assert dots.mean() > 0.9


def test_miss_semantics(tracer):
    # rays pointing straight away from the sphere must miss with depth == far
    o = np.asarray([[0.0, 0.0, 0.52]], np.float32)
    d = np.asarray([[0.0, 0.0, 1.0]], np.float32)
    _, normal, depth, hit = jax.tree_util.tree_map(
        np.asarray, tracer.trace(jnp.asarray(o), jnp.asarray(d)))
    assert not hit[0]
    assert depth[0, 0] == tracer.far
    assert (normal[0] == 0).all()
