"""Neural visibility tracer: distillation + marching accuracy (CPU-sized)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nero_tpu.geometry.isosurface import extract_geometry
from nero_tpu.geometry.neural_tracer import NeuralTracer


@pytest.fixture(scope="module")
def tracer():
    """Sphere tracer with a PERSISTENT distill cache (tests/.tracer_cache,
    like the XLA compile cache): first run distills (~50 s on 1 CPU), warm
    runs load in ~2 s. Cache-keying correctness (mesh hash + hyperparams) is
    separately covered by test_distill_cache_roundtrip."""
    import os
    verts, tris = extract_geometry(
        [-1, -1, -1], [1, 1, 1], 48, 0.0,
        lambda p: jnp.linalg.norm(p, axis=-1, keepdims=True) - 0.5)
    old = NeuralTracer.CACHE_DIR
    NeuralTracer.CACHE_DIR = os.path.join(os.path.dirname(__file__),
                                          ".tracer_cache")
    try:
        return NeuralTracer(verts, tris, distill_steps=300,
                            distill_samples=120_000, distill_batch=16384,
                            verbose=False)
    finally:
        NeuralTracer.CACHE_DIR = old


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


@pytest.fixture(scope="module")
def bowl_mesh():
    """Concave, multi-component mesh (bowl shell + inner ball)."""
    from nero_tpu.dataset.synthetic import scene_sdf
    import nero_tpu.geometry.native as native
    sdf = scene_sdf("bowl")
    grid = 56
    xs = np.linspace(-0.55, 0.55, grid).astype(np.float32)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    vals = sdf(np.stack([X, Y, Z], -1).reshape(-1, 3)) \
        .reshape(grid, grid, grid).astype(np.float32)
    verts, tris = native.isosurface(vals, 0.0)
    verts = (verts / (grid - 1.0) * 1.1 - 0.55).astype(np.float32)
    return verts, tris


@pytest.mark.slow
def test_concave_multicomponent_agreement(bowl_mesh, tmp_path, monkeypatch):
    """Neural tracer vs exact BVH on concave geometry with self-occlusion.

    The shading-relevant population: rays from surface points that clear the
    local surface (exact depth > 0.05 or miss) — inward self-hits are zeroed
    by near_mask in get_lights. Bar: >= 0.98 hit agreement (VERDICT r1 #5a)."""
    verts, tris = bowl_mesh
    monkeypatch.setattr(NeuralTracer, "CACHE_DIR", str(tmp_path))
    tracer = NeuralTracer(verts, tris, distill_steps=600,
                          distill_samples=200_000, distill_batch=16384,
                          verbose=False)
    assert tracer.distill_rms < 0.004, tracer.distill_rms

    rng = np.random.RandomState(0)
    n = 8192
    ti = rng.randint(0, len(tris), n)
    u, v = rng.rand(n, 1), rng.rand(n, 1)
    flip = (u + v) > 1
    u = np.where(flip, 1 - u, u)
    v = np.where(flip, 1 - v, v)
    p = (verts[tris[ti, 0]] + u * (verts[tris[ti, 1]] - verts[tris[ti, 0]])
         + v * (verts[tris[ti, 2]] - verts[tris[ti, 0]]))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = (p + d * 1e-3).astype(np.float32)

    _, nc, dc, hc = tracer.trace_cpu(o, d)
    _, ng, dg, hg = jax.tree_util.tree_map(
        np.asarray, tracer.trace(jnp.asarray(o), jnp.asarray(d)))

    # concavity sanity: a meaningful share of surface-origin rays re-hit the
    # scene (self-occlusion) — impossible on a convex shape
    assert hc.mean() > 0.3

    clear = (~hc) | (dc > 0.05)
    agree = (hg == hc)[clear].mean()
    assert agree >= 0.98, f"clearing-ray hit agreement {agree}"
    both = clear & hc & hg & (dg[:, 0] > 0.05)
    assert np.abs(dg[:, 0][both] - dc[both]).mean() < 0.01
    assert np.sum(ng[both] * nc[both], -1).mean() > 0.95


@pytest.mark.slow
def test_thin_tube_torus_agreement_or_fallback(tmp_path, monkeypatch):
    """Stress: thin-tube high-genus mesh (the 'mirror' scene torus, tube
    radius 0.055 ~ 4 voxels of the distill field) — the family real scenes
    like the reference's angel/horse produce (VERDICT r2 #9; ref contract
    raytracing/raytracer.py:21-49).

    Contract under test: EITHER the distilled field is accurate enough
    (RMS <= the material model's tracer_rms_fallback=0.004, and then the
    0.98 clearing-ray agreement bar must hold), OR the RMS tripwire fires —
    i.e. the silent-failure window (bad field + quiet tripwire) is empty."""
    from nero_tpu.dataset.synthetic import scene_sdf
    import nero_tpu.geometry.native as native
    sdf = scene_sdf("mirror")
    grid = 72
    xs = np.linspace(-0.52, 0.52, grid).astype(np.float32)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    vals = sdf(np.stack([X, Y, Z], -1).reshape(-1, 3)) \
        .reshape(grid, grid, grid).astype(np.float32)
    verts, tris = native.isosurface(vals, 0.0)
    verts = (verts / (grid - 1.0) * 1.04 - 0.52).astype(np.float32)

    monkeypatch.setattr(NeuralTracer, "CACHE_DIR", str(tmp_path))
    tracer = NeuralTracer(verts, tris, distill_steps=600,
                          distill_samples=200_000, distill_batch=16384,
                          verbose=False)
    FALLBACK_RMS = 0.004  # models/material.py tracer_rms_fallback
    if tracer.distill_rms > FALLBACK_RMS:
        return  # tripwire fires -> material model switches to the grid tracer

    rng = np.random.RandomState(0)
    n = 8192
    ti = rng.randint(0, len(tris), n)
    u, v = rng.rand(n, 1), rng.rand(n, 1)
    flip = (u + v) > 1
    u = np.where(flip, 1 - u, u)
    v = np.where(flip, 1 - v, v)
    p = (verts[tris[ti, 0]] + u * (verts[tris[ti, 1]] - verts[tris[ti, 0]])
         + v * (verts[tris[ti, 2]] - verts[tris[ti, 0]]))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = (p + d * 1e-3).astype(np.float32)

    _, _, dc, hc = tracer.trace_cpu(o, d)
    _, _, dg, hg = jax.tree_util.tree_map(
        np.asarray, tracer.trace(jnp.asarray(o), jnp.asarray(d)))
    clear = (~hc) | (dc > 0.05)
    agree = (hg == hc)[clear].mean()
    assert agree >= 0.98, \
        f"RMS {tracer.distill_rms:.4f} passed the tripwire but clearing-ray " \
        f"agreement is only {agree:.3f} — tighten tracer_rms_fallback"


def test_distill_cache_roundtrip(bowl_mesh, tmp_path, monkeypatch):
    """Second construction must load from cache, bit-identical params."""
    verts, tris = bowl_mesh
    monkeypatch.setattr(NeuralTracer, "CACHE_DIR", str(tmp_path))
    t1 = NeuralTracer(verts, tris, distill_steps=40, distill_samples=30_000,
                      distill_batch=8192, verbose=False)
    import time
    t0 = time.time()
    t2 = NeuralTracer(verts, tris, distill_steps=40, distill_samples=30_000,
                      distill_batch=8192, verbose=False)
    assert time.time() - t0 < 15.0  # no re-distillation
    assert t2.distill_rms == t1.distill_rms
    for l1, l2 in zip(t1.field_params["layers"], t2.field_params["layers"]):
        np.testing.assert_array_equal(np.asarray(l1["w"]), np.asarray(l2["w"]))


def test_miss_semantics(tracer):
    # rays pointing straight away from the sphere must miss with depth == far
    o = np.asarray([[0.0, 0.0, 0.52]], np.float32)
    d = np.asarray([[0.0, 0.0, 1.0]], np.float32)
    _, normal, depth, hit = jax.tree_util.tree_map(
        np.asarray, tracer.trace(jnp.asarray(o), jnp.asarray(d)))
    assert not hit[0]
    assert depth[0, 0] == tracer.far
    assert (normal[0] == 0).all()


# --------------------------------------------------------------------------
# wide topology (VERDICT r4 next #2): quality + fused-kernel parity
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def wide_tracer():
    import os
    verts, tris = extract_geometry(
        [-1, -1, -1], [1, 1, 1], 48, 0.0,
        lambda p: jnp.linalg.norm(p, axis=-1, keepdims=True) - 0.5)
    old = NeuralTracer.CACHE_DIR
    NeuralTracer.CACHE_DIR = os.path.join(os.path.dirname(__file__),
                                          ".tracer_cache")
    try:
        return NeuralTracer(verts, tris, distill_steps=300,
                            distill_samples=120_000, distill_batch=16384,
                            verbose=False, field_topology="wide")
    finally:
        NeuralTracer.CACHE_DIR = old


def test_wide_distillation_quality(wide_tracer):
    # same bar as the std fixture: the 3-matmul wide field must distill the
    # sphere SDF at least as well as the 4-matmul std field
    assert wide_tracer.distill_rms < 0.01, wide_tracer.distill_rms


def test_wide_trace_agreement_with_exact(wide_tracer):
    rng = np.random.RandomState(0)
    n = 2048
    p = rng.normal(size=(n, 3))
    p /= np.linalg.norm(p, axis=-1, keepdims=True)
    p = (p * 0.5).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = (p + d * 1e-5).astype(np.float32)

    _, _, dc, hc = wide_tracer.trace_cpu(o, d)
    _, _, dg, hg = jax.tree_util.tree_map(
        np.asarray, wide_tracer.trace(jnp.asarray(o), jnp.asarray(d)))
    agree = (hg == hc).mean()
    assert agree > 0.93, agree
    m = hc & hg & (dc > 0.05)
    if m.any():
        assert np.abs(dg[:, 0][m] - dc[m]).mean() < 0.02


def test_wide_fused_march_matches_xla_path(wide_tracer):
    """Interpret-mode wide sphere-march kernel vs the XLA (non-fused) trace
    on the SAME distilled field: hits must agree and depths must match."""
    from nero_tpu.geometry.neural_tracer import neural_trace
    from nero_tpu.ops.pallas.field_kernel import pack_field_params

    rng = np.random.RandomState(1)
    n = 512
    p = rng.normal(size=(n, 3))
    p /= np.linalg.norm(p, axis=-1, keepdims=True)
    p = (p * 0.5).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = (p + d * 1e-5).astype(np.float32)

    packed = pack_field_params(wide_tracer.field_params, topology="wide")
    margin = max(0.002, 3.0 * float(wide_tracer.distill_rms))
    from nero_tpu.ops.pallas.interp import force_interpret
    with force_interpret():
        tf, _, hf = neural_trace(
            wide_tracer.field_params, packed, jnp.asarray(o), jnp.asarray(d),
            wide_tracer.bound, use_fused=True, march_mode="sphere",
            n_sphere=20, margin=margin, topology="wide")
    tx, _, hx = neural_trace(
        wide_tracer.field_params, packed, jnp.asarray(o), jnp.asarray(d),
        wide_tracer.bound, use_fused=False, margin=margin, topology="wide")
    hf, hx = np.asarray(hf), np.asarray(hx)
    # fused sphere trace vs XLA uniform-32 march: same field, same bracket
    # contract — near-total agreement (sub-1% disagreement is step-pattern
    # difference at grazing rays, same as the std-topology sweep)
    assert (hf == hx).mean() > 0.985, (hf == hx).mean()
    m = hf & hx
    assert np.abs(np.asarray(tf)[m] - np.asarray(tx)[m]).mean() < 5e-3
