"""Sphere-traced march vs uniform coarse march: quality + step-time A/B.

Quality: clearing-ray hit agreement vs the exact BVH on the concave
multi-component bowl mesh (the tests' >=0.98 bar), uniform n_coarse=32 vs
sphere n_sphere in {20,16,12} — all with n_refine=8 bisections.
Speed: the full Stage-II train step (bench.py workload) on the convex sphere
AND concave bowl procedural scenes under each march mode.

Additional modes (each with HLO-verified step arms):
  topology    — std vs wide distilled-field topology (VERDICT r4 next #2;
                measured: wide REJECTED, see IMPLEMENTATION_NOTES round 5)
  refine      — bisect-8 vs Illinois-{3,2} bracket refinement
  refine_fine — joint (n_sphere, n_refine) Illinois sweep that set the
                s18+illinois2 production default

Usage: python tools/ab_sphere_march.py [quality|speed|all|topology|refine|refine_fine]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _mirror_mesh():
    import numpy as np

    from nero_tpu.dataset.synthetic import scene_sdf
    from nero_tpu.geometry import native

    sdf = scene_sdf("mirror")
    grid = 96
    xs = np.linspace(-0.52, 0.52, grid).astype(np.float32)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    vals = sdf(np.stack([X, Y, Z], -1).reshape(-1, 3)) \
        .reshape(grid, grid, grid).astype(np.float32)
    verts, tris = native.isosurface(vals, 0.0)
    return (verts / (grid - 1.0) * 1.04 - 0.52).astype(np.float32), tris


def quality(scene="bowl"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nero_tpu.geometry.neural_tracer import NeuralTracer, neural_trace
    from tools.sweep_march_samples import bowl_mesh

    verts, tris = bowl_mesh() if scene == "bowl" else _mirror_mesh()
    tracer = NeuralTracer(verts, tris, distill_steps=900,
                          distill_samples=300_000, distill_batch=16384,
                          cache=True, verbose=True)
    margin = max(0.002, 3.0 * float(tracer.distill_rms))
    print(f"bound={tracer.bound:.3f} rms={tracer.distill_rms:.4f} "
          f"margin={margin:.4f}", flush=True)

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
    hc = np.asarray(hc, bool)
    dc = np.asarray(dc).reshape(-1)
    clear = (~hc) | (dc > 0.05)

    on_tpu = jax.default_backend() == "tpu"
    variants = [("uniform_c32", dict(march_mode="uniform", n_coarse=32))]
    for ns in (20, 16, 12):
        variants.append((f"sphere_s{ns}",
                         dict(march_mode="sphere", n_sphere=ns, n_coarse=32)))
    for name, kw in variants:
        t, _, hit = neural_trace(
            tracer.field_params, tracer.packed, jnp.asarray(o), jnp.asarray(d),
            tracer.bound, tracer.far, n_refine=8, use_fused=on_tpu,
            margin=margin, **kw)
        hg = np.asarray(hit, bool)
        tg = np.asarray(t)
        agree = (hg == hc)[clear].mean()
        both = clear & hc & hg & (tg > 0.05)
        depth_mae = np.abs(tg[both] - dc[both]).mean() if both.any() else float("nan")
        print(json.dumps({"variant": name, "fused": on_tpu,
                          "clearing_agreement": round(float(agree), 4),
                          "depth_mae": round(float(depth_mae), 5)}), flush=True)


def topology(scene="bowl"):
    """std vs wide distilled-field topology: quality (near-band RMS +
    clearing agreement vs the exact BVH, the tests' >=0.98 bar) and the
    full Stage-II step time on sphere AND bowl. VERDICT r4 next #2."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nero_tpu.geometry.neural_tracer import NeuralTracer, neural_trace
    from tools.sweep_march_samples import bowl_mesh

    verts, tris = bowl_mesh() if scene == "bowl" else _mirror_mesh()
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

    on_tpu = jax.default_backend() == "tpu"
    for topo in ("std", "wide"):
        tracer = NeuralTracer(verts, tris, distill_steps=3000, cache=True,
                              verbose=True, field_topology=topo)
        margin = max(0.002, 3.0 * float(tracer.distill_rms))
        _, _, dc, hc = tracer.trace_cpu(o, d)
        hc = np.asarray(hc, bool)
        dc = np.asarray(dc).reshape(-1)
        clear = (~hc) | (dc > 0.05)
        t, _, hit = neural_trace(
            tracer.field_params, tracer.packed, jnp.asarray(o), jnp.asarray(d),
            tracer.bound, tracer.far, n_refine=8, use_fused=on_tpu,
            march_mode="sphere", n_sphere=20, n_coarse=32, margin=margin,
            topology=topo)
        hg = np.asarray(hit, bool)
        tg = np.asarray(t)
        agree = (hg == hc)[clear].mean()
        both = clear & hc & hg & (tg > 0.05)
        depth_mae = np.abs(tg[both] - dc[both]).mean() if both.any() else float("nan")
        print(json.dumps({"variant": f"topo_{topo}", "fused": on_tpu,
                          "rms": round(float(tracer.distill_rms), 5),
                          "clearing_agreement": round(float(agree), 4),
                          "depth_mae": round(float(depth_mae), 5)}), flush=True)

    from tools.ceiling_stage2 import run_variant
    for sc in ("sphere", "bowl"):
        run_variant(f"{sc}_topo_std", scene=sc,
                    extra={"tracer_field_topology": "std"},
                    expect_kernels={"nero_smarch_s20_r8": True,
                                    "nero_smarch_s20_r8_w": False})
        run_variant(f"{sc}_topo_wide", scene=sc,
                    extra={"tracer_field_topology": "wide"},
                    expect_kernels={"nero_smarch_s20_r8_w": True})


def refine(scene="bowl"):
    """Bisect-8 vs Illinois-{3,2} bracket refinement after the s20 sphere
    march: quality (clearing agreement — march-determined, should be
    identical — plus depth MAE vs the exact BVH, whose floor is the
    field error ~2x distill RMS) on the bowl AND mirror meshes, then the
    full Stage-II step time on both scenes. VERDICT r4 next #2 follow-on:
    5 fewer field evals/ray if depth holds the floor."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nero_tpu.geometry.neural_tracer import NeuralTracer, neural_trace
    from tools.sweep_march_samples import bowl_mesh

    on_tpu = jax.default_backend() == "tpu"
    for mesh_name in ("bowl", "mirror"):
        verts, tris = bowl_mesh() if mesh_name == "bowl" else _mirror_mesh()
        tracer = NeuralTracer(verts, tris, distill_steps=3000, cache=True,
                              verbose=True)
        margin = max(0.002, 3.0 * float(tracer.distill_rms))
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
        hc = np.asarray(hc, bool)
        dc = np.asarray(dc).reshape(-1)
        clear = (~hc) | (dc > 0.05)
        for name, kw in (("bisect8", dict(refine="bisect", n_refine=8)),
                         ("illinois3", dict(refine="illinois", n_refine=3)),
                         ("illinois2", dict(refine="illinois", n_refine=2))):
            t, _, hit = neural_trace(
                tracer.field_params, tracer.packed, jnp.asarray(o),
                jnp.asarray(d), tracer.bound, tracer.far, use_fused=on_tpu,
                march_mode="sphere", n_sphere=20, n_coarse=32, margin=margin,
                **kw)
            hg = np.asarray(hit, bool)
            tg = np.asarray(t)
            agree = (hg == hc)[clear].mean()
            both = clear & hc & hg & (tg > 0.05)
            depth_mae = np.abs(tg[both] - dc[both]).mean() if both.any() \
                else float("nan")
            print(json.dumps({"variant": f"{mesh_name}_refine_{name}",
                              "fused": on_tpu,
                              "clearing_agreement": round(float(agree), 4),
                              "depth_mae": round(float(depth_mae), 5)}),
                  flush=True)

    from tools.ceiling_stage2 import run_variant
    for sc in ("sphere", "bowl"):
        run_variant(f"{sc}_refine_bisect8", scene=sc,
                    extra={"tracer_refine_mode": "bisect",
                           "tracer_n_refine": 8},
                    expect_kernels={"nero_smarch_s20_r8": True,
                                    "nero_smarch_s20_r3i": False})
        run_variant(f"{sc}_refine_illinois3", scene=sc,
                    extra={"tracer_refine_mode": "illinois",
                           "tracer_n_refine": 3},
                    expect_kernels={"nero_smarch_s20_r3i": True,
                                    "nero_smarch_s20_r8": False})


def refine_fine():
    """Joint (n_sphere, n_refine) sweep with Illinois refinement: the s20
    agreement headroom (0.9892 vs the 0.98 bar on the current bowl
    distill) may fund fewer sphere iterations on top of the Illinois
    refine win. Quality on the bowl mesh (the cavity regime where the bar
    binds), then step time on both scenes for variants that pass."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nero_tpu.geometry.neural_tracer import NeuralTracer, neural_trace
    from tools.sweep_march_samples import bowl_mesh

    on_tpu = jax.default_backend() == "tpu"
    verts, tris = bowl_mesh()
    tracer = NeuralTracer(verts, tris, distill_steps=3000, cache=True,
                          verbose=True)
    margin = max(0.002, 3.0 * float(tracer.distill_rms))
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
    hc = np.asarray(hc, bool)
    dc = np.asarray(dc).reshape(-1)
    clear = (~hc) | (dc > 0.05)

    passing = []
    for ns, nr in ((20, 3), (20, 2), (19, 3), (18, 3), (18, 2), (16, 3)):
        t, _, hit = neural_trace(
            tracer.field_params, tracer.packed, jnp.asarray(o),
            jnp.asarray(d), tracer.bound, tracer.far, use_fused=on_tpu,
            march_mode="sphere", n_sphere=ns, n_coarse=32, margin=margin,
            refine="illinois", n_refine=nr)
        hg = np.asarray(hit, bool)
        tg = np.asarray(t)
        agree = float((hg == hc)[clear].mean())
        both = clear & hc & hg & (tg > 0.05)
        depth_mae = float(np.abs(tg[both] - dc[both]).mean()) if both.any() \
            else float("nan")
        ok = agree >= 0.98
        print(json.dumps({"variant": f"bowl_s{ns}_r{nr}i",
                          "clearing_agreement": round(agree, 4),
                          "depth_mae": round(depth_mae, 5),
                          "passes_bar": ok}), flush=True)
        if ok:
            passing.append((ns, nr))

    from tools.ceiling_stage2 import run_variant
    # step-time the cheapest two passing variants on both scenes
    for ns, nr in sorted(passing, key=lambda x: x[0] + x[1])[:2]:
        for sc in ("sphere", "bowl"):
            run_variant(f"{sc}_s{ns}_r{nr}i", scene=sc,
                        extra={"tracer_n_sphere": ns,
                               "tracer_refine_mode": "illinois",
                               "tracer_n_refine": nr},
                        expect_kernels={f"nero_smarch_s{ns}_r{nr}i": True})


def speed():
    from tools.ceiling_stage2 import run_variant
    for scene in ("sphere", "bowl"):
        # HLO-verified arms (core/mfu.py::assert_kernels): the uniform arm
        # must compile nero_march_* and NOT nero_smarch_*, and vice versa —
        # a silent fallback aborts instead of measuring XLA vs itself.
        run_variant(f"{scene}_uniform", scene=scene,
                    extra={"tracer_march_mode": "uniform"},
                    expect_kernels={"nero_march_": True, "nero_smarch_": False})
        run_variant(f"{scene}_sphere20", scene=scene,
                    extra={"tracer_march_mode": "sphere",
                           "tracer_n_sphere": 20},
                    expect_kernels={"nero_smarch_": True, "nero_march_": False})


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("quality", "all"):
        quality(sys.argv[2] if len(sys.argv) > 2 else "bowl")
    if which in ("speed", "all"):
        speed()
    if which == "topology":
        topology(sys.argv[2] if len(sys.argv) > 2 else "bowl")
    if which == "refine":
        refine(sys.argv[2] if len(sys.argv) > 2 else "bowl")
    if which == "refine_fine":
        refine_fine()
