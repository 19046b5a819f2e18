"""Accuracy-vs-cost sweep for the neural tracer's coarse march resolution.

Measures hit agreement vs the exact BVH on the concave multi-component test
mesh (bowl shell + interior ball, the hardest shipped geometry) for a range
of n_coarse values. Decides how few field evals the Stage-II march can take
while holding the >=0.98 clearing-ray agreement bar of
tests/test_neural_tracer.py.

Usage: python tools/sweep_march_samples.py   (CPU-friendly)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bowl_mesh():
    import numpy as np
    from nero_tpu.geometry import native

    def sdf(p):
        import numpy as np
        bowl = np.maximum(np.linalg.norm(p, axis=-1) - 0.5,
                          -(np.linalg.norm(p - np.array([0, 0, 0.15]), axis=-1) - 0.42))
        ball = np.linalg.norm(p - np.array([0, 0, -0.18]), axis=-1) - 0.16
        return np.minimum(bowl, ball)

    grid = 96
    xs = np.linspace(-0.55, 0.55, grid).astype(np.float32)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    vals = sdf(np.stack([X, Y, Z], -1).reshape(-1, 3)).reshape(grid, grid, grid)
    verts, tris = native.isosurface(vals.astype(np.float32), 0.0)
    verts = (verts / (grid - 1.0) * 1.1 - 0.55).astype(np.float32)
    return verts, tris


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from nero_tpu.geometry.neural_tracer import NeuralTracer, neural_trace

    verts, tris = bowl_mesh()
    tracer = NeuralTracer(verts, tris, distill_steps=900,
                          distill_samples=300_000, distill_batch=16384,
                          cache=True, verbose=True)
    print(f"bound={tracer.bound:.3f} rms={tracer.distill_rms:.4f}")

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
    hc = np.asarray(hc, bool)
    dc = np.asarray(dc).reshape(-1)
    clear = (~hc) | (dc > 0.05)

    for n_coarse in (48, 40, 32, 24, 16):
        t, nrm, hit = neural_trace(
            tracer.field_params, tracer.packed, jnp.asarray(o), jnp.asarray(d),
            tracer.bound, tracer.far, n_coarse=n_coarse, n_refine=8,
            use_fused=False)
        hg = np.asarray(hit, bool)
        tg = np.asarray(t)
        agree = (hg == hc)[clear].mean()
        both = clear & hc & hg & (tg > 0.05)
        depth_mae = np.abs(tg[both] - dc[both]).mean() if both.any() else float("nan")
        spacing = 2 * tracer.bound / n_coarse
        print(f"n_coarse={n_coarse:2d} (evals/ray={n_coarse + 8}, "
              f"spacing~{spacing:.3f}): clearing-agreement={agree:.4f} "
              f"depth_mae={depth_mae:.4f}")


if __name__ == "__main__":
    main()
