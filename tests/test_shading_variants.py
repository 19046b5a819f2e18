"""Branch coverage for the optional shading paths: human light, sphere_direction."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nero_tpu.fields.app_shading import (AppShadingConfig, app_shading_apply,
                                         get_camera_plane_intersection,
                                         init_app_shading)
from nero_tpu.fields.mc_shading import (MCShadingConfig, init_mc_shading,
                                        make_direction_samples, mc_shading_apply,
                                        predict_outer_lights)
from nero_tpu.ops.fg_lut import compute_fg_lut


def _surface_batch(n=16):
    rng = np.random.RandomState(0)
    normals = rng.normal(size=(n, 3))
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    points = (normals * 0.5).astype(np.float32)
    view = rng.normal(size=(n, 3))
    view /= np.linalg.norm(view, axis=-1, keepdims=True)
    view = np.where(np.sum(view * normals, -1, keepdims=True) < 0, -view, view)
    feats = rng.randn(n, 256).astype(np.float32)
    poses = np.tile(np.concatenate([np.eye(3), np.asarray([[0.0], [0.0], [3.0]])], 1)
                    [None], (n, 1, 1)).astype(np.float32)
    return (jnp.asarray(points), jnp.asarray(normals.astype(np.float32)),
            jnp.asarray(view.astype(np.float32)), jnp.asarray(feats),
            jnp.asarray(poses))


def test_app_shading_human_and_sphere():
    cfg = AppShadingConfig(human_light=True, sphere_direction=True)
    params = init_app_shading(jax.random.PRNGKey(0), cfg)
    lut = jnp.asarray(compute_fg_lut(res=32, n_samples=64))
    pts, normals, view, feats, poses = _surface_batch()
    color, occ_info, inter = jax.jit(lambda p: app_shading_apply(
        p, cfg, lut, pts, normals, view, feats, poses,
        inter_results=True))(params)  # jit: persistent-cache compile
    assert color.shape == (16, 3)
    assert np.isfinite(np.asarray(color)).all()
    assert "human_light" in inter
    assert np.isfinite(np.asarray(inter["human_light"])).all()
    # human light is exp-clamped at 0 -> weighted contribution <= 1
    assert np.asarray(inter["human_light"]).max() <= 1.0 + 1e-5


def test_camera_plane_intersection():
    # camera at origin looking +z (identity pose); ray crossing the z=0 plane
    poses = jnp.asarray(np.concatenate([np.eye(3), np.zeros((3, 1))], 1)[None],
                        jnp.float32)
    pts = jnp.asarray([[0.0, 0.0, 1.0]])
    dirs = jnp.asarray([[0.0, 0.0, -1.0]])
    inter, dist, hits = get_camera_plane_intersection(pts, dirs, poses)
    assert bool(hits[0])
    np.testing.assert_allclose(float(dist[0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(inter[0]), [0, 0, 0], atol=1e-6)


def test_mc_shading_sphere_direction_human():
    cfg = MCShadingConfig(diffuse_sample_num=8, specular_sample_num=4,
                          human_lights=True, outer_light_version="sphere_direction")
    params = init_mc_shading(jax.random.PRNGKey(1), cfg)
    samples = make_direction_samples(cfg)
    pts, normals, view, _, poses = _surface_batch(8)

    def trace_fn(o, d):
        # everything misses: depth = far
        n = o.shape[0]
        t = jnp.full((n,), 10.0)
        return o + d * t[:, None], jnp.zeros_like(o), t[:, None], jnp.zeros(n, bool)

    colors, outputs = jax.jit(lambda p: mc_shading_apply(
        p, cfg, samples, trace_fn, pts, view, normals, poses,
        key=jax.random.PRNGKey(2)))(params)  # jit: persistent-cache compile
    assert colors.shape == (8, 3)
    assert np.isfinite(np.asarray(colors)).all()
    for k in ["albedo", "metallic", "roughness", "diffuse_light", "specular_light"]:
        assert np.isfinite(np.asarray(outputs[k])).all()

    # env-light export path for sphere_direction (duplicated encoding)
    light = predict_outer_lights(params, cfg, pts, normals)
    assert light.shape == (8, 3)
