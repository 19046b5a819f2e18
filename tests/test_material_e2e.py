"""End-to-end Stage-II smoke tests: mesh + BVH + MC shading on the proc scene."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nero_tpu.geometry.isosurface import extract_geometry
from nero_tpu.models.material import NeROMaterialModel

MAT_CFG = {
    "name": "test_mat_tiny",
    "network": "material",
    "database_name": "proc/sphere/32_6",
    "train_ray_num": 32,
    "test_ray_num": 128,
    "shader_cfg": {
        "diffuse_sample_num": 32,
        "specular_sample_num": 16,
        "human_lights": False,
        "outer_light_version": "direction",
    },
    "loss": ["nerf_render", "mat_reg"],
    "key_metric_name": "psnr",
    "tracer": "bvh",  # exact tracer for CPU tests (neural is the TPU default)
}


@pytest.fixture(scope="module")
def sphere_mesh():
    verts, tris = extract_geometry(
        [-1, -1, -1], [1, 1, 1], 48, 0.0,
        lambda p: jnp.linalg.norm(p, axis=-1, keepdims=True) - 0.5)
    return {"vertices": verts, "triangles": tris}


@pytest.fixture(scope="module")
def model(sphere_mesh):
    cfg = dict(MAT_CFG)
    cfg["mesh"] = sphere_mesh
    return NeROMaterialModel(cfg, training=True)


def test_hit_batch_on_surface(model):
    assert model.tbn > 100
    r = np.linalg.norm(model.train_batch["inters"], axis=-1)
    assert np.abs(r - 0.5).max() < 0.08
    # flipped normals point outward (reference NeuS-flip convention)
    n = model.train_batch["normals"]
    dots = np.sum(n * model.train_batch["inters"], -1) / np.maximum(r, 1e-9)
    assert (dots > 0.5).mean() > 0.95


def test_train_step_improves(model):
    opt = optax.adam(3e-4)
    step_fn = model.make_train_step(opt, donate=False)
    params = model.params
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(25):
        params, opt_state, log = step_fn(params, opt_state,
                                         jax.random.fold_in(key, i),
                                         jnp.asarray(i), model.train_data)
        losses.append(float(log["loss_rgb"]))
    assert all(np.isfinite(losses))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses
    model.params = params


def test_log_keys(model):
    opt = optax.adam(3e-4)
    step_fn = model.make_train_step(opt, donate=False)
    opt_state = opt.init(model.params)
    _, _, log = step_fn(model.params, opt_state, jax.random.PRNGKey(5),
                        jnp.asarray(0), model.train_data)
    for k in ["loss_rgb", "loss_mat_reg", "loss_diffuse_light", "loss_total"]:
        assert k in log and np.isfinite(float(log[k])), k


def test_test_step(model):
    out = model.test_step(model.params, 0)
    h, w = out["rgb_pr"].shape[:2]
    assert out["rgb_pr"].shape == (h, w, 3)
    assert out["rgb_gt"].shape == (h, w, 3)
    assert out["roughness"].shape == (h, w, 1)
    assert np.isfinite(out["rgb_pr"]).all()
    # roughness exported in [0.04, 1] after sqrt
    rh = out["roughness"][out["roughness"] > 0]
    if rh.size:
        assert rh.min() >= 0.0399 and rh.max() <= 1.0001


def test_predict_materials_and_env(model):
    mats = model.predict_materials()
    nv = len(model.vertices)
    assert mats["metallic"].shape == (nv, 1)
    assert mats["roughness"].shape == (nv, 1)
    assert mats["albedo"].shape == (nv, 3)
    assert (mats["roughness"] >= 0.0399).all()
    env = model.env_light(8, 16)
    assert env.shape == (8, 16, 3) and np.isfinite(env).all()
