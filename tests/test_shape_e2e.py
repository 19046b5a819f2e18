"""End-to-end Stage-I smoke tests on the procedural scene (CPU, tiny shapes)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nero_tpu.models.shape import NeROShapeModel

TINY_CFG = {
    "name": "test_tiny",
    "network": "shape",
    "database_name": "proc/sphere/32_6",
    "n_samples": 16,
    "n_importance": 8,
    "up_sample_steps": 2,
    "n_bg_samples": 4,
    "train_ray_num": 32,
    "test_ray_num": 64,
    "occ_loss_step": 5,
    "occ_loss_max_pn": 64,
    "anneal_end": 100,
    "test_downsample_ratio": True,
    "downsample_ratio": 0.5,
    "loss": ["nerf_render", "eikonal", "std", "init_sdf_reg", "occ"],
    "eikonal_weight": 0.1,
    "key_metric_name": "psnr",
}


@pytest.fixture(scope="module")
def model():
    return NeROShapeModel(dict(TINY_CFG), training=True)


@pytest.fixture(scope="module")
def step_ctx(model):
    """One (opt, jitted step) shared module-wide: a fresh make_train_step per
    test retraces the full train-step graph (~6 s on this 1-core container)."""
    opt = optax.adam(1e-3)
    return opt, model.make_train_step(opt, donate=False)


def test_train_step_runs_and_improves(model, step_ctx):
    opt, step_fn = step_ctx
    params = model.params
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(0)

    losses = []
    for i in range(8):
        k = jax.random.fold_in(key, i)
        params, opt_state, log = step_fn(params, opt_state, k, jnp.asarray(i),
                                         model.train_data)
        losses.append(float(log["loss_rgb"]))
    assert all(np.isfinite(losses))
    # rgb loss should clearly drop within 8 steps on a tiny scene
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses
    model.params = params


def test_log_contains_expected_keys(model, step_ctx):
    opt, step_fn = step_ctx
    opt_state = opt.init(model.params)
    _, _, log = step_fn(model.params, opt_state, jax.random.PRNGKey(1),
                        jnp.asarray(10), model.train_data)
    for k in ["loss_rgb", "loss_eikonal", "std", "loss_occ",
              "loss_sdf_small", "loss_sdf_large", "loss_total"]:
        assert k in log, f"missing {k}"
        assert np.isfinite(float(log[k])), k


def test_test_step_outputs(model):
    outputs = model.test_step(model.params, 0, step=10)
    h, w = outputs["ray_rgb"].shape[:2]
    assert outputs["ray_rgb"].shape == (h, w, 3)
    assert outputs["gt_rgb"].shape == (h, w, 3)
    assert outputs["normal"].shape == (h, w, 3)
    assert outputs["depth"].shape == (h, w, 1)
    assert outputs["occ_prob_gt"].shape == (h, w, 1)
    for k in ["metallic", "roughness", "occ_prob"]:
        assert outputs[k].shape == (h, w, 1)
    assert np.isfinite(outputs["ray_rgb"]).all()


def test_nvs(model):
    pose = model.test_imgs_info["poses"][0]
    K = model.test_imgs_info["Ks"][0]
    img = model.nvs(model.params, pose, K, 16, 16, step=10)
    assert img.shape == (16, 16, 3)
    assert np.isfinite(img).all()
