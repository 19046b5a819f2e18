"""Multi-scene batched training: 4 scenes over the 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nero_tpu.models.multi_scene import MultiSceneShapeModel
from tests.test_shape_e2e import TINY_CFG


@pytest.mark.slow  # ~105 s on the 1-CPU container; the quick suite covers the
# multi-scene machinery via test_parallel.py::test_scene_by_ray_mesh_matches_per_scene
@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >=2 devices")
def test_multi_scene_training():
    cfgs = []
    for s in range(2):
        cfg = dict(TINY_CFG)
        cfg["name"] = f"scene{s}"
        cfg["train_ray_num"] = 16
        cfgs.append(cfg)

    from nero_tpu.parallel.mesh import make_data_mesh
    mesh = make_data_mesh(jax.devices()[:2])
    ms = MultiSceneShapeModel(cfgs, mesh=mesh)
    opt = optax.adam(1e-3)
    step_fn = ms.make_train_step(opt, donate=False)

    params = ms.shard_over_scenes(ms.params)
    data = ms.shard_over_scenes(ms.train_data)
    opt_state = jax.vmap(opt.init)(params)

    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(10):
        keys = ms.scene_keys(key, i)
        params, opt_state, log = step_fn(params, opt_state, keys, jnp.asarray(i), data)
        losses.append(np.asarray(log["loss_rgb"]))
    losses = np.stack(losses)  # [steps, scenes]
    assert losses.shape == (10, 2)
    assert np.isfinite(losses).all()
    # every scene's loss drops
    assert (losses[-3:].mean(0) < losses[:3].mean(0)).all()
    # scenes trained with different seeds -> different params
    p0 = np.asarray(jax.tree_util.tree_leaves(ms.scene_params(params, 0))[0])
    p1 = np.asarray(jax.tree_util.tree_leaves(ms.scene_params(params, 1))[0])
    assert np.abs(p0 - p1).max() > 1e-6
