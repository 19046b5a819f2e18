"""Multi-device data parallelism: 8-way CPU mesh vs single device parity."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nero_tpu.models.shape import NeROShapeModel
from nero_tpu.parallel.mesh import make_data_mesh
from tests.test_shape_e2e import TINY_CFG


def _run_mesh_step(mesh):
    cfg = dict(TINY_CFG)
    cfg["train_ray_num"] = 64
    # This test checks sharding correctness via near-bitwise parity; bf16
    # hidden activations make 8-way reduction order visible in the grads,
    # which Adam amplifies to ~2x lr on near-zero-grad params. Pin f32.
    cfg["bf16_hidden"] = False
    model = NeROShapeModel(cfg, training=True, mesh=mesh)
    opt = optax.adam(1e-3)
    step_fn = model.make_train_step(opt, donate=False)
    opt_state = opt.init(model.params)
    params, _, log = step_fn(model.params, opt_state, jax.random.PRNGKey(0),
                             jnp.asarray(0), model.train_data)
    return params, {k: float(v) for k, v in log.items()}


_single_device_result = {}


def _reference_result():
    """Single-device step, cached across the parity tests (one trace)."""
    if not _single_device_result:
        _single_device_result["m1"] = _run_mesh_step(
            make_data_mesh(jax.devices()[:1]))
    return _single_device_result["m1"]


def _assert_step_parity(mesh, name):
    params1, log1 = _reference_result()
    params_o, log_o = _run_mesh_step(mesh)
    for k in log1:
        np.testing.assert_allclose(log_o[k], log1[k], rtol=2e-3,
                                   atol=1e-5, err_msg=f"{name}:{k}")
    l1 = [np.asarray(x) for x in jax.tree_util.tree_leaves(params1)]
    lo = [np.asarray(x) for x in jax.tree_util.tree_leaves(params_o)]
    worst = max(float(np.max(np.abs(a - b))) for a, b in zip(l1, lo))
    assert worst < 2e-4, (name, worst)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_step_matches_single_device():
    _assert_step_parity(make_data_mesh(jax.devices()[:8]), "m8")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow  # a third full train-step trace (~15 s); the driver's
# dryrun_multichip executes this exact ('slice','data') shape every round,
# and the quick suite covers 8-way parity above
def test_multislice_step_matches_single_device():
    # multi-slice shape: ('slice','data') 2x4 — same step, hierarchical reduce
    _assert_step_parity(make_data_mesh(jax.devices()[:8], n_slices=2), "m2x4")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow  # ~55 s of trace time (4 full train-step programs); the
# driver's dryrun_multichip exercises the same combined partitioning each run
def test_scene_by_ray_mesh_matches_per_scene():
    """Combined ('scene','data') 2x4 partitioning == each scene trained alone."""
    from nero_tpu.models.multi_scene import MultiSceneShapeModel
    from nero_tpu.parallel.mesh import make_scene_mesh

    cfg = dict(TINY_CFG)
    cfg["train_ray_num"] = 32
    cfg["bf16_hidden"] = False

    cfgs = []
    for s in range(2):
        c = dict(cfg)
        c["name"] = f"par_scene{s}"
        c["random_seed"] = 100 + s
        cfgs.append(c)

    mesh = make_scene_mesh(2, jax.devices()[:8])
    ms = MultiSceneShapeModel([dict(c) for c in cfgs], mesh=mesh)
    opt = optax.adam(1e-3)
    ms_step = ms.make_train_step(opt, donate=False)
    ms_params = ms.shard_over_scenes(ms.params)
    ms_data = ms.shard_over_scenes(ms.train_data)
    ms_opt = jax.vmap(opt.init)(ms_params)
    keys = ms.scene_keys(jax.random.PRNGKey(7), 0)
    ms_params, ms_opt, ms_log = ms_step(ms_params, ms_opt, keys,
                                        jnp.asarray(0), ms_data)
    scene_losses = np.asarray(ms_log["loss_total"])
    assert scene_losses.shape == (2,)
    assert scene_losses[0] != scene_losses[1]

    # reference: each scene alone on a 1-device mesh with the same key
    mesh1 = make_data_mesh(jax.devices()[:1])
    for s in range(2):
        c = dict(cfgs[s])
        # MultiSceneShapeModel offsets each scene's seed by its index
        c["random_seed"] = c["random_seed"] + s
        model = NeROShapeModel(c, training=True, mesh=mesh1)
        step_fn = model.make_train_step(opt, donate=False)
        p1, _, log1 = step_fn(model.params, opt.init(model.params), keys[s],
                              jnp.asarray(0), model.train_data)
        np.testing.assert_allclose(float(log1["loss_total"]),
                                   scene_losses[s], rtol=2e-3, atol=1e-5)
        la = [np.asarray(x) for x in jax.tree_util.tree_leaves(p1)]
        lb = [np.asarray(x[s]) for x in jax.tree_util.tree_leaves(ms_params)]
        worst = max(float(np.max(np.abs(a - b))) for a, b in zip(la, lb))
        assert worst < 2e-4, (s, worst)


@pytest.mark.slow  # the driver runs the real dryrun every round
# (MULTICHIP_r0N.json); in the quick suite the combined scene-x-ray program is
# covered by test_scene_by_ray_mesh_matches_per_scene
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip_entry():
    import __graft_entry__ as g
    g.dryrun_multichip(8)
