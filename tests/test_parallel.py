"""Multi-device data parallelism: 8-way CPU mesh vs single device parity."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nero_tpu.models.shape import NeROShapeModel
from nero_tpu.parallel.mesh import make_data_mesh
from tests.test_shape_e2e import TINY_CFG


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_step_matches_single_device():
    cfg = dict(TINY_CFG)
    cfg["train_ray_num"] = 64
    # This test checks sharding correctness via near-bitwise parity; bf16
    # hidden activations make 8-way reduction order visible in the grads,
    # which Adam amplifies to ~2x lr on near-zero-grad params. Pin f32.
    cfg["bf16_hidden"] = False

    mesh8 = make_data_mesh(jax.devices()[:8])
    mesh1 = make_data_mesh(jax.devices()[:1])

    logs = {}
    params_out = {}
    for name, mesh in [("m8", mesh8), ("m1", mesh1)]:
        model = NeROShapeModel(dict(cfg), training=True, mesh=mesh)
        opt = optax.adam(1e-3)
        step_fn = model.make_train_step(opt, donate=False)
        opt_state = opt.init(model.params)
        params, _, log = step_fn(model.params, opt_state, jax.random.PRNGKey(0),
                                 jnp.asarray(0), model.train_data)
        logs[name] = {k: float(v) for k, v in log.items()}
        params_out[name] = params

    for k in logs["m1"]:
        np.testing.assert_allclose(logs["m8"][k], logs["m1"][k], rtol=2e-3,
                                   atol=1e-5, err_msg=k)
    # updated parameters agree across mesh sizes
    l1 = [np.asarray(x) for x in jax.tree_util.tree_leaves(params_out["m1"])]
    l8 = [np.asarray(x) for x in jax.tree_util.tree_leaves(params_out["m8"])]
    worst = max(float(np.max(np.abs(a - b))) for a, b in zip(l1, l8))
    assert worst < 2e-4, worst


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip_entry():
    import __graft_entry__ as g
    g.dryrun_multichip(8)
