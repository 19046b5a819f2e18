import os

import jax
import jax.numpy as jnp
import numpy as np

from nero_tpu.core.checkpoint import load_checkpoint, save_checkpoint


def test_roundtrip(tmp_path):
    params = {"a": [{"v": jnp.ones((3, 4)), "g": jnp.full((1, 4), 2.0)}],
              "b": {"variance": jnp.asarray(0.3)}}
    opt = {"mu": {"a": [{"v": jnp.zeros((3, 4)), "g": jnp.zeros((1, 4))}],
                  "b": {"variance": jnp.asarray(0.0)}},
           "count": jnp.asarray(7, jnp.int32)}
    path = str(tmp_path / "model.npz")
    save_checkpoint(path, 123, 31.5, params, opt)
    step, best, p2, o2 = load_checkpoint(path, params, opt)
    assert step == 123 and abs(best - 31.5) < 1e-9
    np.testing.assert_allclose(np.asarray(p2["a"][0]["g"]), 2.0)
    assert int(o2["count"]) == 7
    assert o2["count"].dtype == jnp.int32


def test_atomic_overwrite(tmp_path):
    params = {"x": jnp.arange(5.0)}
    path = str(tmp_path / "m.npz")
    save_checkpoint(path, 1, 0.0, params)
    save_checkpoint(path, 2, 1.0, params)
    step, best, _, _ = load_checkpoint(path, params)
    assert step == 2
    assert not os.path.exists(path + ".tmp")
