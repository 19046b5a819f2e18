"""shade_top_k importance-compacted shading: branch gating + correctness."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nero_tpu.render.shape import (init_shape_params, render,
                                   shape_config_from_dict)


@pytest.fixture(scope="module")
def setup():
    scfg = shape_config_from_dict({
        "n_samples": 8, "n_importance": 8, "up_sample_steps": 2,
        "n_bg_samples": 4, "train_ray_num": 32, "occ_loss_max_pn": 64,
        "occ_loss_step": 100, "shade_top_k": 8, "bf16_hidden": False,
    })
    params = init_shape_params(jax.random.PRNGKey(0), scfg)
    n = 32
    ang = jnp.linspace(-0.2, 0.2, n)
    rays_o = jnp.stack([jnp.zeros(n), jnp.zeros(n), jnp.full(n, -2.0)], -1)
    rays_d = jnp.stack([jnp.sin(ang), jnp.zeros(n), jnp.cos(ang)], -1)
    batch = {
        "rays_o": rays_o, "rays_d": rays_d,
        "near": jnp.full((n, 1), 1.0), "far": jnp.full((n, 1), 3.0),
        "hp": jnp.tile(jnp.eye(3, 4)[None], (n, 1, 1)),
        "fg": jnp.zeros((64, 64, 2)),
    }
    return scfg, params, batch


_JITTED = {}


def _run(scfg, params, b, step):
    # one jitted program per scfg, step as a traced arg — avoids retracing
    # the render grad graph for every (scfg, step) combination
    if scfg not in _JITTED:
        def loss(p, step_t):
            out = render(p, scfg, b["fg"], b["rays_o"], b["rays_d"], b["near"],
                         b["far"], b["hp"], step_t,
                         key=jax.random.PRNGKey(5), is_train=True)
            return (jnp.sum(out["ray_rgb"]) + out["loss_occ"][0] * 0.1
                    + out["gradient_error"][0]), out
        _JITTED[scfg] = jax.jit(jax.value_and_grad(loss, has_aux=True))
    (val, out), grads = _JITTED[scfg](params, jnp.asarray(step))
    return val, out, grads


def test_compact_inactive_before_occ_step_matches_full(setup):
    """Pre-occ-phase steps must be bit-identical to the full-lattice path."""
    scfg, params, b = setup
    _, out_k, _ = _run(scfg, params, b, step=50)
    _, out_full, _ = _run(scfg._replace(shade_top_k=0), params, b, step=50)
    np.testing.assert_allclose(np.asarray(out_k["ray_rgb"]),
                               np.asarray(out_full["ray_rgb"]), atol=1e-6)


def test_compact_post_occ_close_and_differentiable(setup):
    """Post-occ the compacted render approximates full shading and all
    gradients stay finite (the one-hot gather path is differentiated)."""
    scfg, params, b = setup
    _, out_k, grads = _run(scfg, params, b, step=200)
    out_full = _run(scfg._replace(shade_top_k=0), params, b, step=200)[1]
    # k=8/32 on an untrained (spread-weight) field drops real mass — only a
    # ballpark check here; on converged geometry the top-k tail mass is
    # <=7.5e-4 (see ShapeConfig docstring)
    diff = np.abs(np.asarray(out_k["ray_rgb"]) - np.asarray(out_full["ray_rgb"]))
    assert diff.mean() < 0.2, diff.mean()
    for leaf in jax.tree_util.tree_leaves(grads):
        assert bool(jnp.all(jnp.isfinite(leaf)))
    # occ loss computed from the compacted candidate set stays in family
    assert abs(float(out_k["loss_occ"][0]) - float(out_full["loss_occ"][0])) < 0.05


@pytest.mark.slow  # compact shading is an off-by-default flag; the two quick
# tests above already cover inactive-parity and post-occ differentiability
def test_compact_near_full_k_is_near_exact(setup):
    """Dropping only the single smallest-weight sample (k=31 of 32) must
    change the render by at most that sample's weight — the sharp check that
    selection/gather/composite are wired right."""
    scfg, params, b = setup
    out_k = _run(scfg._replace(shade_top_k=31), params, b, step=200)[1]
    out_full = _run(scfg._replace(shade_top_k=0), params, b, step=200)[1]
    diff = np.abs(np.asarray(out_k["ray_rgb"]) - np.asarray(out_full["ray_rgb"]))
    assert diff.max() < 0.06, diff.max()
    assert diff.mean() < 0.02, diff.mean()
