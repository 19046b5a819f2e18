import jax
import jax.numpy as jnp
import numpy as np

from nero_tpu.ops.sample_pdf import sample_pdf


def test_uniform_weights_deterministic():
    bins = jnp.linspace(0.0, 1.0, 9)[None, :].repeat(3, axis=0)
    weights = jnp.ones((3, 8))
    s = np.asarray(sample_pdf(bins, weights, 16, key=None))
    assert s.shape == (3, 16)
    # uniform pdf -> samples are the mid-quantiles of [0,1]
    expected = np.linspace(0.5 / 16, 1 - 0.5 / 16, 16)
    np.testing.assert_allclose(s[0], expected, atol=1e-4)


def test_concentrated_weights():
    bins = jnp.linspace(0.0, 1.0, 9)[None, :]
    weights = jnp.zeros((1, 8)).at[0, 3].set(1.0)  # all mass in [0.375, 0.5]
    s = np.asarray(sample_pdf(bins, weights, 8, key=None))
    assert (s >= 0.37).all() and (s <= 0.51).all()


def test_random_sampling_distribution():
    bins = jnp.linspace(0.0, 1.0, 5)[None, :]
    weights = jnp.asarray([[1.0, 0.0, 0.0, 1.0]])
    s = np.asarray(sample_pdf(bins, weights, 4096, key=jax.random.PRNGKey(0)))
    frac_lo = np.mean(s < 0.25)
    frac_hi = np.mean(s > 0.75)
    assert abs(frac_lo - 0.5) < 0.05 and abs(frac_hi - 0.5) < 0.05
    assert np.mean((s > 0.26) & (s < 0.74)) < 0.01


def test_monotone_in_u():
    bins = jnp.sort(jax.random.uniform(jax.random.PRNGKey(1), (2, 10)), axis=-1)
    weights = jax.random.uniform(jax.random.PRNGKey(2), (2, 9))
    s = np.asarray(sample_pdf(bins, weights, 32, key=None))
    assert (np.diff(s, axis=-1) >= -1e-6).all()
