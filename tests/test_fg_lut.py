import jax.numpy as jnp
import numpy as np

from nero_tpu.ops.fg_lut import compute_fg_lut, fg_lookup


def test_fg_lut_properties():
    lut = compute_fg_lut(res=64, n_samples=256)
    assert lut.shape == (64, 64, 2)
    A, B = lut[..., 0], lut[..., 1]
    assert np.all(np.isfinite(lut))
    assert A.min() >= 0 and B.min() >= 0
    # near-mirror, head-on: F*G integrates to ~(1, 0): scale ~1, bias small
    assert A[0, -1] > 0.9 and B[0, -1] < 0.1
    # energy bound: F0*A + B <= ~1 everywhere for F0=1
    assert (A + B).max() < 1.15


def test_fg_lookup_bilinear():
    lut = jnp.asarray(np.stack([np.arange(4)[:, None].repeat(4, 1),
                                np.arange(4)[None, :].repeat(4, 0)], -1).astype(np.float32))
    # rows indexed by roughness, cols by NoV; texel centres at (i+0.5)/4
    out = np.asarray(fg_lookup(lut, jnp.asarray([[0.375]]), jnp.asarray([[0.125]])))
    np.testing.assert_allclose(out[0], [0.0, 1.0], atol=1e-6)  # exact texel (row0, col1)
    # halfway between col 1 and 2
    out2 = np.asarray(fg_lookup(lut, jnp.asarray([[0.5]]), jnp.asarray([[0.125]])))
    np.testing.assert_allclose(out2[0], [0.0, 1.5], atol=1e-6)
    # clamped at the boundary
    out3 = np.asarray(fg_lookup(lut, jnp.asarray([[1.0]]), jnp.asarray([[1.0]])))
    np.testing.assert_allclose(out3[0], [3.0, 3.0], atol=1e-6)
