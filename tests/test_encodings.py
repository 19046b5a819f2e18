import jax.numpy as jnp
import numpy as np
from scipy.special import sph_harm_y

from nero_tpu.utils.encodings import (expected_sin, ide_dim, integrated_dir_encode,
                                      integrated_pos_encode, positional_encode,
                                      positional_encode_dim)


def test_pe_dim_and_order():
    x = jnp.asarray([[0.5, -0.25, 1.0]])
    out = positional_encode(x, 6)
    assert out.shape == (1, positional_encode_dim(3, 6))
    assert positional_encode_dim(3, 6) == 3 + 3 * 2 * 6
    # identity channels first
    np.testing.assert_allclose(np.asarray(out[0, :3]), [0.5, -0.25, 1.0], atol=1e-6)
    # then sin(2^0 x), cos(2^0 x)
    np.testing.assert_allclose(np.asarray(out[0, 3:6]), np.sin([0.5, -0.25, 1.0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0, 6:9]), np.cos([0.5, -0.25, 1.0]), atol=1e-6)
    # last octave 2^5
    np.testing.assert_allclose(np.asarray(out[0, -3:]), np.cos(np.asarray([0.5, -0.25, 1.0]) * 32), atol=1e-5)


def test_ide_dim():
    assert ide_dim(5) == 72  # (2+3+5+9+17) * 2


def _dirs_from_angles(theta, phi):
    return np.asarray([np.sin(theta) * np.cos(phi),
                       np.sin(theta) * np.sin(phi),
                       np.cos(theta)], np.float64)


def test_ide_matches_spherical_harmonics():
    """With kappa_inv=0 the IDE components are exactly Y_l^m (Ref-NeRF eq. 6-8)."""
    ml_list = []
    for i in range(5):
        l = 2 ** i
        for m in range(l + 1):
            ml_list.append((m, l))

    rng = np.random.RandomState(3)
    for _ in range(4):
        theta = rng.uniform(0.1, np.pi - 0.1)
        phi = rng.uniform(0, 2 * np.pi)
        d = _dirs_from_angles(theta, phi)
        out = np.asarray(integrated_dir_encode(jnp.asarray(d[None], jnp.float32),
                                               jnp.zeros((1, 1)), 5))[0]
        n = len(ml_list)
        for idx, (m, l) in enumerate(ml_list):
            if l > 4:   # float32 Vandermonde gets rough at l=8,16; check low degrees
                continue
            ref = sph_harm_y(l, m, theta, phi)  # scipy: (degree, order, polar, azimuth)
            np.testing.assert_allclose(out[idx], ref.real, atol=2e-4)
            np.testing.assert_allclose(out[n + idx], ref.imag, atol=2e-4)


def test_ide_attenuation():
    """Higher kappa_inv (rougher) shrinks high-degree components."""
    d = jnp.asarray([[0.3, -0.5, 0.81]])
    d = d / jnp.linalg.norm(d)
    sharp = np.asarray(integrated_dir_encode(d, jnp.zeros((1, 1))))
    rough = np.asarray(integrated_dir_encode(d, jnp.ones((1, 1))))
    # degree-16 components (last 17 of the real part) should be crushed
    hi_sharp = np.abs(sharp[0, 19:36]).max()
    hi_rough = np.abs(rough[0, 19:36]).max()
    assert hi_rough < hi_sharp * 1e-10
    # degree-1 components only mildly attenuated: exp(-1) each
    np.testing.assert_allclose(rough[0, :2], sharp[0, :2] * np.exp(-1.0), rtol=1e-4)


def test_ipe():
    mean = jnp.asarray([[0.3, -0.2]])
    var = jnp.zeros((1, 2))
    out = integrated_pos_encode(mean, var, 0, 6)
    assert out.shape == (1, 2 * 2 * 6)
    # zero variance -> plain sin of scaled means, then cos block
    np.testing.assert_allclose(np.asarray(out[0, :2]), np.sin([0.3, -0.2]), atol=1e-6)
    # large variance -> everything to zero
    out2 = integrated_pos_encode(mean, 100 * jnp.ones((1, 2)), 0, 6)
    assert np.abs(np.asarray(out2)).max() < 1e-6


def test_expected_sin():
    np.testing.assert_allclose(np.asarray(expected_sin(jnp.asarray(0.5), jnp.asarray(0.0))),
                               np.sin(0.5), atol=1e-6)
