import jax.numpy as jnp
import numpy as np

from nero_tpu.utils.color import (color_map_backward, color_map_forward,
                                  linear_to_srgb, srgb_to_linear)


def test_srgb_roundtrip():
    x = np.linspace(0.0, 1.0, 257).astype(np.float32)
    y = srgb_to_linear(linear_to_srgb(x))
    np.testing.assert_allclose(y, x, atol=2e-5)


def test_srgb_known_values():
    # standard sRGB anchor points
    assert abs(linear_to_srgb(np.float32(0.0))) < 1e-7
    np.testing.assert_allclose(linear_to_srgb(np.asarray(1.0)), 1.0, atol=1e-5)
    np.testing.assert_allclose(linear_to_srgb(np.asarray(0.0031308)),
                               0.0031308 * 323 / 25, atol=1e-6)
    # mid-gray under the (211 x^(5/12) - 11)/200 transfer curve
    np.testing.assert_allclose(linear_to_srgb(np.asarray(0.2158605)),
                               (211 * 0.2158605 ** (5 / 12) - 11) / 200, atol=1e-6)


def test_jnp_matches_np():
    x = np.random.RandomState(0).rand(100).astype(np.float32)
    np.testing.assert_allclose(np.asarray(linear_to_srgb(jnp.asarray(x))),
                               linear_to_srgb(x), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(srgb_to_linear(jnp.asarray(x))),
                               srgb_to_linear(x), atol=1e-5, rtol=1e-5)


def test_color_maps():
    img = np.asarray([[0, 128, 255]], np.uint8)
    f = color_map_forward(img)
    assert f.dtype == np.float32 and f.max() <= 1.0
    back = color_map_backward(f)
    np.testing.assert_array_equal(back, img)
