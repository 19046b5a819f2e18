import jax.numpy as jnp
import numpy as np

from nero_tpu.utils.sphere import (az_el_to_points, get_sphere_intersection,
                                   near_far_from_sphere, offset_points_to_sphere,
                                   sample_sphere)


def test_sample_sphere_covers():
    # begin_elevation=0 yields the upper hemisphere (z >= 0), Fibonacci-spiralled
    az, el = sample_sphere(512, 0)
    assert len(az) == 512
    pts = az_el_to_points(az, el)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=-1), 1.0, atol=1e-6)
    assert (pts[:, 2] >= -1e-9).all()
    assert abs(pts[:, :2].mean(0)).max() < 0.06  # azimuthally uniform
    np.testing.assert_allclose(pts[:, 2].mean(), 0.5, atol=0.02)  # cos-uniform in z


def test_sphere_intersection():
    # from origin along +x: distance 1
    d = np.asarray(get_sphere_intersection(jnp.zeros((1, 3)),
                                           jnp.asarray([[1.0, 0, 0]])))
    np.testing.assert_allclose(d, [[1.0]], atol=1e-3)
    # from (0.5,0,0) along +x: distance 0.5
    d2 = np.asarray(get_sphere_intersection(jnp.asarray([[0.5, 0, 0]]),
                                            jnp.asarray([[1.0, 0, 0]])))
    np.testing.assert_allclose(d2, [[0.5]], atol=1e-3)


def test_offset_points():
    pts = jnp.asarray([[2.0, 0, 0], [0.5, 0, 0]])
    out = np.asarray(offset_points_to_sphere(pts))
    np.testing.assert_allclose(out[0], [0.999, 0, 0], atol=1e-5)
    np.testing.assert_allclose(out[1], [0.5, 0, 0], atol=1e-6)


def test_near_far():
    o = jnp.asarray([[0.0, 0.0, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    near, far = near_far_from_sphere(o, d)
    np.testing.assert_allclose(np.asarray(near), [[2.0]], atol=1e-5)
    np.testing.assert_allclose(np.asarray(far), [[4.0]], atol=1e-5)
