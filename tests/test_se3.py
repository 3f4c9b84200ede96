import numpy as np
import jax.numpy as jnp

from visual_odometry_tpu.ops import se3


def test_rotation_axes_match_manual():
    a = 0.37
    rx = np.array(se3.rotation_x(jnp.float32(a)))
    ry = np.array(se3.rotation_y(jnp.float32(a)))
    rz = np.array(se3.rotation_z(jnp.float32(a)))
    c, s = np.cos(a), np.sin(a)
    np.testing.assert_allclose(rx, [[1, 0, 0], [0, c, -s], [0, s, c]], atol=1e-6)
    np.testing.assert_allclose(ry, [[c, 0, s], [0, 1, 0], [-s, 0, c]], atol=1e-6)
    np.testing.assert_allclose(rz, [[c, -s, 0], [s, c, 0], [0, 0, 1]], atol=1e-6)


def test_euler_composition_order():
    # R = Rx @ Ry @ Rz, matching utils.h:61-67.
    ang = jnp.array([0.1, -0.2, 0.3], jnp.float32)
    r = se3.euler_to_rotation(ang)
    expected = (
        se3.rotation_x(ang[0]) @ se3.rotation_y(ang[1]) @ se3.rotation_z(ang[2])
    )
    np.testing.assert_allclose(np.array(r), np.array(expected), atol=1e-7)
    # Proper rotation.
    np.testing.assert_allclose(np.array(r @ r.T), np.eye(3), atol=1e-6)


def test_v2t_euler_and_inverse():
    v = jnp.array([1.0, -2.0, 3.0, 0.1, 0.2, -0.3], jnp.float32)
    t = se3.v2t_euler(v)
    assert t.shape == (4, 4)
    np.testing.assert_allclose(np.array(t[:3, 3]), [1.0, -2.0, 3.0], atol=1e-6)
    np.testing.assert_allclose(np.array(t[3]), [0, 0, 0, 1], atol=0)
    inv = se3.inverse(t)
    np.testing.assert_allclose(np.array(t @ inv), np.eye(4), atol=1e-5)


def test_v2t_euler_batched():
    v = jnp.stack(
        [jnp.array([1.0, 0, 0, 0.1, 0, 0]), jnp.array([0, 1.0, 0, 0, 0.2, 0])]
    )
    t = se3.v2t_euler(v)
    assert t.shape == (2, 4, 4)
    np.testing.assert_allclose(np.array(t[0]), np.array(se3.v2t_euler(v[0])))


def test_transform_points():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(17, 3)).astype(np.float32)
    pose = se3.v2t_euler(jnp.array([0.5, -1.0, 2.0, 0.3, -0.2, 0.1], jnp.float32))
    out = np.array(se3.transform_points(pose, jnp.asarray(pts)))
    expected = pts @ np.array(pose)[:3, :3].T + np.array(pose)[:3, 3]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_skew():
    v = jnp.array([1.0, 2.0, 3.0])
    m = np.array(se3.skew(v))
    np.testing.assert_allclose(m, [[0, -3, 2], [3, 0, -1], [-2, 1, 0]], atol=0)
    w = np.array([0.3, -0.4, 0.5], np.float32)
    np.testing.assert_allclose(m @ w, np.cross([1, 2, 3], w), atol=1e-6)
