import numpy as np
import jax.numpy as jnp

from visual_odometry_tpu.ops import triangulation
from visual_odometry_tpu.utils import synthetic


def test_recovers_synthetic_points(rng):
    world, w1, _, p1, p2, corr_valid, x12 = synthetic.two_view_scene(rng, 3000)
    pts, ok = triangulation.triangulate_pairs(
        jnp.asarray(np.array(synthetic.default_camera().camera_matrix)),
        jnp.asarray(x12),
        jnp.asarray(p1),
        jnp.asarray(p2),
        jnp.asarray(corr_valid),
    )
    ok = np.array(ok)
    assert ok.sum() > 30
    # Triangulated points are in camera-1 coordinates.
    expected = world @ w1[:3, :3].T + w1[:3, 3]
    err = np.linalg.norm(np.array(pts)[ok] - expected[ok], axis=1)
    assert np.median(err) < 1e-2
    # Invalid correspondences are masked out.
    assert not ok[~corr_valid].any()


def test_behind_camera_rejected():
    # Two cameras looking at +z; a point behind both rays' origins.
    k = jnp.eye(3)
    x12 = jnp.eye(4).at[:3, 3].set(jnp.array([1.0, 0.0, 0.0]))  # pure baseline
    # Rays pointing forward triangulate in front:
    p_front, ok_front = triangulation.triangulate_pairs(
        k, x12, jnp.array([[0.0, 0.0]]), jnp.array([[0.0, 0.0]]), jnp.array([True])
    )
    del p_front
    # A geometry whose ray intersection needs a negative ray parameter:
    # cam-2 origin is at [-1, 0, 0] in cam-1 coords, rays (u,0,1) meet at
    # s = -1/(u1 - u2) which is negative when u1 > u2.
    _, ok_behind = triangulation.triangulate_pairs(
        k,
        x12,
        jnp.array([[2.0, 0.0]]),
        jnp.array([[-2.0, 0.0]]),
        jnp.array([True]),
    )
    assert not bool(ok_behind[0])
    del ok_front


def test_masks_propagate(rng):
    world, _, _, p1, p2, corr_valid, x12 = synthetic.two_view_scene(rng, 128)
    cam = synthetic.default_camera()
    all_false = jnp.zeros_like(jnp.asarray(corr_valid))
    _, ok = triangulation.triangulate_pairs(
        cam.camera_matrix, jnp.asarray(x12), jnp.asarray(p1), jnp.asarray(p2), all_false
    )
    assert not np.array(ok).any()
