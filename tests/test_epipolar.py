import numpy as np
import jax.numpy as jnp

from visual_odometry_tpu.ops import epipolar
from visual_odometry_tpu.utils import synthetic


def _small_pose(rng, scale=0.25):
    from visual_odometry_tpu.ops import se3
    import jax.numpy as j

    v = rng.uniform(-scale, scale, 6).astype(np.float32)
    return np.array(se3.v2t_euler(j.asarray(v)))


def _run_scene(seed, n=1000):
    from visual_odometry_tpu.ops.camera import project_points

    rng = np.random.default_rng(seed)
    world = synthetic.generate_points3d(rng, n)
    w1 = _small_pose(rng)
    w2 = _small_pose(rng)
    cam = synthetic.default_camera()
    p1, v1 = project_points(synthetic.default_camera(w1), jnp.asarray(world))
    p2, v2 = project_points(synthetic.default_camera(w2), jnp.asarray(world))
    p1, p2 = np.array(p1), np.array(p2)
    corr_valid = np.array(v1) & np.array(v2)
    x12_gt = (w2 @ np.linalg.inv(w1)).astype(np.float32)
    n_slots = n
    idx = jnp.arange(n_slots, dtype=jnp.int32)
    mask1 = jnp.asarray((p1 != -1).any(axis=1))
    mask2 = jnp.asarray((p2 != -1).any(axis=1))
    x_est = epipolar.estimate_transform(
        cam.camera_matrix,
        idx,
        idx,
        jnp.asarray(corr_valid),
        jnp.asarray(p1),
        jnp.asarray(p2),
        mask1,
        mask2,
    )
    return np.array(x_est), x12_gt, corr_valid


def test_normalize_matches_reference_convention(rng):
    pts = rng.uniform(0, 100, (50, 2)).astype(np.float32)
    mask = np.ones(50, bool)
    normed, t = epipolar.normalize_points(jnp.asarray(pts), jnp.asarray(mask))
    # T applied to homogeneous originals reproduces the normalized coords.
    hom = np.concatenate([pts, np.ones((50, 1), np.float32)], axis=1)
    via_t = hom @ np.array(t).T
    np.testing.assert_allclose(np.array(normed), via_t[:, :2], atol=1e-5)
    assert np.array(normed).max() <= 1.0 + 1e-5


def test_recovers_rotation_and_translation_direction():
    # Mirrors the acceptance criterion of initialization_test.cpp:27-40:
    # R matches, t matches up to (positive) scale.
    ok = 0
    for seed in range(5):
        x_est, x_gt, corr_valid = _run_scene(seed)
        assert corr_valid.sum() >= 10
        r_err = np.abs(x_est[:3, :3] - x_gt[:3, :3]).max()
        t_est, t_gt = x_est[:3, 3], x_gt[:3, 3]
        cos = np.dot(t_est, t_gt) / (np.linalg.norm(t_est) * np.linalg.norm(t_gt) + 1e-12)
        if r_err < 1e-3 and cos > 0.999:
            ok += 1
    assert ok >= 4


def test_identity_when_no_votes():
    cam = synthetic.default_camera()
    n = 16
    idx = jnp.arange(n, dtype=jnp.int32)
    zeros = jnp.zeros((n, 2), jnp.float32)
    none = jnp.zeros((n,), bool)
    x = epipolar.estimate_transform(
        cam.camera_matrix, idx, idx, none, zeros, zeros, none, none
    )
    np.testing.assert_allclose(np.array(x), np.eye(4), atol=1e-5)


def test_homography_residuals_separate_degenerate_pairs():
    """Pure-rotation pairs score ~0; translated pairs score large.

    The scorer backs parallel/posegraph's bootstrap-pair selection: a
    pure-rotation pair is exactly homography-explained (degenerate for the
    8-point translation), a translated pair over a non-planar scene is not.
    """
    from visual_odometry_tpu.ops import se3
    from visual_odometry_tpu.ops.camera import project_points

    rng = np.random.default_rng(3)
    n = 256
    world = np.stack(
        [rng.uniform(-1.5, 1.5, n), rng.uniform(-1.2, 1.2, n),
         rng.uniform(2.0, 6.0, n)], axis=1,
    ).astype(np.float32)
    cam = synthetic.default_camera()
    p0, m0 = project_points(cam, jnp.asarray(world))

    rot_only = np.array(
        se3.v2t_euler(jnp.float32([0.0, 0.0, 0.0, 0.03, -0.02, 0.04]))
    )
    translated = np.array(
        se3.v2t_euler(jnp.float32([0.3, -0.1, 0.2, 0.03, -0.02, 0.04]))
    )
    idx = jnp.arange(n, dtype=jnp.int32)

    def med(pose):
        p1, m1 = project_points(synthetic.default_camera(pose), jnp.asarray(world))
        valid = jnp.asarray(np.array(m0) & np.array(m1))
        res, ok = epipolar.homography_transfer_residuals(
            idx, idx, valid, p0, p1, m0, m1
        )
        r, o = np.array(res), np.array(ok)
        assert o.sum() >= 8
        return np.median(r[o])

    med_rot = med(rot_only)
    med_tr = med(translated)
    assert med_rot < 1e-4           # homography fits exactly
    assert med_tr > 10 * max(med_rot, 1e-6)  # real parallax resists H
