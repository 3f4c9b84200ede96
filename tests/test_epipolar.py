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


def _parallax_pose_pair(rng):
    """Two camera poses with real baseline: random draws can land on a
    near-pure-rotation pair (||t|| ~ 0.007 at seed 0), where E is rank-
    deficient by construction and no estimator can recover it."""
    from visual_odometry_tpu.ops import se3
    import jax.numpy as j

    w1 = np.eye(4, dtype=np.float32)
    v = np.float32([0.3, -0.15, 0.2, 0.05, -0.04, 0.06])
    v[:3] += rng.uniform(-0.05, 0.05, 3).astype(np.float32)
    w2 = np.array(se3.v2t_euler(j.asarray(v)))
    return w1, w2


def test_estimate_essential_matches_ground_truth(rng):
    """estimate_essential (epipolar_utils.cpp:9-46) recovers E up to scale
    on a clean synthetic scene."""
    from visual_odometry_tpu.ops.camera import project_points

    world = synthetic.generate_points3d(rng, 600)
    w1, w2 = _parallax_pose_pair(rng)
    cam = synthetic.default_camera()
    p1, v1 = project_points(synthetic.default_camera(w1), jnp.asarray(world))
    p2, v2 = project_points(synthetic.default_camera(w2), jnp.asarray(world))
    corr_valid = np.array(v1) & np.array(v2)
    assert corr_valid.sum() >= 8
    x12_gt = (w2 @ np.linalg.inv(w1)).astype(np.float32)

    idx = jnp.arange(600, dtype=jnp.int32)
    e_est = np.array(
        epipolar.estimate_essential(
            cam.camera_matrix, idx, idx, jnp.asarray(corr_valid), p1, p2
        )
    )
    e_gt = np.array(epipolar.transform_to_essential(jnp.asarray(x12_gt)))
    e_est /= np.linalg.norm(e_est)
    e_gt /= np.linalg.norm(e_gt)
    err = min(np.abs(e_est - e_gt).max(), np.abs(e_est + e_gt).max())
    assert err < 2e-3, err


def test_estimate_essential_feeds_transform_pair(rng):
    """The direct-E path composes with the candidate decomposition: the
    cheirality vote on estimate_essential's E recovers the same rotation
    as the F-based estimate_transform."""
    from visual_odometry_tpu.ops import se3, triangulation
    from visual_odometry_tpu.ops.camera import project_points

    world = synthetic.generate_points3d(rng, 600)
    w1, w2 = _parallax_pose_pair(rng)
    cam = synthetic.default_camera()
    p1, v1 = project_points(synthetic.default_camera(w1), jnp.asarray(world))
    p2, v2 = project_points(synthetic.default_camera(w2), jnp.asarray(world))
    corr_valid = jnp.asarray(np.array(v1) & np.array(v2))
    x12_gt = (w2 @ np.linalg.inv(w1)).astype(np.float32)
    idx = jnp.arange(600, dtype=jnp.int32)

    e = epipolar.estimate_essential(cam.camera_matrix, idx, idx, corr_valid, p1, p2)
    r1, t1, r2, t2 = epipolar.essential_to_transform_pair(e)
    best_err, best_votes = np.inf, -1
    for r, t in ((r1, t1), (r1, -t1), (r2, t2), (r2, -t2)):
        x = np.array(se3.pose_from_rt(r, t))
        _, ok = triangulation.triangulate_correspondences(
            cam.camera_matrix, jnp.asarray(x), idx, idx, corr_valid, p1, p2
        )
        votes = int(np.array(ok).sum())
        if votes > best_votes:
            best_votes = votes
            best_err = np.abs(x[:3, :3] - x12_gt[:3, :3]).max()
    assert best_votes > 0
    assert best_err < 5e-3, best_err


def test_normalize_gauss_whitens(rng):
    """normalizeGauss (epipolar_utils.cpp:67-101): valid points map to zero
    mean / identity covariance; T reproduces the mapping; masked slots
    pass through untouched."""
    pts = rng.normal([50.0, 30.0], [20.0, 5.0], (200, 2)).astype(np.float32)
    pts[:, 1] += 0.3 * pts[:, 0]  # correlate axes
    mask = np.ones(200, bool)
    mask[::7] = False
    garbage = pts.copy()
    garbage[~mask] = -1.0  # reference's invalid sentinel
    out, t = epipolar.normalize_points_gauss(
        jnp.asarray(garbage), jnp.asarray(mask)
    )
    out, t = np.array(out), np.array(t)
    valid = out[mask]
    np.testing.assert_allclose(valid.mean(axis=0), 0.0, atol=1e-4)
    cov = np.cov(valid.T, ddof=1)
    np.testing.assert_allclose(cov, np.eye(2), atol=1e-3)
    # T maps homogeneous originals to the whitened coords.
    hom = np.concatenate([garbage[mask], np.ones((mask.sum(), 1), np.float32)], 1)
    np.testing.assert_allclose(hom @ t.T[:, :2], valid, atol=1e-4)
    # Masked slots unchanged (reference leaves invalid sentinels alone).
    np.testing.assert_array_equal(out[~mask], garbage[~mask])


def test_normalize_gauss_degenerate_falls_back_to_identity():
    pts = np.tile(np.float32([[3.0, 4.0]]), (10, 1))  # zero covariance
    out, t = epipolar.normalize_points_gauss(
        jnp.asarray(pts), jnp.ones(10, bool)
    )
    np.testing.assert_allclose(np.array(t), np.eye(3), atol=0)
    assert np.isfinite(np.array(out)).all()
