import numpy as np

from visual_odometry_tpu.utils import evaluation as ev


def test_upper_median_matches_nth_element():
    # std::nth_element at n/2 picks the upper middle for even sizes.
    assert ev.upper_median(np.array([1.0, 2.0, 3.0, 4.0])) == 3.0
    assert ev.upper_median(np.array([5.0, 1.0, 3.0])) == 3.0
    assert ev.upper_median(np.array([2.0, 1.0])) == 2.0


def test_relative_errors_zero_for_identical():
    rng = np.random.default_rng(0)
    from visual_odometry_tpu.utils.synthetic import generate_pose

    poses = np.stack([generate_pose(rng) for _ in range(6)])
    orient, ratio = ev.relative_errors(poses, poses)
    np.testing.assert_allclose(orient, 0.0, atol=1e-5)
    np.testing.assert_allclose(ratio, 1.0, atol=1e-5)


def test_scale_correction():
    rng = np.random.default_rng(1)
    from visual_odometry_tpu.utils.synthetic import generate_pose

    gt = np.stack([generate_pose(rng) for _ in range(8)])
    est = gt.copy()
    est[:, :3, 3] *= 2.0  # uniformly double scale
    res = ev.evaluate(est, gt)
    np.testing.assert_allclose(res.scale, 0.5, rtol=1e-5)
    assert res.rmse_position < 1e-4


def test_ratio_inf_on_stationary_gt_is_robust():
    rng = np.random.default_rng(2)
    from visual_odometry_tpu.utils.synthetic import generate_pose

    gt = np.stack([generate_pose(rng) for _ in range(9)])
    gt[3] = gt[2]  # stationary pair -> ||t_gt|| == 0 -> inf ratio
    est = gt.copy()
    est[:, :3, 3] *= 2.0
    est[3] = est[2]
    res = ev.evaluate(est, gt)
    assert np.isfinite(res.scale)


def test_map_matching_exact_appearance():
    world_apps = np.arange(40, dtype=np.float32).reshape(4, 10)
    world_pts = np.ones((4, 3), np.float32)
    map_apps = world_apps[[2, 0]].copy()
    map_pts = np.full((2, 3), 2.0, np.float32)
    mi, wi = ev.match_map_to_world(map_pts, map_apps, world_pts, world_apps)
    np.testing.assert_array_equal(mi, [0, 1])
    np.testing.assert_array_equal(wi, [2, 0])
    # A perturbed appearance must NOT match (exact equality).
    map_apps[0, 0] += 1e-6
    mi, wi = ev.match_map_to_world(map_pts, map_apps, world_pts, world_apps)
    np.testing.assert_array_equal(wi, [0])
