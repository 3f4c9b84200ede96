"""End-to-end pipeline tests on the reference example dataset.

The acceptance criteria come straight from BASELINE.md: reproduce (or beat)
e_theta mean ~5.3e-6 and RMSE_pos ~0.1453 after median-ratio scale
correction on example_data.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from visual_odometry_tpu import apps
from visual_odometry_tpu.utils import evaluation as ev
from visual_odometry_tpu.utils import io


@pytest.fixture(scope="module")
def vo_run(tmp_path_factory):
    data_dir = "/root/reference/example_data/data"
    if not os.path.isdir(data_dir):
        pytest.skip("reference example dataset not available")
    out = str(tmp_path_factory.mktemp("vo_out"))
    trajectory, map_state, outs, elapsed = apps.run_vo_complete(
        data_dir, out, verbose=False
    )
    return data_dir, out, trajectory, map_state, outs


def test_beats_reference_accuracy(vo_run):
    data_dir, out, *_ = vo_run
    res = apps.run_evaluation(data_dir, out, verbose=False)
    finite = np.isfinite(res.orientation_errors)
    e_theta = np.abs(res.orientation_errors[finite]).mean()
    # Reference baselines (BASELINE.md): e_theta 5.31e-6, RMSE_pos 0.1453,
    # RMSE_map 0.1841, scale 0.47337. Measured here (2026-08): e_theta
    # 2.71e-6, RMSE_pos 0.1409, RMSE_map 0.1285 — the guards sit between
    # the measured values and the reference baselines, so ANY published
    # metric regressing past the reference fails this test (a ~10% drift
    # would previously have shipped under a green CI).
    assert e_theta < 5.3e-6
    assert res.rmse_position < 0.145
    assert res.rmse_map is not None and res.rmse_map < 0.184
    assert abs(res.scale - 0.47337) < 0.005
    assert res.n_map_matched > 300


def test_trajectory_shape_and_start(vo_run):
    _, _, trajectory, _, _ = vo_run
    assert trajectory.shape == (121, 4, 4)
    np.testing.assert_allclose(trajectory[0], np.eye(4), atol=0)
    # Every pose is a proper rigid transform.
    rs = trajectory[:, :3, :3]
    rtr = np.einsum("fji,fjk->fik", rs, rs)
    np.testing.assert_allclose(rtr, np.tile(np.eye(3), (121, 1, 1)), atol=1e-4)


def test_outputs_file_contract(vo_run):
    data_dir, out, *_ = vo_run
    apps.run_evaluation(data_dir, out, verbose=False)
    for name in [
        "world.txt",
        "map.txt",
        "map_appearances.txt",
        "trajectory_gt.txt",
        "trajectory_est_complete.txt",
        "trajectory_est_data.txt",
        "out_performance.txt",
        "map_corrected.txt",
        "arrows.txt",
        "world_pruned.txt",
    ]:
        assert os.path.exists(os.path.join(out, name)), name
    # trajectory_est_data.txt must parse back as 4-line pose blocks.
    poses = io.load_est_trajectory(os.path.join(out, "trajectory_est_data.txt"))
    assert poses.shape == (121, 4, 4)


def test_per_frame_diagnostics(vo_run):
    *_, outs = vo_run
    matches = np.asarray(outs.num_matches)
    inliers = np.asarray(outs.num_inliers)
    assert matches.shape == (119,)
    assert (matches > 8).all()
    assert (inliers > 0).all()


def test_refined_pipeline_beats_baseline_robustly(tmp_path):
    """Tracking + BA refinement must beat EVERY reference metric with margin
    (this is the framework's flagship configuration)."""
    data_dir = "/root/reference/example_data/data"
    if not os.path.isdir(data_dir):
        pytest.skip("reference example dataset not available")
    from visual_odometry_tpu.utils.config import ACCURATE_CONFIG

    out = str(tmp_path)
    apps.run_vo_complete(data_dir, out, ACCURATE_CONFIG, verbose=False)
    res = apps.run_evaluation(data_dir, out, verbose=False)
    finite = np.isfinite(res.orientation_errors)
    e_theta = np.abs(res.orientation_errors[finite]).mean()
    assert e_theta < 3e-6          # baseline 5.31e-6
    assert res.rmse_position < 0.145  # baseline 0.1453
    assert res.rmse_map < 0.15        # baseline 0.1841


def test_known_da_pipeline(tmp_path):
    data_dir = "/root/reference/example_data/data"
    if not os.path.isdir(data_dir):
        pytest.skip("reference example dataset not available")
    out = str(tmp_path)
    # 100 GN iterations (not the reference's 1000) to keep the test fast;
    # accuracy with perfect DA should still beat the appearance-DA run.
    from visual_odometry_tpu.utils.config import DEFAULT_CONFIG

    apps.run_vo_da_known(data_dir, out, DEFAULT_CONFIG, verbose=False)
    gt_poses = io.gt_poses_se3(
        io.load_trajectory(os.path.join(data_dir, "trajectory.dat"))[1]
    )
    est = io.load_est_trajectory(os.path.join(out, "trajectory_est_data.txt"))
    res = ev.evaluate(est, gt_poses)
    assert res.rmse_position < 0.16


def test_bootstrap_error_on_too_few_correspondences(rng):
    """< 8 matches between the first pair must raise BootstrapError
    (the reference exits, epipolar_utils.cpp:104-108)."""
    import pytest

    from visual_odometry_tpu.models import pipeline
    from visual_odometry_tpu.utils import synthetic
    from visual_odometry_tpu.utils.config import VOConfig

    n = 32
    cfg = VOConfig(n_slots=n, map_capacity=64)
    apps0 = synthetic.generate_appearances(rng, n)
    apps1 = synthetic.generate_appearances(rng, n)  # unrelated: no matches
    pts = rng.uniform(0, 400, (n, 2)).astype(np.float32)
    f0 = pipeline.FrameData(
        jnp.asarray(pts), jnp.asarray(apps0), jnp.ones(n, bool),
        jnp.arange(n, dtype=jnp.int32),
    )
    f1 = pipeline.FrameData(
        jnp.asarray(pts), jnp.asarray(apps1), jnp.ones(n, bool),
        jnp.arange(n, dtype=jnp.int32),
    )
    with pytest.raises(pipeline.BootstrapError):
        pipeline.check_bootstrap(cfg, f0, f1)


def test_bootstrap_warns_on_pure_rotation_pair(rng):
    """A homography-explained (pure-rotation) first pair must surface the
    degeneracy diagnostic as a warning."""
    import pytest

    from visual_odometry_tpu.models import pipeline
    from visual_odometry_tpu.ops import se3
    from visual_odometry_tpu.ops.camera import project_points
    from visual_odometry_tpu.utils import synthetic
    from visual_odometry_tpu.utils.config import VOConfig

    n = 128
    cfg = VOConfig(n_slots=n, map_capacity=256)
    world = np.stack(
        [
            rng.uniform(-1.5, 1.5, n),
            rng.uniform(-1.2, 1.2, n),
            rng.uniform(2.0, 4.0, n),
        ],
        axis=1,
    ).astype(np.float32)
    apps = jnp.asarray(synthetic.generate_appearances(rng, n))
    rot_only = np.array(se3.v2t_euler(jnp.float32([0, 0, 0, 0.0, 0.05, 0.02])))
    uv0, m0 = project_points(synthetic.default_camera(), jnp.asarray(world))
    uv1, m1 = project_points(
        synthetic.default_camera(rot_only), jnp.asarray(world)
    )
    ids = jnp.arange(n, dtype=jnp.int32)
    f0 = pipeline.FrameData(uv0, apps, m0, ids)
    f1 = pipeline.FrameData(uv1, apps, m1, ids)
    with pytest.warns(RuntimeWarning, match="homography-explained"):
        d = pipeline.check_bootstrap(cfg, f0, f1)
    assert float(d.degeneracy_score) < pipeline.DEGENERACY_THRESHOLD
    assert int(d.num_correspondences) >= 8


def test_bootstrap_check_passes_on_real_parallax(rng):
    """A well-conditioned pair passes without raising or warning."""
    import warnings

    from visual_odometry_tpu.models import pipeline
    from visual_odometry_tpu.ops import se3
    from visual_odometry_tpu.ops.camera import project_points
    from visual_odometry_tpu.utils import synthetic
    from visual_odometry_tpu.utils.config import VOConfig

    n = 128
    cfg = VOConfig(n_slots=n, map_capacity=256)
    world = np.stack(
        [
            rng.uniform(-1.5, 1.5, n),
            rng.uniform(-1.2, 1.2, n),
            rng.uniform(2.0, 4.0, n),
        ],
        axis=1,
    ).astype(np.float32)
    apps = jnp.asarray(synthetic.generate_appearances(rng, n))
    moved = np.array(
        se3.v2t_euler(jnp.float32([0.3, 0.1, 0.2, 0.01, 0.02, 0.01]))
    )
    uv0, m0 = project_points(synthetic.default_camera(), jnp.asarray(world))
    uv1, m1 = project_points(synthetic.default_camera(moved), jnp.asarray(world))
    ids = jnp.arange(n, dtype=jnp.int32)
    f0 = pipeline.FrameData(uv0, apps, m0, ids)
    f1 = pipeline.FrameData(uv1, apps, m1, ids)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        d = pipeline.check_bootstrap(cfg, f0, f1)
    assert float(d.degeneracy_score) > pipeline.DEGENERACY_THRESHOLD


def _duplicate_heavy_sequence(rng, n=16, multiplicity=3):
    """Three frames whose appearance matching yields a world-join target with
    the given duplicate multiplicity at the first tracked frame.

    Frame 0 carries ``multiplicity`` identical descriptors (slots 0..m-1 =
    v) and frame 1 carries v exactly once (slot 7), so corr01 maps m source
    lanes onto target 7; frame 2 carries v once so corr12's reference side
    looks target 7 up — the adversarial shape for the fused backend's
    depth-limited first-wins chains (vo_complete.cpp:55-63 semantics).
    Frame valid-counts are arranged so the kd-side selection creates the
    duplicates (frame 1 > frame 0 => frame-0 queries; frame 1 >= frame 2
    => frame-2 queries).
    """
    from visual_odometry_tpu.ops import se3
    from visual_odometry_tpu.ops.camera import project_points
    from visual_odometry_tpu.utils import synthetic

    d = 10
    v = np.zeros(d, np.float32)
    v[0] = 1.0

    def distinct(k):
        a = np.zeros(d, np.float32)
        a[1] = 1.0 + k  # >= 1 apart pairwise, >= 1 from v (radius is 0.1)
        return a

    m = multiplicity
    apps0 = np.zeros((n, d), np.float32)
    apps1 = np.zeros((n, d), np.float32)
    apps2 = np.zeros((n, d), np.float32)
    apps0[:m] = v
    for j in range(m, 10):
        apps0[j] = distinct(j)
    apps1[7] = v
    others1 = [j for j in range(12) if j != 7]
    for k, j in enumerate(others1):
        apps1[j] = distinct(m + k)  # 11 keys: overlaps frame 0's m..9
    apps2[0] = v
    for j in range(1, 11):
        apps2[j] = distinct(m - 1 + j)
    masks = np.zeros((3, n), bool)
    masks[0, :10] = True
    masks[1, :12] = True
    masks[2, :11] = True

    # Real geometry so triangulation does genuine work.
    world = np.stack(
        [rng.uniform(-1.5, 1.5, n), rng.uniform(-1.2, 1.2, n),
         rng.uniform(2.0, 4.0, n)], axis=1,
    ).astype(np.float32)
    pts = []
    for i in range(3):
        pose = np.array(se3.v2t_euler(jnp.float32(
            [0.2 * i, -0.05 * i, 0.1 * i, 0.01 * i, -0.01 * i, 0.005 * i]
        )))
        uv, _ = project_points(synthetic.default_camera(pose), jnp.asarray(world))
        pts.append(np.asarray(uv))
    apps = np.stack([apps0, apps1, apps2])
    return np.stack(pts), apps, masks


def test_fused_join_depth_overflow_raises(rng):
    """A duplicate-target multiplicity above fused_join_depth must HARD
    ERROR on the fused backend (never silently diverge from the
    reference's first-wins join, vo_complete.cpp:55-63)."""
    import pytest

    from visual_odometry_tpu.models import pipeline
    from visual_odometry_tpu.utils.config import VOConfig

    pts, apps_arr, masks = _duplicate_heavy_sequence(rng, multiplicity=3)
    cfg = VOConfig(n_slots=16, map_capacity=64, gn_iterations=10,
                   scan_backend="fused_interpret")
    with pytest.raises(pipeline.FusedJoinDepthError):
        pipeline.run_sequence(
            synthetic_camera(), cfg, jnp.asarray(pts), jnp.asarray(apps_arr),
            jnp.asarray(masks),
        )
    # The scan backend is exact at any multiplicity: same workload, no error.
    traj, _, outs = pipeline.run_sequence(
        synthetic_camera(), cfg.replace(scan_backend="xla"),
        jnp.asarray(pts), jnp.asarray(apps_arr), jnp.asarray(masks),
    )
    assert int(np.asarray(outs.join_overflow).sum()) == 0


def test_fused_join_depth_raised_restores_exactness(rng):
    """Raising fused_join_depth to the workload's multiplicity clears the
    guard and reproduces the scan backend's join decisions."""
    from visual_odometry_tpu.models import pipeline
    from visual_odometry_tpu.utils.config import VOConfig

    pts, apps_arr, masks = _duplicate_heavy_sequence(rng, multiplicity=3)
    cfg = VOConfig(n_slots=16, map_capacity=64, gn_iterations=10,
                   fused_join_depth=3, scan_backend="fused_interpret")
    traj_f, map_f, outs_f = pipeline.run_sequence(
        synthetic_camera(), cfg, jnp.asarray(pts), jnp.asarray(apps_arr),
        jnp.asarray(masks),
    )
    assert int(np.asarray(outs_f.join_overflow).sum()) == 0
    traj_x, map_x, outs_x = pipeline.run_sequence(
        synthetic_camera(), cfg.replace(scan_backend="xla"),
        jnp.asarray(pts), jnp.asarray(apps_arr), jnp.asarray(masks),
    )
    assert (
        np.asarray(outs_f.num_solver_corr) == np.asarray(outs_x.num_solver_corr)
    ).all()
    np.testing.assert_allclose(
        np.asarray(traj_f), np.asarray(traj_x), atol=2e-3
    )
    assert int(np.asarray(map_f.valid).sum()) == int(np.asarray(map_x.valid).sum())


def synthetic_camera():
    from visual_odometry_tpu.utils import synthetic

    return synthetic.default_camera()
