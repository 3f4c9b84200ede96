"""End-to-end pipeline tests on the reference example dataset.

The acceptance criteria come straight from BASELINE.md: reproduce (or beat)
e_theta mean ~5.3e-6 and RMSE_pos ~0.1453 after median-ratio scale
correction on example_data.
"""

import os

import numpy as np
import pytest

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
    # RMSE_map 0.1841, scale 0.47337.
    assert e_theta < 5.4e-6
    # RMSE_pos swings +-0.005 around the baseline with f32 rounding of the
    # init; assert the parity band here (the BA refinement stage is the
    # robust improvement over the baseline).
    assert res.rmse_position < 0.16
    assert res.rmse_map is not None and res.rmse_map < 0.25
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
