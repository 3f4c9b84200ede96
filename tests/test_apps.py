"""CLI application parity tests (the reference's executable inventory)."""

import os

import numpy as np
import pytest

from visual_odometry_tpu import apps
from visual_odometry_tpu.utils import evaluation as ev
from visual_odometry_tpu.utils import io


def test_real_init(reference_data_dir, tmp_path, capsys):
    x, tri = apps.run_real_init(reference_data_dir, str(tmp_path))
    # The first two frames of example_data are (nearly) a pure forward
    # translation (trajectory.dat line 2: x ~ 0.2).
    assert np.abs(x[:3, :3] - np.eye(3)).max() < 1e-3
    t = x[:3, 3] / np.linalg.norm(x[:3, 3])
    assert abs(t[2]) > 0.99
    assert len(tri) > 50
    assert os.path.exists(tmp_path / "triangulated.txt")
    assert os.path.exists(tmp_path / "world.txt")


def test_picp_known_real_near_perfect(reference_data_dir, tmp_path):
    poses = apps.run_picp_known_real(reference_data_dir, str(tmp_path), verbose=False)
    params = io.load_camera_params(os.path.join(reference_data_dir, "camera.dat"))
    gt = io.gt_poses_se3(
        io.load_trajectory(os.path.join(reference_data_dir, "trajectory.dat"))[1]
    )
    absolute = io.robot_trajectory(poses, params.cam_in_robot)
    res = ev.evaluate(absolute, gt)
    # Known world + known DA => metric scale and near-zero error.
    assert abs(res.scale - 1.0) < 1e-3
    assert res.rmse_position < 1e-3
    assert os.path.exists(tmp_path / "trajectory_est.txt")


def test_compute_corr_perfect_agreement(reference_data_dir):
    a_set, g_set = apps.run_compute_corr(reference_data_dir, verbose=False)
    # On this dataset appearances are unique landmark keys => appearance DA
    # reproduces the ground-truth association exactly.
    assert a_set == g_set and len(a_set) > 50


def test_read_data_test_smoke(reference_data_dir, capsys):
    params, seq = apps.run_read_data_test(reference_data_dir)
    out = capsys.readouterr().out
    assert "frames: 121" in out
    assert "world landmarks: 1000" in out


def test_cli_dispatch(reference_data_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    assert apps.main(["read_data_test", reference_data_dir]) == 0
    assert apps.main(["bogus", reference_data_dir]) == 1
    assert apps.main([]) == 1
