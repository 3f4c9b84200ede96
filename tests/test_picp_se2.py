"""SE(2)-constrained PICP: the planar estimation variant (est_SE2 branch)."""

import numpy as np
import jax.numpy as jnp

from visual_odometry_tpu.ops import picp_se2, se3
from visual_odometry_tpu.ops.camera import project_points
from visual_odometry_tpu.utils import synthetic


def _planar_pose(x, y, theta):
    return np.array(se3.v2t_se2(jnp.asarray(np.float32([x, y, theta]))))


def test_v2t_t2v_se2_roundtrip():
    v = jnp.asarray(np.float32([0.3, -0.7, 0.9]))
    pose = se3.v2t_se2(v)
    np.testing.assert_allclose(np.array(se3.t2v_se2(pose)), np.array(v), atol=1e-6)
    # planar pose: z translation and out-of-plane rotation vanish
    p = np.array(pose)
    assert p[2, 3] == 0.0
    np.testing.assert_allclose(p[2, :3], [0, 0, 1], atol=1e-7)


def test_project_se2_idempotent_on_planar():
    pose = _planar_pose(1.0, 2.0, 0.5)
    np.testing.assert_allclose(
        np.array(se3.project_se2(jnp.asarray(pose))), pose, atol=1e-6
    )


def test_recovers_planar_motion_identity_mount(rng):
    """Planar ground-truth camera motion is recovered exactly in 3 DoF."""
    world = synthetic.generate_points3d(rng, 1000)
    x_gt = _planar_pose(0.2, -0.1, 0.3)
    cam_cur = synthetic.default_camera(x_gt)
    p_cur, v_cur = project_points(cam_cur, jnp.asarray(world))

    cam0 = synthetic.default_camera(np.eye(4, dtype=np.float32))
    solved, stats = picp_se2.solve_se2(
        cam0, jnp.asarray(world), p_cur, v_cur.astype(jnp.float32), 100,
        kernel_threshold=10000.0,
    )
    x_est = np.asarray(solved.world_in_camera)
    np.testing.assert_allclose(x_est, x_gt, atol=1e-4)
    assert int(stats.num_inliers) > 20
    # The estimate is EXACTLY planar, not merely close.
    assert x_est[2, 3] == 0.0
    np.testing.assert_allclose(x_est[2, :3], [0, 0, 1], atol=1e-6)


def test_ignores_out_of_plane_motion(rng):
    """With non-planar gt, the solve stays in SE(2) (best planar fit)."""
    world = synthetic.generate_points3d(rng, 800)
    x_gt = np.array(
        se3.v2t_euler(jnp.asarray(np.float32([0.1, -0.05, 0.2, 0.05, -0.04, 0.15])))
    )
    cam_cur = synthetic.default_camera(x_gt)
    p_cur, v_cur = project_points(cam_cur, jnp.asarray(world))
    cam0 = synthetic.default_camera(np.eye(4, dtype=np.float32))
    solved, _ = picp_se2.solve_se2(
        cam0, jnp.asarray(world), p_cur, v_cur.astype(jnp.float32), 50,
        kernel_threshold=10000.0,
    )
    x_est = np.asarray(solved.world_in_camera)
    assert abs(x_est[2, 3]) < 1e-6
    np.testing.assert_allclose(x_est[2, :3], [0, 0, 1], atol=1e-6)
    # yaw and in-plane translation still approximately recovered
    assert abs(np.arctan2(x_est[1, 0], x_est[0, 0]) - 0.15) < 0.1


def test_conjugated_mount_keeps_robot_motion_planar(rng):
    """With a tilted camera mount, c X^-1 c^-1 (the robot motion) is SE(2)."""
    # Mount: camera pitched down 0.4 rad and offset from the robot origin.
    mount = np.array(
        se3.v2t_euler(jnp.asarray(np.float32([0.1, 0.0, 0.3, 0.4, 0.0, 0.0])))
    )
    robot_rel = _planar_pose(0.15, -0.08, 0.2)  # gt planar robot increment
    c_inv = np.linalg.inv(mount).astype(np.float32)
    x_gt = (c_inv @ robot_rel @ mount).astype(np.float32)  # world_in_camera

    world = synthetic.generate_points3d(rng, 1200)
    cam_cur = synthetic.default_camera(x_gt)
    p_cur, v_cur = project_points(cam_cur, jnp.asarray(world))
    cam0 = synthetic.default_camera(np.eye(4, dtype=np.float32))
    solved, stats = picp_se2.solve_se2(
        cam0, jnp.asarray(world), p_cur, v_cur.astype(jnp.float32), 100,
        kernel_threshold=10000.0, cam_in_robot=jnp.asarray(mount),
    )
    x_est = np.asarray(solved.world_in_camera)
    assert int(stats.num_inliers) > 20
    np.testing.assert_allclose(x_est, x_gt, atol=2e-4)
    robot_est = mount @ np.linalg.inv(x_est) @ c_inv
    assert abs(robot_est[2, 3]) < 1e-5
    np.testing.assert_allclose(robot_est[2, :3], [0, 0, 1], atol=1e-5)


def test_planar_pipeline_on_reference_data(reference_data_dir, tmp_path):
    """vo_se2 runs end-to-end and its robot trajectory is exactly planar."""
    from visual_odometry_tpu import apps
    from visual_odometry_tpu.utils.config import VOConfig

    cfg = VOConfig(gn_iterations=30)
    trajectory, _, _, _ = apps.run_vo_se2(
        reference_data_dir, str(tmp_path), config=cfg, verbose=False
    )
    # Robot-frame relative motions (files_utils.cpp:142-150 convention)
    # must be exactly planar.
    from visual_odometry_tpu.utils import io

    params = io.load_camera_params(reference_data_dir + "/camera.dat")
    c = params.cam_in_robot
    c_inv = np.linalg.inv(c)
    for x in trajectory[1:]:
        robot_rel = c @ np.linalg.inv(x) @ c_inv
        assert abs(robot_rel[2, 3]) < 1e-4
        np.testing.assert_allclose(robot_rel[2, :3], [0, 0, 1], atol=1e-4)
    # And it produced a sane trajectory file set.
    assert (tmp_path / "trajectory_est_data.txt").exists()
