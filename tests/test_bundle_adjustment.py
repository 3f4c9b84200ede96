import numpy as np
import jax
import jax.numpy as jnp
import pytest

from visual_odometry_tpu.parallel import bundle_adjustment as ba
from visual_odometry_tpu.parallel import mesh as mesh_mod
from visual_odometry_tpu.ops import se3
from visual_odometry_tpu.ops.camera import project_points
from visual_odometry_tpu.utils import synthetic


def _make_problem(rng, f=4, l=64, noise_pose=0.05, noise_lm=0.05):
    """Ground-truth scene + noisy initial estimates."""
    # Points concentrated in the shared frustum so most are co-visible.
    world = np.stack(
        [
            rng.uniform(-1.5, 1.5, l),
            rng.uniform(-1.2, 1.2, l),
            rng.uniform(2.0, 4.0, l),
        ],
        axis=1,
    ).astype(np.float32)
    gt_poses = []
    for i in range(f):
        v = np.float32([0.05 * i, -0.02 * i, 0.08 * i, 0.01 * i, -0.015 * i, 0.01 * i])
        gt_poses.append(np.array(se3.v2t_euler(jnp.asarray(v))))
    gt_poses = np.stack(gt_poses)

    cam = synthetic.default_camera()
    obs = np.zeros((f, l, 2), np.float32)
    mask = np.zeros((f, l), bool)
    for i in range(f):
        uv, valid = project_points(synthetic.default_camera(gt_poses[i]), jnp.asarray(world))
        obs[i] = np.array(uv)
        mask[i] = np.array(valid)

    poses0 = gt_poses.copy()
    landmarks0 = world.copy()
    for i in range(1, f):  # pose 0 is the gauge anchor
        dv = rng.uniform(-noise_pose, noise_pose, 6).astype(np.float32)
        poses0[i] = np.array(se3.v2t_euler(jnp.asarray(dv))) @ poses0[i]
    landmarks0 = landmarks0 + rng.uniform(-noise_lm, noise_lm, (l, 3)).astype(np.float32)

    problem = ba.BAProblem(
        poses=jnp.asarray(poses0),
        landmarks=jnp.asarray(landmarks0),
        observations=jnp.asarray(obs),
        obs_mask=jnp.asarray(mask),
    )
    return cam, problem, gt_poses, world, mask


def _reproj_rmse(cam, problem):
    k = np.array(cam.camera_matrix)
    poses = np.array(problem.poses)
    lms = np.array(problem.landmarks)
    obs = np.array(problem.observations)
    mask = np.array(problem.obs_mask)
    errs = []
    for i in range(len(poses)):
        pc = lms @ poses[i][:3, :3].T + poses[i][:3, 3]
        ph = pc @ k.T
        uv = ph[:, :2] / ph[:, 2:]
        e = np.linalg.norm(uv - obs[i], axis=1)
        errs.append(e[mask[i]])
    return float(np.sqrt(np.mean(np.concatenate(errs) ** 2)))


def test_ba_reduces_reprojection_error(rng):
    cam, problem, gt_poses, world, mask = _make_problem(rng)
    assert mask.sum() > 50
    before = _reproj_rmse(cam, problem)
    refined, stats = ba.refine(cam.camera_matrix, problem, num_iterations=15, damping=0.1)
    after = _reproj_rmse(cam, refined)
    assert after < before * 0.05
    assert int(stats.num_obs) == mask.sum()


def test_ba_fixes_gauge(rng):
    cam, problem, *_ = _make_problem(rng)
    p0 = np.array(problem.poses[0])
    refined, _ = ba.refine(cam.camera_matrix, problem, num_iterations=5, damping=0.1)
    np.testing.assert_allclose(np.array(refined.poses[0]), p0, atol=1e-6)


def test_ba_noop_on_perfect_input(rng):
    cam, problem, gt_poses, world, mask = _make_problem(rng, noise_pose=0.0, noise_lm=0.0)
    refined, _ = ba.refine(cam.camera_matrix, problem, num_iterations=3, damping=1.0)
    np.testing.assert_allclose(np.array(refined.poses), gt_poses, atol=1e-3)
    np.testing.assert_allclose(np.array(refined.landmarks), world, atol=1e-2)


@pytest.mark.parametrize("dp,lm", [(1, 8), (2, 4)])
def test_sharded_matches_single_device(rng, dp, lm):
    if len(jax.devices()) < dp * lm:
        pytest.skip("needs 8 virtual devices")
    cam, problem, *_ = _make_problem(rng, f=3, l=64)
    # Batch of dp identical sequences (shard over dp), landmarks over lm.
    b_problem = ba.BAProblem(
        poses=jnp.tile(problem.poses[None], (dp, 1, 1, 1)),
        landmarks=jnp.tile(problem.landmarks[None], (dp, 1, 1)),
        observations=jnp.tile(problem.observations[None], (dp, 1, 1, 1)),
        obs_mask=jnp.tile(problem.obs_mask[None], (dp, 1, 1)),
    )
    m = mesh_mod.make_mesh(dp * lm, ("dp", "lm"), dp_size=dp)
    step = ba.make_sharded_ba_step(m, damping=0.1)
    out, stats = step(cam.camera_matrix, b_problem)

    ref, ref_stats = ba.ba_step(cam.camera_matrix, problem, damping=0.1)
    for d in range(dp):
        np.testing.assert_allclose(
            np.array(out.poses[d]), np.array(ref.poses), rtol=2e-3, atol=2e-3
        )
        np.testing.assert_allclose(
            np.array(out.landmarks[d]), np.array(ref.landmarks), rtol=2e-3, atol=2e-3
        )
    np.testing.assert_allclose(float(stats.chi[0]), float(ref_stats.chi), rtol=1e-3)
