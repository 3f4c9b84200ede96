import numpy as np
import jax.numpy as jnp

from visual_odometry_tpu.ops.camera import Camera, project_points
from visual_odometry_tpu.utils import synthetic


def _numpy_project(cam, pts):
    """Scalar oracle replicating camera.h:25-37 literally."""
    k = np.array(cam.camera_matrix)
    w = np.array(cam.world_in_camera)
    rows, cols = float(cam.rows), float(cam.cols)
    zn, zf = float(cam.z_near), float(cam.z_far)
    out, valid = [], []
    for p in pts:
        pc = w[:3, :3] @ p + w[:3, 3]
        if pc[2] > zf or pc[2] < zn:
            out.append((-1.0, -1.0))
            valid.append(False)
            continue
        ph = k @ pc
        uv = ph[:2] / ph[2]
        ok = 0 <= uv[0] <= cols - 1 and 0 <= uv[1] <= rows - 1
        out.append(tuple(uv) if ok else (-1.0, -1.0))
        valid.append(bool(ok))
    return np.array(out, np.float32), np.array(valid)


def test_matches_scalar_oracle(rng):
    pose = synthetic.generate_pose(rng)
    cam = synthetic.default_camera(pose)
    pts = synthetic.generate_points3d(rng, 500)
    uv, valid = project_points(cam, jnp.asarray(pts))
    uv_ref, valid_ref = _numpy_project(cam, pts)
    # Points within fp noise of a validity boundary may flip between the
    # batched and the scalar compute; exclude them from the exact check.
    w = np.array(cam.world_in_camera)
    pc = pts @ w[:3, :3].T + w[:3, 3]
    z = pc[:, 2]
    ph = pc @ np.array(cam.camera_matrix).T
    uv_all = ph[:, :2] / np.where(ph[:, 2:] == 0, 1, ph[:, 2:])
    eps = 1e-3
    borderline = (
        (np.abs(z - float(cam.z_near)) < eps)
        | (np.abs(z - float(cam.z_far)) < eps)
        | (np.abs(uv_all[:, 0]) < eps)
        | (np.abs(uv_all[:, 0] - (float(cam.cols) - 1)) < eps)
        | (np.abs(uv_all[:, 1]) < eps)
        | (np.abs(uv_all[:, 1] - (float(cam.rows) - 1)) < eps)
    )
    clear = ~borderline
    np.testing.assert_array_equal(np.array(valid)[clear], valid_ref[clear])
    np.testing.assert_allclose(np.array(uv)[clear], uv_ref[clear], atol=1e-3)
    assert valid_ref.any() and (~valid_ref).any()


def test_boundary_semantics():
    # u == cols-1 is valid (strict > fails in the reference), u > cols-1 is not.
    k = jnp.eye(3)
    cam = Camera.create(k, rows=10, cols=10, z_near=0, z_far=100)
    pts = jnp.array(
        [
            [9.0, 0.0, 1.0],   # u = 9 = cols-1 -> valid
            [9.01, 0.0, 1.0],  # u > cols-1 -> invalid
            [0.0, 0.0, 1.0],   # origin pixel -> valid
            [-0.01, 0.0, 1.0], # u < 0 -> invalid
        ]
    )
    _, valid = project_points(cam, pts)
    np.testing.assert_array_equal(np.array(valid), [True, False, True, False])


def test_depth_clipping():
    cam = Camera.create(jnp.eye(3), rows=100, cols=100, z_near=1, z_far=5)
    pts = jnp.array([[1.0, 1.0, 0.5], [5.0, 5.0, 5.0], [1.0, 1.0, 6.0], [2.0, 2.0, 1.0]])
    uv, valid = project_points(cam, pts)
    np.testing.assert_array_equal(np.array(valid), [False, True, False, True])
    np.testing.assert_allclose(np.array(uv[0]), [-1.0, -1.0])


def test_batched_over_poses(rng):
    cam = synthetic.default_camera(np.stack([synthetic.generate_pose(rng) for _ in range(3)]))
    pts = jnp.asarray(synthetic.generate_points3d(rng, 64))
    uv, valid = project_points(cam, pts[None].repeat(3, axis=0))
    assert uv.shape == (3, 64, 2) and valid.shape == (3, 64)
