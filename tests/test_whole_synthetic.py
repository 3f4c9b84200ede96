"""Composed synthetic pipeline test: init -> triangulate -> PICP.

Mirrors ``whole_test`` (essential_picp_test.cpp:45-106): three synthetic
views; epipolar init between views 0-1, triangulation, then PICP against
view 2's measurements; ground truth for the PICP stage is the relative pose
``X_gt2 · X_gt1⁻¹`` up to the monocular scale fixed at init.
"""

import numpy as np
import jax.numpy as jnp

from visual_odometry_tpu.ops import epipolar, picp, se3, triangulation
from visual_odometry_tpu.ops.camera import project_points
from visual_odometry_tpu.utils import synthetic


def _pose(v):
    return np.array(se3.v2t_euler(jnp.asarray(np.float32(v))))


def test_three_view_composed(rng):
    world = synthetic.generate_points3d(rng, 3000)
    w1 = _pose([0.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    w2 = _pose([0.1, -0.05, 0.15, 0.02, -0.03, 0.01])
    w3 = _pose([0.2, -0.1, 0.3, 0.04, -0.05, 0.02])
    cam = synthetic.default_camera()

    p1, v1 = project_points(synthetic.default_camera(w1), jnp.asarray(world))
    p2, v2 = project_points(synthetic.default_camera(w2), jnp.asarray(world))
    p3, v3 = project_points(synthetic.default_camera(w3), jnp.asarray(world))
    n = len(world)
    idx = jnp.arange(n, dtype=jnp.int32)
    corr12 = v1 & v2

    # Stage 1: epipolar init (view 1 in view 2's frame).
    x12 = epipolar.estimate_transform(
        cam.camera_matrix, idx, idx, corr12, p1, p2, v1, v2
    )
    x12_gt = (w2 @ np.linalg.inv(w1)).astype(np.float32)
    np.testing.assert_allclose(np.array(x12)[:3, :3], x12_gt[:3, :3], atol=2e-3)
    scale = np.linalg.norm(x12_gt[:3, 3]) / np.linalg.norm(np.array(x12)[:3, 3])

    # Cross-check E from the ground-truth transform (transform2essential).
    e_gt = np.array(epipolar.transform_to_essential(jnp.asarray(x12_gt)))
    h1 = np.concatenate([np.array(p1), np.ones((n, 1), np.float32)], 1)
    h2 = np.concatenate([np.array(p2), np.ones((n, 1), np.float32)], 1)
    ik = np.linalg.inv(np.array(cam.camera_matrix))
    d1 = h1 @ ik.T
    d2 = h2 @ ik.T
    res = np.abs(np.einsum("ni,ij,nj->n", d1, e_gt, d2))[np.array(corr12)]
    assert np.median(res) < 1e-4

    # Stage 2: triangulate in view-1 coords.
    tri, ok = triangulation.triangulate_correspondences(
        cam.camera_matrix, x12, idx, idx, corr12, p1, p2
    )
    assert int(ok.sum()) > 30

    # Stage 3: PICP of view 3 against the triangulated (scale-free) points,
    # expressed in view-2 coords (the tracking convention).
    tri_in_2 = se3.transform_points(x12, tri)
    weights = (ok & v3).astype(jnp.float32)
    cam0 = synthetic.default_camera(np.eye(4, dtype=np.float32))
    solved, stats = picp.solve(
        cam0, tri_in_2, p3, weights, 200, kernel_threshold=10000.0
    )
    x23_est = np.array(solved.world_in_camera)
    x23_gt = (w3 @ np.linalg.inv(w2)).astype(np.float32)

    # Rotation matches; translation matches after undoing the init scale.
    np.testing.assert_allclose(x23_est[:3, :3], x23_gt[:3, :3], atol=5e-3)
    np.testing.assert_allclose(x23_est[:3, 3] * scale, x23_gt[:3, 3], atol=2e-2)
    assert int(stats.num_inliers) > 20
