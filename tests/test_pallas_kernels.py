"""Pallas kernels vs their pure-JAX references (interpret mode on CPU).

On real TPU hardware the same comparisons are exercised by the benchmark
and the TPU pipeline runs; these tests pin the kernel semantics.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from visual_odometry_tpu.ops import picp, se3
from visual_odometry_tpu.ops.camera import project_points
from visual_odometry_tpu.ops.pallas.matcher_kernel import best_match_pallas
from visual_odometry_tpu.ops.pallas.picp_kernel import linearize_pallas
from visual_odometry_tpu.utils import synthetic


def test_matcher_kernel_matches_oracle(rng):
    k, q_n, d = 1000, 77, 10
    db = rng.uniform(-1, 1, (k, d)).astype(np.float32)
    q = db[rng.integers(0, k, q_n)].copy()
    q[:5] += 3.0
    db_mask = np.ones(k, bool)
    db_mask[500:600] = False
    q_mask = np.ones(q_n, bool)
    q_mask[-3:] = False

    dist, idx = best_match_pallas(
        jnp.asarray(q), jnp.asarray(q_mask), jnp.asarray(db), jnp.asarray(db_mask),
        interpret=True,
    )
    d2 = ((q[:, None, :] - db[None, :, :]) ** 2).sum(-1)
    d2[:, ~db_mask] = np.inf
    np.testing.assert_array_equal(np.array(idx)[q_mask], d2.argmin(1)[q_mask])
    np.testing.assert_allclose(np.array(dist)[q_mask], d2.min(1)[q_mask], atol=1e-3)
    assert (np.array(dist)[~q_mask] > 1e30).all()


def test_matcher_kernel_first_index_tie_break(rng):
    db = np.zeros((600, 10), np.float32)
    db[100] = 1.0
    db[400] = 1.0  # exact duplicate in a later tile
    q = np.ones((1, 10), np.float32)
    dist, idx = best_match_pallas(
        jnp.asarray(q), jnp.ones(1, bool), jnp.asarray(db), jnp.ones(600, bool),
        tk=128, interpret=True,
    )
    assert int(idx[0]) == 100


def test_matcher_kernel_garbage_in_masked_rows(rng):
    db = rng.uniform(-1, 1, (256, 10)).astype(np.float32)
    q = db[:8].copy()
    db_mask = np.ones(256, bool)
    db_mask[8:16] = False
    db[8:16] = np.nan
    dist, idx = best_match_pallas(
        jnp.asarray(q), jnp.ones(8, bool), jnp.asarray(db), jnp.asarray(db_mask),
        interpret=True,
    )
    np.testing.assert_array_equal(np.array(idx), np.arange(8))


@pytest.mark.parametrize("n", [100, 300, 1000])
def test_picp_kernel_matches_jax_linearize(rng, n):
    world = synthetic.generate_points3d(rng, n)
    # A pose far from convergence so H AND b are large (relative compare).
    pose = np.array(se3.v2t_euler(jnp.asarray(np.float32([0.2, -0.1, 0.3, 0.05, -0.08, 0.02]))))
    cam = synthetic.default_camera(pose)
    gt_cam = synthetic.default_camera(np.eye(4, dtype=np.float32))
    meas, valid = project_points(gt_cam, jnp.asarray(world))
    w = np.array(valid).astype(np.float32)

    h0, b0, s0 = picp.linearize(
        cam, jnp.asarray(world), np.asarray(meas), jnp.asarray(w), jnp.float32(1e4)
    )
    cam_params = jnp.asarray(
        [float(cam.z_near), float(cam.z_far), float(cam.cols), float(cam.rows)],
        jnp.float32,
    )
    h1, b1, s1 = linearize_pallas(
        cam.camera_matrix, cam.world_in_camera, cam_params,
        jnp.asarray(world), jnp.asarray(np.asarray(meas)), jnp.asarray(w),
        jnp.float32(1e4), interpret=True,
    )
    scale_h = max(1.0, float(np.abs(np.array(h0)).max()))
    scale_b = max(1.0, float(np.abs(np.array(b0)).max()))
    np.testing.assert_allclose(np.array(h1) / scale_h, np.array(h0) / scale_h, atol=1e-5)
    np.testing.assert_allclose(np.array(b1) / scale_b, np.array(b0) / scale_b, atol=1e-5)
    assert int(s0.num_inliers) == int(s1.num_inliers)
    np.testing.assert_allclose(
        float(s1.chi_inliers), float(s0.chi_inliers), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        float(s1.chi_outliers), float(s0.chi_outliers), rtol=1e-4, atol=1e-6
    )


def test_picp_kernel_keep_outliers(rng):
    world = synthetic.generate_points3d(rng, 200)
    cam = synthetic.default_camera(np.eye(4, dtype=np.float32))
    meas, valid = project_points(cam, jnp.asarray(world))
    meas = np.array(meas) + 100.0  # everything an outlier
    w = np.array(valid).astype(np.float32)
    cam_params = jnp.asarray([0.0, 5.0, 640.0, 480.0], jnp.float32)
    args = (
        cam.camera_matrix, cam.world_in_camera, cam_params,
        jnp.asarray(world), jnp.asarray(meas), jnp.asarray(w), jnp.float32(1e3),
    )
    h_drop, b_drop, _ = linearize_pallas(*args, keep_outliers=False, interpret=True)
    h_keep, b_keep, _ = linearize_pallas(*args, keep_outliers=True, interpret=True)
    assert np.abs(np.array(h_drop)).max() == 0.0
    assert np.abs(np.array(h_keep)).max() > 0.0
    h0, b0, _ = picp.linearize(
        cam, jnp.asarray(world), jnp.asarray(meas), jnp.asarray(w),
        jnp.float32(1e3), keep_outliers=True,
    )
    scale = max(1.0, float(np.abs(np.array(h0)).max()))
    np.testing.assert_allclose(np.array(h_keep) / scale, np.array(h0) / scale, atol=1e-5)


def test_solve_fused_matches_xla_solve(rng):
    """Whole-loop fused kernel (interpret mode) == ops.picp.solve, both
    fixed-budget and early-exit."""
    import jax.numpy as jnp
    from visual_odometry_tpu.ops import picp
    from visual_odometry_tpu.ops.camera import project_points
    from visual_odometry_tpu.ops.pallas.picp_kernel import solve_fused
    from visual_odometry_tpu.utils import synthetic

    world = synthetic.generate_points3d(rng, 160)
    x_gt = synthetic.generate_pose(rng)
    cam = synthetic.default_camera(np.eye(4, dtype=np.float32))
    meas, v = project_points(synthetic.default_camera(x_gt), jnp.asarray(world))
    w = v.astype(jnp.float32)
    cam_params = jnp.stack([cam.z_near, cam.z_far, cam.cols, cam.rows])

    for tol in (0.0, 1e-12):
        solved, st = picp.solve(
            cam, jnp.asarray(world), meas, w, 50,
            kernel_threshold=10000.0, tolerance=tol, backend="xla",
        )
        pose, st2 = solve_fused(
            cam.camera_matrix, cam.world_in_camera, cam_params,
            jnp.asarray(world), meas, w, 50,
            jnp.float32(10000.0), jnp.float32(1.0),
            jnp.float32(tol if tol > 0 else -1.0), interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(pose), np.asarray(solved.world_in_camera), atol=5e-5
        )
        assert int(st.num_inliers) == int(st2.num_inliers)


def test_selfcheck_runs_in_interpret_mode():
    """The packaged backend-equality self-check (utils/selfcheck, run on
    the real chip by bench.py) passes through the Pallas interpreter."""
    from visual_odometry_tpu.utils import selfcheck

    diffs = selfcheck.run_all(interpret=True)
    assert diffs["matcher_dist_diff"] == 0.0
    assert diffs["picp_pose_diff_fixed"] < 5e-4
    # Same bound as selfcheck.check_frame_pipeline: two genuinely different
    # f32 programs on a REAL trajectory agree to ~7e-4.
    assert diffs["frame_traj_diff"] < 2e-3


def test_match_pairs_pallas_matches_xla_batch(rng):
    """Batched pair-matcher kernel (interpret) == vmapped dense matcher:
    bitwise distances, identical indices and kd-side selection."""
    import jax.numpy as jnp
    import numpy as np

    from visual_odometry_tpu.ops import matching

    b, n, d = 7, 64, 10
    a1 = rng.uniform(-1, 1, (b, n, d)).astype(np.float32)
    a2 = a1 + rng.normal(0, 0.02, (b, n, d)).astype(np.float32)
    m1 = rng.uniform(size=(b, n)) > 0.2
    m2 = rng.uniform(size=(b, n)) > 0.2
    # NaN garbage in masked slots must not change any match.
    a1[~m1] = np.nan
    a2[~m2] = np.nan
    # Duplicate rows to exercise first-index tie-breaking.
    a2[:, 5] = a2[:, 3]

    ref = matching.match_appearances_batch(
        jnp.asarray(a1), jnp.asarray(m1), jnp.asarray(a2), jnp.asarray(m2),
        backend="xla",
    )
    got = matching.match_appearances_batch(
        jnp.asarray(a1), jnp.asarray(m1), jnp.asarray(a2), jnp.asarray(m2),
        backend="pairs_pallas", interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(got.valid))
    v = np.asarray(ref.valid)
    np.testing.assert_array_equal(
        np.asarray(ref.idx1)[v], np.asarray(got.idx1)[v]
    )
    np.testing.assert_array_equal(
        np.asarray(ref.idx2)[v], np.asarray(got.idx2)[v]
    )


def test_gather_rows_pallas_matches_take_along_axis(rng):
    """Tiled vreg lane-gather kernel (interpret) == take_along_axis."""
    import jax.numpy as jnp
    import numpy as np

    from visual_odometry_tpu.ops.pallas import gather_kernel

    for f, r, s in ((5, 4, 64), (3, 8, 256), (2, 3, 1024)):
        src = rng.normal(size=(f, r, s)).astype(np.float32)
        idx = rng.integers(0, s, (f, r, s)).astype(np.int32)
        out = gather_kernel.gather_rows(
            jnp.asarray(src), jnp.asarray(idx), interpret=True
        )
        ref = np.take_along_axis(src, idx, axis=2)
        np.testing.assert_array_equal(np.asarray(out), ref)

    # take_lanes restores integer dtypes exactly.
    a = rng.integers(0, 1000, (4, 128)).astype(np.int32)
    b = rng.normal(size=(4, 128)).astype(np.float32)
    i1 = rng.integers(0, 128, (4, 128)).astype(np.int32)
    i2 = rng.integers(0, 128, (4, 128)).astype(np.int32)
    ga, gb = gather_kernel.take_lanes(
        [jnp.asarray(a), jnp.asarray(b)], [jnp.asarray(i1), jnp.asarray(i2)],
        interpret=True,
    )
    assert ga.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(ga), np.take_along_axis(a, i1, 1))
    np.testing.assert_array_equal(np.asarray(gb), np.take_along_axis(b, i2, 1))


def test_take_table_matches_gather(rng):
    import jax.numpy as jnp
    import numpy as np

    from visual_odometry_tpu.ops.pallas import gather_kernel

    for r, t, n in ((6, 512, 5000), (3, 100, 257), (8, 1024, 4096)):
        table = rng.normal(size=(r, t)).astype(np.float32)
        idx = rng.integers(0, t, n).astype(np.int32)
        out = gather_kernel.take_table(
            jnp.asarray(table), jnp.asarray(idx), interpret=True
        )
        np.testing.assert_array_equal(np.asarray(out), table[:, idx])


def test_segment_sum_small_matches_segment_sum(rng):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from visual_odometry_tpu.ops.pallas import segsum_kernel

    n, r, t = 5000, 6, 512
    vals = rng.normal(size=(n, r)).astype(np.float32)
    seg = rng.integers(0, t, n).astype(np.int32)
    # Some dropped (padding) rows.
    seg[::17] = t
    out = segsum_kernel.segment_sum_small(
        jnp.asarray(vals), jnp.asarray(seg), t, interpret=True
    )
    ref = jax.ops.segment_sum(jnp.asarray(vals), jnp.asarray(seg), num_segments=t + 1)[:t]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=1e-4)
