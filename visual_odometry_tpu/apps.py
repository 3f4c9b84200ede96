"""Command-line applications of the framework.

The TPU-native equivalents of the reference's executables
(``/root/reference/src/CMakeLists.txt:1-9``):

  * ``vo_complete``   -> :func:`run_vo_complete`  (vo_complete.cpp)
  * ``evaluation``    -> :func:`run_evaluation`   (evaluate.cpp)
  * ``vo_daKnown``    -> :func:`run_vo_da_known`  (vo_daKnown.cpp)

Usage::

    python -m visual_odometry_tpu.apps vo_complete <data_dir> [out_dir]
    python -m visual_odometry_tpu.apps evaluation  <data_dir> [out_dir]
    python -m visual_odometry_tpu.apps vo_daknown  <data_dir> [out_dir]

Output-file contract matches README.md:56-68 (world.txt, map.txt,
map_appearances.txt, trajectory_gt.txt, trajectory_est_complete.txt,
trajectory_est_data.txt, out_performance.txt, map_corrected.txt,
arrows.txt, world_pruned.txt), so gnuplot recipes and the reference
``evaluation`` binary work unchanged on our outputs.
"""

from __future__ import annotations

import os
import sys
import time
from typing import Optional

import numpy as np

from .models import pipeline
from .models.landmark_map import compact
from .ops.camera import Camera
from .utils import evaluation as eval_mod
from .utils import io
from .utils.config import DEFAULT_CONFIG, VOConfig


def _load(data_dir: str, config: VOConfig):
    params = io.load_camera_params(os.path.join(data_dir, "camera.dat"))
    camera = Camera.create(
        params.camera_matrix,
        rows=params.height,
        cols=params.width,
        z_near=params.z_near,
        z_far=params.z_far,
    )
    seq = io.load_sequence(data_dir, config.n_slots)
    return params, camera, seq


def run_vo_complete(
    data_dir: str,
    out_dir: str = ".",
    config: VOConfig = DEFAULT_CONFIG,
    verbose: bool = True,
):
    """Full VO with appearance-based DA (vo_complete.cpp:68-186)."""
    os.makedirs(out_dir, exist_ok=True)
    params, camera, seq = _load(data_dir, config)
    _, world_points, world_apps = io.load_world(os.path.join(data_dir, "world.dat"))
    io.write_vectors(os.path.join(out_dir, "world.txt"), world_points)
    io.save_gt_trajectory(
        os.path.join(data_dir, "trajectory.dat"),
        os.path.join(out_dir, "trajectory_gt.txt"),
    )

    t0 = time.perf_counter()
    trajectory, map_state, outs = pipeline.run_sequence(
        camera,
        config,
        np.asarray(seq.points),
        np.asarray(seq.appearances),
        np.asarray(seq.mask),
    )
    trajectory = np.asarray(trajectory)  # blocks until done
    elapsed = time.perf_counter() - t0

    if config.refine_iterations > 0:
        from .models import refinement

        trajectory, map_pts, map_apps, _ = refinement.refine_trajectory(
            params.camera_matrix,
            trajectory,
            map_state,
            np.asarray(seq.points),
            np.asarray(seq.appearances),
            np.asarray(seq.mask),
            num_iterations=config.refine_iterations,
            damping=config.refine_damping,
            kernel_threshold=config.kernel_threshold,
        )
    else:
        map_pts, map_apps = compact(map_state)
    # map = H * map before writing (vo_complete.cpp:181).
    h = params.cam_in_robot
    map_robot = map_pts @ h[:3, :3].T + h[:3, 3]
    io.write_vectors(os.path.join(out_dir, "map.txt"), map_robot)
    io.write_vectors(os.path.join(out_dir, "map_appearances.txt"), map_apps)
    io.save_trajectory(
        os.path.join(out_dir, "trajectory_est_complete.txt"), trajectory, h
    )
    io.save_trajectory(
        os.path.join(out_dir, "trajectory_est_data.txt"), trajectory, h, save_rotation=True
    )
    if verbose:
        f = len(trajectory)
        print(f"tracked {f} frames in {elapsed:.3f}s ({f / elapsed:.1f} frames/s)")
        print(f"map landmarks: {len(map_pts)}")
    return trajectory, map_state, outs, elapsed


def run_evaluation(data_dir: str, out_dir: str = ".", verbose: bool = True):
    """Offline metrics (evaluate.cpp), reading the files run_vo_complete wrote."""
    _, gt_xyt = io.load_trajectory(os.path.join(data_dir, "trajectory.dat"))
    gt_poses = io.gt_poses_se3(gt_xyt)
    est_poses = io.load_est_trajectory(os.path.join(out_dir, "trajectory_est_data.txt"))

    map_est = np.loadtxt(os.path.join(out_dir, "map.txt"), ndmin=2, dtype=np.float32)
    map_apps = np.loadtxt(
        os.path.join(out_dir, "map_appearances.txt"), ndmin=2, dtype=np.float32
    )
    _, world_points, world_apps = io.load_world(os.path.join(data_dir, "world.dat"))

    res = eval_mod.evaluate(
        est_poses, gt_poses, map_est, map_apps, world_points, world_apps
    )

    perf = np.stack([res.orientation_errors, res.ratios], axis=1)
    np.savetxt(os.path.join(out_dir, "out_performance.txt"), perf, fmt="%g")
    io.write_vectors(os.path.join(out_dir, "map_corrected.txt"), map_est * res.scale)
    mi, wi = eval_mod.match_map_to_world(map_est, map_apps, world_points, world_apps)
    arrows = np.concatenate([map_est[mi] * res.scale, world_points[wi]], axis=1)
    io.write_vectors(os.path.join(out_dir, "arrows.txt"), arrows)
    io.write_vectors(os.path.join(out_dir, "world_pruned.txt"), world_points[wi])

    if verbose:
        finite = np.isfinite(res.orientation_errors)
        print(f"ratio used for map correction: {res.scale}")
        print(f"orientation error mean: {np.abs(res.orientation_errors[finite]).mean()}")
        print(f"RMSE position: {res.rmse_position}")
        print(f"RMSE map: {res.rmse_map}  ({res.n_map_matched} landmarks matched)")
    return res


def run_vo_da_known(
    data_dir: str,
    out_dir: str = ".",
    config: Optional[VOConfig] = None,
    verbose: bool = True,
):
    """VO with ground-truth data association (vo_daKnown.cpp).

    Uses the landmark ids carried by the measurement files instead of the
    appearance matcher, and the reference's 1000 GN iterations per frame
    (vo_daKnown.cpp:149-150). Writes ``trajectory_est_noWorld.txt``.
    """
    if config is None:
        config = DEFAULT_CONFIG.replace(gn_iterations=1000)
    os.makedirs(out_dir, exist_ok=True)
    params, camera, seq = _load(data_dir, config)

    t0 = time.perf_counter()
    trajectory, _, outs = pipeline.run_sequence_known_da(
        camera,
        config,
        np.asarray(seq.points),
        np.asarray(seq.appearances),
        np.asarray(seq.mask),
        np.asarray(seq.ids),
    )
    trajectory = np.asarray(trajectory)
    elapsed = time.perf_counter() - t0

    io.save_trajectory(
        os.path.join(out_dir, "trajectory_est_noWorld.txt"), trajectory, params.cam_in_robot
    )
    io.save_trajectory(
        os.path.join(out_dir, "trajectory_est_data.txt"),
        trajectory,
        params.cam_in_robot,
        save_rotation=True,
    )
    if verbose:
        f = len(trajectory)
        print(f"tracked {f} frames (known DA) in {elapsed:.3f}s ({f / elapsed:.1f} frames/s)")
    return trajectory, outs, elapsed


def run_real_init(data_dir: str, out_dir: str = ".", verbose: bool = True):
    """Two-view initialization on the first two real frames.

    Mirrors ``real_init`` (initialization_real_data.cpp): id-ground-truth
    correspondences, 8-point estimate, triangulation dumped (in the robot
    frame) to ``triangulated.txt`` for gnuplot comparison against
    ``world.txt``.
    """
    import jax.numpy as jnp

    from .models import pipeline as pl_mod
    from .ops import epipolar, triangulation

    os.makedirs(out_dir, exist_ok=True)
    params, camera, seq = _load(data_dir, DEFAULT_CONFIG)
    _, world_points, _ = io.load_world(os.path.join(data_dir, "world.dat"))
    io.write_vectors(os.path.join(out_dir, "world.txt"), world_points)

    corr = pl_mod.match_by_ids(
        jnp.asarray(seq.ids[0]), jnp.asarray(seq.mask[0]),
        jnp.asarray(seq.ids[1]), jnp.asarray(seq.mask[1]),
    )
    p0, p1 = jnp.asarray(seq.points[0]), jnp.asarray(seq.points[1])
    m0, m1 = jnp.asarray(seq.mask[0]), jnp.asarray(seq.mask[1])
    x = epipolar.estimate_transform(
        camera.camera_matrix, corr.idx1, corr.idx2, corr.valid, p0, p1, m0, m1
    )
    tri, ok = triangulation.triangulate_correspondences(
        camera.camera_matrix, x, corr.idx1, corr.idx2, corr.valid, p0, p1
    )
    tri = np.asarray(tri)[np.asarray(ok)]
    h = params.cam_in_robot
    tri = tri @ h[:3, :3].T + h[:3, 3]
    io.write_vectors(os.path.join(out_dir, "triangulated.txt"), tri)
    if verbose:
        x = np.asarray(x)
        print("R estimated:\n", x[:3, :3])
        print("t estimated:", x[:3, 3])
        print(f"triangulated {len(tri)} points -> triangulated.txt")
    return x, tri


def run_picp_known_real(
    data_dir: str, out_dir: str = ".", config: Optional[VOConfig] = None, verbose: bool = True
):
    """PICP alone on real data with known world points and known DA.

    Mirrors ``picp_known_real`` (picp_real_data_allKnown.cpp): world points
    are chained into the previous camera frame each step
    (picp_real_data_allKnown.cpp:76-77), correspondences are
    (meas slot, landmark id), 1000 GN rounds/frame, output
    ``trajectory_est.txt``.
    """
    import jax
    import jax.numpy as jnp

    from .ops import picp, se3

    if config is None:
        config = DEFAULT_CONFIG.replace(gn_iterations=1000)
    os.makedirs(out_dir, exist_ok=True)
    params, camera, seq = _load(data_dir, config)
    _, world_points, _ = io.load_world(os.path.join(data_dir, "world.dat"))

    h_inv = np.linalg.inv(params.cam_in_robot).astype(np.float32)

    @jax.jit
    def track(world, points, masks, ids):
        def body(carry, frame):
            world_prev, x_curr = carry
            # world moved into the previous camera's frame
            world_curr = se3.transform_points(x_curr, world_prev)
            pts, mask, fid = frame
            safe = jnp.where(mask, fid, 0)
            wp = world_curr[safe]
            cam0 = camera.with_pose(jnp.eye(4, dtype=world.dtype))
            solved, _ = picp.solve(
                cam0, wp, pts, mask.astype(world.dtype),
                config.gn_iterations,
                kernel_threshold=config.kernel_threshold,
                damping=config.damping,
                tolerance=config.gn_tolerance,
            )
            pose = solved.world_in_camera
            return (world_curr, pose), pose

        (_, _), poses = jax.lax.scan(
            body, (world, jnp.asarray(h_inv)), (points, masks, ids)
        )
        return poses

    t0 = time.perf_counter()
    poses = np.asarray(
        track(
            jnp.asarray(world_points),
            jnp.asarray(seq.points),
            jnp.asarray(seq.mask),
            jnp.asarray(seq.ids),
        )
    )
    elapsed = time.perf_counter() - t0
    io.save_trajectory(os.path.join(out_dir, "trajectory_est.txt"), poses, params.cam_in_robot)
    if verbose:
        print(f"picp_known_real: {len(poses)} frames in {elapsed:.3f}s")
    return poses


def run_compute_corr(data_dir: str, verbose: bool = True):
    """Appearance-DA vs id-ground-truth-DA comparison on the first two frames.

    Mirrors ``compute_corr`` (compute_corr.cpp:114-118) without its
    hardcoded path: reports how many appearance matches agree with the id
    ground truth.
    """
    import jax.numpy as jnp

    from .models import pipeline as pl_mod
    from .ops import matching

    _, _, seq = _load(data_dir, DEFAULT_CONFIG)
    a = matching.match_appearances(
        jnp.asarray(seq.appearances[0]), jnp.asarray(seq.mask[0]),
        jnp.asarray(seq.appearances[1]), jnp.asarray(seq.mask[1]),
    )
    g = pl_mod.match_by_ids(
        jnp.asarray(seq.ids[0]), jnp.asarray(seq.mask[0]),
        jnp.asarray(seq.ids[1]), jnp.asarray(seq.mask[1]),
    )
    a_set = {
        (int(i), int(j))
        for i, j, v in zip(np.asarray(a.idx1), np.asarray(a.idx2), np.asarray(a.valid))
        if v
    }
    g_set = {
        (int(i), int(j))
        for i, j, v in zip(np.asarray(g.idx1), np.asarray(g.idx2), np.asarray(g.valid))
        if v
    }
    agree = len(a_set & g_set)
    if verbose:
        print(
            f"appearance matches: {len(a_set)}, gt matches: {len(g_set)}, "
            f"agreeing: {agree} ({100.0 * agree / max(len(g_set), 1):.1f}%)"
        )
    return a_set, g_set


def run_read_data_test(data_dir: str):
    """Dataset-reader smoke test (read_data_test.cpp)."""
    params, camera, seq = _load(data_dir, DEFAULT_CONFIG)
    _, world_points, world_apps = io.load_world(os.path.join(data_dir, "world.dat"))
    print(f"frames: {len(seq.counts)}, meas per frame min/max: "
          f"{seq.counts.min()}/{seq.counts.max()}")
    print(f"world landmarks: {len(world_points)}")
    print("camera matrix:\n", params.camera_matrix)
    print("cam_in_robot:\n", params.cam_in_robot)
    print(f"z_near={params.z_near} z_far={params.z_far} "
          f"width={params.width} height={params.height}")
    return params, seq


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 2:
        print(__doc__)
        return 1
    cmd, data_dir = argv[0], argv[1]
    out_dir = argv[2] if len(argv) > 2 else "."
    if cmd == "vo_complete":
        run_vo_complete(data_dir, out_dir)
    elif cmd == "evaluation":
        run_evaluation(data_dir, out_dir)
    elif cmd == "vo_daknown":
        run_vo_da_known(data_dir, out_dir)
    elif cmd == "real_init":
        run_real_init(data_dir, out_dir)
    elif cmd == "picp_known_real":
        run_picp_known_real(data_dir, out_dir)
    elif cmd == "compute_corr":
        run_compute_corr(data_dir)
    elif cmd == "read_data_test":
        run_read_data_test(data_dir)
    else:
        print(f"unknown command {cmd!r}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
