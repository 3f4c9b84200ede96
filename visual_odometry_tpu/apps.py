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
    else:
        print(f"unknown command {cmd!r}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
