"""Global refinement: bundle-adjust the tracked trajectory + landmark map.

The reference stops at frame-to-frame tracking — its map is the raw
last-observation position of each landmark and its trajectory accumulates
drift (SURVEY.md §6). This module adds the stage the reference lacks:
rebuild the full observation graph from the dataset (landmark identity =
exact appearance key, the same invariant the map merge uses,
PointCloud.h:56), then run the landmark-sharded Schur-complement bundle
adjustment (parallel/bundle_adjustment.py) over all poses and landmarks
jointly. This is what turns "parity with the reference's RMSE" into a
robust win, and it is the computation the multi-chip mesh scales.

Conventions: tracking produces RELATIVE poses X_f (frame f-1 expressed in
frame f, vo_complete.cpp:128). Absolute camera-from-world (world = frame-0
camera) poses compose as A_0 = I, A_f = X_f A_{f-1}; the map lives in
frame-0 coords. After refinement the trajectory is folded back to relative
poses X_f = A_f A_{f-1}^-1 so every downstream writer/evaluator is
unchanged.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops import se3
from ..parallel import bundle_adjustment as ba
from .landmark_map import LandmarkMap, compact

Array = jnp.ndarray


def absolute_from_relative(relative: np.ndarray) -> np.ndarray:
    """[X_0..X_{F-1}] relative -> A_f (camera-from-frame0), A_0 = X_0 = I."""
    out = np.zeros_like(relative)
    acc = np.eye(4, dtype=np.float64)
    for f in range(len(relative)):
        acc = relative[f].astype(np.float64) @ acc
        out[f] = acc
    return out.astype(np.float32)


def relative_from_absolute(absolute: np.ndarray) -> np.ndarray:
    out = np.zeros_like(absolute)
    out[0] = np.eye(4, dtype=np.float32)
    for f in range(1, len(absolute)):
        out[f] = (
            absolute[f].astype(np.float64) @ np.linalg.inv(absolute[f - 1].astype(np.float64))
        ).astype(np.float32)
    return out


def build_observations(
    seq_points: np.ndarray,       # (F, S, 2)
    seq_appearances: np.ndarray,  # (F, S, D)
    seq_mask: np.ndarray,         # (F, S)
    map_appearances: np.ndarray,  # (L, D) landmark appearance keys
) -> Tuple[np.ndarray, np.ndarray]:
    """(F, L, 2) pixel observations + (F, L) mask via exact-appearance join.

    A measurement observes landmark l iff its appearance equals the map's
    key exactly (the dataset carries appearances verbatim; same identity
    rule as the map merge and the evaluator, evaluate.cpp:76).
    """
    f, s, _ = seq_points.shape
    l = len(map_appearances)
    key_to_l = {map_appearances[j].tobytes(): j for j in range(l)}
    obs = np.zeros((f, l, 2), np.float32)
    mask = np.zeros((f, l), bool)
    for fi in range(f):
        for si in range(int(seq_mask[fi].sum())):
            j = key_to_l.get(seq_appearances[fi, si].tobytes())
            if j is not None:
                obs[fi, j] = seq_points[fi, si]
                mask[fi, j] = True
    return obs, mask


def refine_trajectory(
    camera_matrix: np.ndarray,
    trajectory: np.ndarray,        # (F, 4, 4) relative poses from tracking
    map_state: LandmarkMap,
    seq_points: np.ndarray,
    seq_appearances: np.ndarray,
    seq_mask: np.ndarray,
    num_iterations: int = 15,
    damping: float = 1.0,
    kernel_threshold: float = 10000.0,
    mesh=None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, "ba.BAStats"]:
    """Run BA over the whole sequence; returns (relative_traj, map_points,
    map_appearances, stats).

    With ``mesh`` (a (dp, lm) jax Mesh) the step runs landmark-sharded via
    shard_map; otherwise single device.
    """
    map_pts, map_apps = compact(map_state)
    obs, obs_mask = build_observations(seq_points, seq_appearances, seq_mask, map_apps)

    absolute = absolute_from_relative(trajectory)
    problem = ba.BAProblem(
        poses=jnp.asarray(absolute),
        landmarks=jnp.asarray(map_pts),
        observations=jnp.asarray(obs),
        obs_mask=jnp.asarray(obs_mask),
    )
    k = jnp.asarray(camera_matrix, jnp.float32)
    if mesh is None:
        refined, stats = ba.refine(
            k, problem, num_iterations=num_iterations, damping=damping,
            kernel_threshold=kernel_threshold,
        )
    else:
        step = ba.make_sharded_ba_step(
            mesh, damping=damping, kernel_threshold=kernel_threshold
        )
        # Pad landmarks to the lm-axis multiple, batch axis of 1 sequence.
        n_lm = mesh.shape["lm"]
        l = map_pts.shape[0]
        l_pad = -(-l // n_lm) * n_lm
        bp = ba.BAProblem(
            poses=problem.poses[None],
            landmarks=jnp.pad(problem.landmarks, ((0, l_pad - l), (0, 0)))[None],
            observations=jnp.pad(problem.observations, ((0, 0), (0, l_pad - l), (0, 0)))[None],
            obs_mask=jnp.pad(problem.obs_mask, ((0, 0), (0, l_pad - l)))[None],
        )
        for _ in range(num_iterations):
            bp, stats = step(k, bp)
        refined = ba.BAProblem(
            poses=bp.poses[0],
            landmarks=bp.landmarks[0, :l],
            observations=problem.observations,
            obs_mask=problem.obs_mask,
        )

    rel = relative_from_absolute(np.asarray(refined.poses))
    return rel, np.asarray(refined.landmarks), map_apps, stats
