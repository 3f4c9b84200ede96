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

import jax
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


def build_observations_coo(
    seq_points: Array,       # (F, S, 2)
    seq_appearances: Array,  # (F, S, D)
    seq_mask: Array,         # (F, S)
    map_appearances: Array,  # (L, D) landmark appearance keys
) -> Tuple[Array, Array, Array, Array]:
    """Flat COO observation list via a DEVICE-side exact-appearance join.

    The sparse-BA form of :func:`build_observations`: instead of an (F, L)
    grid built by a host double loop, returns (frame_idx (N,), lm_idx (N,),
    uv (N, 2), mask (N,)) with N = F*S — memory O(#measurements), never
    O(F*L), and the join runs on device as sort -> segmented fill (the same
    bit-identical-key technique as landmark_map.merge_stream):

      * keys: appearance rows bitcast to int32 columns (exact float
        equality == exact bit equality for the verbatim-carried keys,
        PointCloud.h:56 / evaluate.cpp:76);
      * one multi-key sort over the concatenated [map rows | measurement
        rows] with a kind column ordering each key-run as map-row-first;
      * a segmented max-scan forward-fills each run's landmark index onto
        its measurement rows (rows whose key has no map entry get -1).
    """
    f, s, d = seq_appearances.shape
    l = map_appearances.shape[0]
    t = l + f * s
    apps = jnp.concatenate(
        [map_appearances, seq_appearances.reshape(f * s, d)], axis=0
    )
    keys = jax.lax.bitcast_convert_type(apps.astype(jnp.float32), jnp.int32)
    # Dead measurement slots get a sentinel key so they group together and
    # never join a landmark.
    live = jnp.concatenate(
        [jnp.ones((l,), bool), seq_mask.reshape(f * s)], axis=0
    )
    keys = jnp.where(live[:, None], keys, jnp.int32(2**31 - 1))
    kind = jnp.concatenate(
        [jnp.zeros((l,), jnp.int32), jnp.ones((f * s,), jnp.int32)]
    )
    row = jnp.arange(t, dtype=jnp.int32)
    sorted_ = jax.lax.sort(
        tuple(keys[:, i] for i in range(d)) + (kind, row), num_keys=d + 1
    )
    skeys = jnp.stack(sorted_[:d], axis=1)
    skind = sorted_[d]
    srow = sorted_[d + 1]

    is_new = jnp.concatenate(
        [jnp.ones((1,), bool), jnp.any(skeys[1:] != skeys[:-1], axis=1)]
    )
    # Landmark index where this row IS a map row, else -1; segmented
    # max-scan fills it forward within each equal-key run (map rows sort
    # first via the kind column, so every measurement row in the run sees
    # its landmark).
    lm_here = jnp.where(skind == 0, srow, -1)

    def combine(a, b):
        va, _ = a
        vb, rb = b
        return jnp.where(rb, vb, jnp.maximum(va, vb)), a[1] | rb

    filled, _ = jax.lax.associative_scan(
        combine, (lm_here, is_new)
    )

    # Scatter the joined lm index back to measurement-row order; map rows
    # are routed out of range so mode="drop" discards them (a clamped index
    # would clobber measurement slot 0).
    meas_sel = skind == 1
    meas_pos = jnp.where(meas_sel, srow - l, f * s)
    lm_of_meas = jnp.zeros((f * s,), jnp.int32).at[meas_pos].set(
        filled.astype(jnp.int32), mode="drop"
    )
    has = jnp.zeros((f * s,), bool).at[meas_pos].set(
        filled >= 0, mode="drop"
    )

    frame_idx = jnp.repeat(jnp.arange(f, dtype=jnp.int32), s)
    mask = has & seq_mask.reshape(f * s)
    return (
        frame_idx,
        jnp.where(mask, lm_of_meas, 0),
        seq_points.reshape(f * s, 2),
        mask,
    )


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


def refine_trajectory_sparse(
    camera_matrix: np.ndarray,
    trajectory: np.ndarray,        # (F, 4, 4) relative poses from tracking
    map_state: LandmarkMap,
    seq_points: np.ndarray,
    seq_appearances: np.ndarray,
    seq_mask: np.ndarray,
    num_iterations: int = 15,
    damping: float = 1.0,
    kernel_threshold: float = 10000.0,
    cg_iterations: int = 64,
    cg_tolerance: float = 1e-6,
    mesh=None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, "sba.SparseBAStats"]:
    """Production-scale refinement: COO observations + matrix-free Schur-CG.

    The sparse twin of :func:`refine_trajectory`: the observation join runs
    on device (:func:`build_observations_coo`, no host double loop) and the
    BA step is ``parallel.sparse_ba`` — memory O(#observations), so 512
    poses x 10^5 landmarks fits where the dense (F, L, 6, 3) coupling
    cannot. Small-problem equality with the dense path is asserted in
    tests/test_sparse_ba.py.
    """
    from ..parallel import sparse_ba as sba

    map_pts, map_apps = compact(map_state)
    fi, li, uv, mask = build_observations_coo(
        jnp.asarray(seq_points), jnp.asarray(seq_appearances),
        jnp.asarray(seq_mask), jnp.asarray(map_apps),
    )
    absolute = absolute_from_relative(trajectory)
    k = jnp.asarray(camera_matrix, jnp.float32)

    if mesh is None:
        problem = sba.SparseBAProblem(
            poses=jnp.asarray(absolute), landmarks=jnp.asarray(map_pts),
            frame_idx=fi, lm_idx=li, uv=uv, obs_mask=mask,
        )
        refined, stats = sba.refine_sparse(
            k, problem, num_iterations=num_iterations, damping=damping,
            kernel_threshold=kernel_threshold, cg_iterations=cg_iterations,
            cg_tolerance=cg_tolerance,
        )
        lm_out = np.asarray(refined.landmarks)
    else:
        n_lm = mesh.shape["lm"]
        l = map_pts.shape[0]
        # Per-shard fixed-degree packed layout: every shard's LM-side CG
        # stages run scatter-free (sparse_ba.partition_observations_packed).
        fi_s, li_s, uv_s, mask_s, l_per, degree = (
            sba.partition_observations_packed(
                n_lm, l, np.asarray(fi), np.asarray(li), np.asarray(uv),
                np.asarray(mask),
            )
        )
        lms = np.zeros((n_lm * l_per, 3), np.float32)
        lms[:l] = np.asarray(map_pts)
        problem = sba.SparseBAProblem(
            poses=jnp.asarray(absolute), landmarks=jnp.asarray(lms),
            frame_idx=jnp.asarray(fi_s), lm_idx=jnp.asarray(li_s),
            uv=jnp.asarray(uv_s), obs_mask=jnp.asarray(mask_s),
        )
        step = sba.make_sharded_sparse_ba_step(
            mesh, damping=damping, kernel_threshold=kernel_threshold,
            cg_iterations=cg_iterations, cg_tolerance=cg_tolerance,
            lm_degree=degree,
        )
        for _ in range(num_iterations):
            problem, stats = step(k, problem)
        lm_out = np.asarray(problem.landmarks)[:l]
        refined = problem

    rel = relative_from_absolute(np.asarray(refined.poses))
    return rel, lm_out, np.asarray(map_apps), stats
