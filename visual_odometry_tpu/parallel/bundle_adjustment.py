"""Distributed bundle adjustment via landmark-sharded Schur complement.

This subsystem has NO reference counterpart — the reference never refines
jointly over poses and landmarks (its map is the raw last-observation
positions, PointCloud.h:52-66). It is the framework's scaling story per
BASELINE.json's north star and SURVEY.md §5/§7: couple per-shard tracking
through a global refinement whose landmark work is embarrassingly parallel
and whose only cross-chip traffic is one small ``psum`` per iteration.

Problem: minimize the robust reprojection error
    sum_{f,l} rho( || pi(K, X_f, p_l) - z_{f,l} ||^2 )
over camera poses X_f (world->camera) and landmark positions p_l, with a
dense masked observation grid z (F, L, 2).

Levenberg-Marquardt-damped Gauss-Newton step with Schur complement:
  * per-observation Jacobians: J_pose (2,6) exactly as the PICP solver
    (picp_solver.cpp:37-52 structure: Jp K [I | -skew(p_cam)]), and
    J_lm = Jp K R_f (2,3);
  * landmark blocks H_ll (L,3,3), coupling blocks W (F,L,6,3) and the pose
    system are accumulated locally per landmark shard;
  * the reduced pose system
        S  = H_pp + lambda I - sum_l W_l Hll_l^-1 W_l^T     (6F, 6F)
        b~ = b_p - sum_l W_l Hll_l^-1 b_l
    is psum'ed over the ``lm`` mesh axis (the ONLY collective) and solved
    replicated on every chip (F is small; the landmark count is the axis
    that scales);
  * landmark updates back-substitute locally:
        dx_l = -Hll_l^-1 (b_l + W_l^T dx_p).

Gauge: pose 0 is held fixed (its 6x6 block in S is replaced by the
identity and its residual zeroed) — the monocular scale gauge is handled
by LM damping on the landmark blocks.

Pose updates use the same Euler chart as tracking:
``X <- v2tEuler(dx) X`` (utils.h:73-78).

The single-device entry point :func:`ba_step` is the numerical reference;
:func:`make_sharded_ba_step` wraps it in ``shard_map`` over a (dp, lm)
mesh — ``dp`` batches independent sequences, ``lm`` shards landmarks.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import se3

Array = jnp.ndarray


class BAProblem(NamedTuple):
    """A bundle-adjustment instance (one sequence)."""

    poses: Array          # (F, 4, 4) world->camera
    landmarks: Array      # (L, 3) world coords
    observations: Array   # (F, L, 2) pixel measurements
    obs_mask: Array       # (F, L) bool


class BAStats(NamedTuple):
    chi: Array            # () total robust chi^2
    num_obs: Array        # () int32 live observations


def _residuals_and_jacobians(
    camera_matrix: Array, poses: Array, landmarks: Array, observations: Array, obs_mask: Array,
    kernel_threshold: float,
):
    """All per-observation quantities, batched over the full (F, L) grid."""
    r = poses[:, :3, :3]                       # (F, 3, 3)
    t = poses[:, :3, 3]                        # (F, 3)
    # p_cam[f, l] = R_f p_l + t_f
    p_cam = jnp.einsum("fij,lj->fli", r, landmarks) + t[:, None, :]
    p_hom = jnp.einsum("ij,flj->fli", camera_matrix, p_cam)
    z = p_hom[..., 2]
    safe_z = jnp.where(z == 0.0, 1.0, z)
    uv = p_hom[..., :2] / safe_z[..., None]
    in_front = z > 1e-3
    err = uv - observations                     # (F, L, 2)

    iz = 1.0 / safe_z
    iz2 = iz * iz
    zero = jnp.zeros_like(iz)
    jp = jnp.stack(
        [
            jnp.stack([iz, zero, -p_hom[..., 0] * iz2], -1),
            jnp.stack([zero, iz, -p_hom[..., 1] * iz2], -1),
        ],
        -2,
    )                                           # (F, L, 2, 3)
    jpk = jnp.einsum("flij,jk->flik", jp, camera_matrix)  # (F, L, 2, 3)

    # J_pose = JpK [I | -skew(p_cam)]  (2, 6)
    j_t = jpk                                   # translation part
    j_w = jnp.einsum("flij,fljk->flik", jpk, se3.skew(-p_cam))
    j_pose = jnp.concatenate([j_t, j_w], axis=-1)  # (F, L, 2, 6)
    # J_lm = JpK R_f
    j_lm = jnp.einsum("flij,fjk->flik", jpk, r)

    chi = jnp.sum(err * err, -1)                # (F, L)
    lam = jnp.where(
        chi > kernel_threshold, jnp.sqrt(kernel_threshold / jnp.maximum(chi, 1e-30)), 1.0
    )
    w = obs_mask.astype(err.dtype) * in_front.astype(err.dtype) * lam
    return err, j_pose, j_lm, w, chi


def _assemble(camera_matrix, poses, landmarks, observations, obs_mask, kernel_threshold):
    err, j_pose, j_lm, w, chi = _residuals_and_jacobians(
        camera_matrix, poses, landmarks, observations, obs_mask, kernel_threshold
    )
    wj_pose = j_pose * w[..., None, None]
    h_pp = jnp.einsum("flai,flaj->fij", wj_pose, j_pose)     # (F, 6, 6)
    b_p = jnp.einsum("flai,fla->fi", wj_pose, err)           # (F, 6)
    h_ll = jnp.einsum("flai,flaj->lij", j_lm * w[..., None, None], j_lm)  # (L, 3, 3)
    b_l = jnp.einsum("flai,fla->li", j_lm * w[..., None, None], err)      # (L, 3)
    w_pl = jnp.einsum("flai,flaj->flij", wj_pose, j_lm)      # (F, L, 6, 3)
    stats = BAStats(
        chi=jnp.sum(chi * w), num_obs=jnp.sum((w > 0).astype(jnp.int32))
    )
    return h_pp, b_p, h_ll, b_l, w_pl, stats


def _schur_contributions(h_ll, b_l, w_pl, damping):
    """Per-landmark-shard pieces of the reduced pose system."""
    l = h_ll.shape[0]
    h_ll_d = h_ll + damping * jnp.broadcast_to(jnp.eye(3, dtype=h_ll.dtype), h_ll.shape)
    h_ll_inv = jnp.linalg.inv(h_ll_d)                        # (L, 3, 3)
    # Y[f, l] = W[f, l] Hll_l^-1   (F, L, 6, 3)
    y = jnp.einsum("flij,ljk->flik", w_pl, h_ll_inv)
    # S_red[f, g] = sum_l Y[f, l] W[g, l]^T   (F, F, 6, 6)
    s_red = jnp.einsum("flik,gljk->fgij", y, w_pl)
    b_red = jnp.einsum("flik,lk->fi", y, b_l)                # (F, 6)
    return h_ll_inv, s_red, b_red


def _solve_pose_system(h_pp, b_p, s_red, b_red, damping, fix_first: bool = True):
    f = h_pp.shape[0]
    s = -s_red
    s = s.at[jnp.arange(f), jnp.arange(f)].add(
        h_pp + damping * jnp.broadcast_to(jnp.eye(6, dtype=h_pp.dtype), h_pp.shape)
    )
    b = b_p - b_red                                          # (F, 6)
    big = s.transpose(0, 2, 1, 3).reshape(6 * f, 6 * f)
    rhs = b.reshape(6 * f)
    if fix_first:
        # Gauge: clamp pose 0 (dx_0 = 0).
        mask = jnp.arange(6 * f) >= 6
        big = jnp.where(mask[:, None] & mask[None, :], big, 0.0)
        big = big + jnp.diag(jnp.where(mask, 0.0, 1.0))
        rhs = jnp.where(mask, rhs, 0.0)
    dx = jnp.linalg.solve(big, -rhs)
    return dx.reshape(f, 6)


def ba_step(
    camera_matrix: Array,
    problem: BAProblem,
    damping: float = 1.0,
    kernel_threshold: float = 10000.0,
    fix_first: bool = True,
) -> Tuple[BAProblem, BAStats]:
    """One LM/GN step on a single device (numerical reference)."""
    h_pp, b_p, h_ll, b_l, w_pl, stats = _assemble(
        camera_matrix, problem.poses, problem.landmarks,
        problem.observations, problem.obs_mask, kernel_threshold,
    )
    h_ll_inv, s_red, b_red = _schur_contributions(h_ll, b_l, w_pl, damping)
    dx_p = _solve_pose_system(h_pp, b_p, s_red, b_red, damping, fix_first)
    # Back-substitute landmarks: dx_l = -Hll^-1 (b_l + W^T dx_p)
    wt_dx = jnp.einsum("flij,fi->lj", w_pl, dx_p)
    dx_l = -jnp.einsum("lij,lj->li", h_ll_inv, b_l + wt_dx)

    new_poses = se3.v2t_euler(dx_p) @ problem.poses
    new_landmarks = problem.landmarks + dx_l
    return problem._replace(poses=new_poses, landmarks=new_landmarks), stats


def make_sharded_ba_step(
    mesh: Mesh,
    damping: float = 1.0,
    kernel_threshold: float = 10000.0,
    lm_axis: str = "lm",
    dp_axis: Optional[str] = "dp",
):
    """Build the jitted multi-chip BA step over a (dp, lm) mesh.

    Input arrays carry a leading batch axis (sequences) sharded over
    ``dp_axis``; landmarks/observations are sharded over ``lm_axis``.
    Returns ``step(camera_matrix, problem) -> (problem, stats)``.
    """

    def local_step(camera_matrix, poses, landmarks, observations, obs_mask):
        # Everything below runs per (dp shard, lm shard); psum over lm
        # assembles the global reduced system.
        h_pp, b_p, h_ll, b_l, w_pl, stats = _assemble(
            camera_matrix, poses, landmarks, observations, obs_mask, kernel_threshold
        )
        h_ll_inv, s_red, b_red = _schur_contributions(h_ll, b_l, w_pl, damping)
        h_pp = jax.lax.psum(h_pp, lm_axis)
        b_p = jax.lax.psum(b_p, lm_axis)
        s_red = jax.lax.psum(s_red, lm_axis)
        b_red = jax.lax.psum(b_red, lm_axis)
        dx_p = _solve_pose_system(h_pp, b_p, s_red, b_red, damping)
        wt_dx = jnp.einsum("flij,fi->lj", w_pl, dx_p)
        dx_l = -jnp.einsum("lij,lj->li", h_ll_inv, b_l + wt_dx)
        new_poses = se3.v2t_euler(dx_p) @ poses
        stats = BAStats(
            chi=jax.lax.psum(stats.chi, lm_axis),
            num_obs=jax.lax.psum(stats.num_obs, lm_axis),
        )
        return new_poses, landmarks + dx_l, stats

    # Per-sequence function vmapped over the dp batch inside each shard.
    def batched(camera_matrix, poses, landmarks, observations, obs_mask):
        return jax.vmap(local_step, in_axes=(None, 0, 0, 0, 0))(
            camera_matrix, poses, landmarks, observations, obs_mask
        )

    dp = dp_axis if dp_axis else None
    in_specs = (
        P(),                      # camera matrix replicated
        P(dp),                    # poses (B, F, 4, 4)
        P(dp, lm_axis),           # landmarks (B, L, 3)
        P(dp, None, lm_axis),     # observations (B, F, L, 2)
        P(dp, None, lm_axis),     # obs mask (B, F, L)
    )
    out_specs = (P(dp), P(dp, lm_axis), P(dp))

    sharded = jax.shard_map(batched, mesh=mesh, in_specs=in_specs, out_specs=out_specs)

    @jax.jit
    def step(camera_matrix, problem: BAProblem) -> Tuple[BAProblem, BAStats]:
        poses, landmarks, stats = sharded(
            camera_matrix,
            problem.poses,
            problem.landmarks,
            problem.observations,
            problem.obs_mask,
        )
        return problem._replace(poses=poses, landmarks=landmarks), stats

    return step


def refine(
    camera_matrix: Array,
    problem: BAProblem,
    num_iterations: int = 10,
    damping: float = 1.0,
    kernel_threshold: float = 10000.0,
) -> Tuple[BAProblem, BAStats]:
    """Single-device iterative refinement (jit + fori_loop)."""

    def body(_, carry):
        prob, _ = carry
        return ba_step(camera_matrix, prob, damping, kernel_threshold)

    stats0 = BAStats(chi=jnp.zeros(()), num_obs=jnp.zeros((), jnp.int32))
    return jax.lax.fori_loop(0, num_iterations, body, (problem, stats0))
