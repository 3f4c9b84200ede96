"""The ENTIRE per-frame tracking step as one Pallas kernel, grid over frames.

The scan form of the pipeline (models/pipeline._run) compiles to ~38 device
kernels per frame (gathers, the solver custom-call, triangulation fusions,
scatter updates); at 119 sequential frames the per-kernel sequencing
overhead dominates the program (~4 ms of a 5.7 ms trace). Here the whole
frame loop — lookup-join, Gauss-Newton PICP, mid-point triangulation and
the first-wins lookup scatter — runs inside ONE kernel launched once, as
an in-kernel ``fori_loop`` over VMEM-resident per-frame blocks with the
carried state (pose, previous triangulation, measurement->slot lookup) in
loop carries. (A sequential grid over frames pays ~25 us of Mosaic
sequencing per step — 10x the actual per-frame compute; the in-kernel
loop pays it once.)

Reference semantics reproduced (same contracts as models/pipeline.frame_step,
citations therein): the join of vo_complete.cpp:52-66, the solver of
picp_solver.cpp:25-112, the triangulation of utils.cpp:36-134 and the
query-order first-wins correspondence re-encoding of utils.cpp:98.

TPU-native formulation notes:
  * All per-correspondence data live on the 128-lane axis as (R, S) rows.
  * Gathers ``src[idx]`` become one-hot matmuls: ``oh[s, j] = (idx[j] == s)``
    built from a sublane iota, then ``src_rows @ oh`` on the MXU — several
    gathers of the same index vector share one matmul by stacking rows.
    Dots run at HIGHEST precision: a bf16 pass would round the *gathered
    values* (pixel coords are O(600)).
  * The scatter-min that rebuilds the lookup is a lane-min over a masked
    (slot, target) value matrix; the result is carried as a (S, 1) COLUMN,
    which is exactly the orientation the next frame's gather contraction
    wants (no transposes anywhere).
  * The GN loop is the shared ``picp_kernel.gn_loop`` early-exit while_loop.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .picp_kernel import _inv3, _mat3mul, _mat3vec, _transpose3, gn_loop

Array = jnp.ndarray

_HIGH = jax.lax.Precision.HIGHEST
_BIG = 3.4e38
# Rays closer to parallel than this are rejected (ops/triangulation._DET_EPS).
_DET_EPS = 1e-12


def _onehot(idx_row: Array, s: int) -> Array:
    """(1, S) f32 index row -> (S, S) one-hot with oh[s, j] = (idx[j] == s)."""
    # Mosaic requires integer iota; cast to f32 afterwards.
    sub = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0).astype(jnp.float32)
    return (sub == idx_row).astype(jnp.float32)


def _gather(rows: Array, oh: Array) -> Array:
    """(R, S) @ (S, S) one-hot -> (R, S) gathered rows, exact f32."""
    return jax.lax.dot_general(
        rows, oh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HIGH,
    )


def _kernel(
    num_iterations,
    min_iterations,
    num_frames,
    scal_ref,       # SMEM (C, 40): params + K + iK + init pose, per chunk
    corr_ref,       # (F, 3, S): idx1, idx2, valid rows per frame   [chunk c]
    prev_ref,       # (F, 2, S): prev-frame pixel coords            [chunk c]
    cur_ref,        # (F, 2, S): current-frame pixel coords         [chunk c]
    init_lut_ref,   # (S, 1): initial lookup column (f32, -1 = none) [chunk c]
    init_tri_ref,   # (4, S): initial tri x/y/z/ok rows              [chunk c]
    out_ref,        # (F, 8, S): pose row, stats row, tri x/y/z/ok rows
):
    """One chunk's ENTIRE frame loop in one grid step.

    The previous formulation ran one grid step per frame; at ~2 us of
    actual per-frame compute the fixed Mosaic grid-step sequencing cost
    (~25 us/step measured on v5e) dominated the whole tracking program.
    Here the frame axis is an in-kernel ``fori_loop`` over VMEM-resident
    per-frame blocks (a 121-frame sequence is ~1.5 MB — far below VMEM),
    so the sequencing cost is paid ONCE per chunk and the carried state
    (pose scalars, lookup column, triangulation rows) lives in loop
    carries instead of cross-step scratch.
    """
    c = pl.program_id(0)
    s = corr_ref.shape[-1]

    z_near, z_far = scal_ref[c, 0], scal_ref[c, 1]
    cols, rows = scal_ref[c, 2], scal_ref[c, 3]
    kt, keep_out = scal_ref[c, 4], scal_ref[c, 5]
    damping, tol = scal_ref[c, 6], scal_ref[c, 7]
    warm = scal_ref[c, 8]
    min_inl = scal_ref[c, 9]
    k = tuple(scal_ref[c, 10 + j] for j in range(9))   # K row-major
    ik = tuple(scal_ref[c, 19 + j] for j in range(9))  # K^-1 row-major

    def frame_body(i, carry):
        lut_col, tri_rows, *pose = carry

        idx1 = corr_ref[i, 0, :]
        idx2 = corr_ref[i, 1, :]
        cvalid = corr_ref[i, 2, :]

        # ---- lookup-join (vo_complete.cpp:52-66 / pipeline.frame_step) --
        # tri_in_prev = x_curr * tri  (vo_complete.cpp:159), rows (3, S).
        tx, ty, tz = tri_rows[0, :], tri_rows[1, :], tri_rows[2, :]
        tok = tri_rows[3, :]
        px = pose[0] * tx + pose[1] * ty + pose[2] * tz + pose[3]
        py = pose[4] * tx + pose[5] * ty + pose[6] * tz + pose[7]
        pz = pose[8] * tx + pose[9] * ty + pose[10] * tz + pose[11]

        oh1 = _onehot(idx1.reshape(1, s), s)
        # lookup[idx1]: the carried column broadcast against the one-hot,
        # folded with a sublane reduction (exact — one live element per
        # column).
        world_slot = jnp.sum(lut_col * oh1, axis=0)
        has_world = (cvalid > 0.5) & (world_slot >= 0.0)
        safe_slot = jnp.where(has_world, world_slot, 0.0)

        ohs = _onehot(safe_slot.reshape(1, s), s)
        g = _gather(jnp.stack([px, py, pz, tok]), ohs)      # (4, S)
        wx, wy, wz, sok = g[0, :], g[1, :], g[2, :], g[3, :]
        weight = has_world.astype(jnp.float32) * sok

        oh2 = _onehot(idx2.reshape(1, s), s)
        mcur = _gather(cur_ref[i], oh2)                     # (2, S) measured
        mx, my = mcur[0, :], mcur[1, :]

        # ---- PICP Gauss-Newton (picp_solver.cpp:98-112, early-exit) ----
        # Sanitize dead slots exactly like ops.picp.solve: 0 * NaN = NaN
        # would poison the in-loop H/b lane reductions.
        live = weight > 0.0
        gwx = jnp.where(live, wx, 1.0)
        gwy = jnp.where(live, wy, 1.0)
        gwz = jnp.where(live, wz, 1.0)
        gmx = jnp.where(live, mx, 0.0)
        gmy = jnp.where(live, my, 0.0)
        eye = (1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0)
        pose0 = tuple(
            jnp.where(warm > 0.5, pose[j], eye[j]) for j in range(12)
        )
        final = gn_loop(
            num_iterations, k, pose0, gwx, gwy, gwz, gmx, gmy, weight,
            z_near, z_far, cols, rows, kt, keep_out, damping, tol, min_inl,
            min_iterations,
        )
        new_pose = final[0:12]
        chi_in, chi_out, n_in = final[13], final[14], final[15]

        # ---- mid-point triangulation, prev-frame coords (utils.cpp:36-76) -
        p1 = _gather(prev_ref[i], oh1)                      # (2, S) image-1
        u1, v1 = p1[0, :], p1[1, :]
        u2, v2 = mx, my
        # i_x = inverse(new_pose): R^T, -R^T t.
        r = (new_pose[0], new_pose[1], new_pose[2],
             new_pose[4], new_pose[5], new_pose[6],
             new_pose[8], new_pose[9], new_pose[10])
        rt = _transpose3(r)
        t_vec = (new_pose[3], new_pose[7], new_pose[11])
        it = tuple(-x for x in _mat3vec(rt, t_vec))
        ir_ik = _mat3mul(rt, ik)
        d1x = ik[0] * u1 + ik[1] * v1 + ik[2]
        d1y = ik[3] * u1 + ik[4] * v1 + ik[5]
        d1z = ik[6] * u1 + ik[7] * v1 + ik[8]
        d2x = ir_ik[0] * u2 + ir_ik[1] * v2 + ir_ik[2]
        d2y = ir_ik[3] * u2 + ir_ik[4] * v2 + ir_ik[5]
        d2z = ir_ik[6] * u2 + ir_ik[7] * v2 + ir_ik[8]
        a00 = d1x * d1x + d1y * d1y + d1z * d1z
        a01 = -(d1x * d2x + d1y * d2y + d1z * d2z)
        a11 = d2x * d2x + d2y * d2y + d2z * d2z
        b0 = d1x * it[0] + d1y * it[1] + d1z * it[2]
        b1 = -(d2x * it[0] + d2y * it[1] + d2z * it[2])
        det = a00 * a11 - a01 * a01
        safe_det = jnp.where(jnp.abs(det) < _DET_EPS, 1.0, det)
        s0 = (a11 * b0 - a01 * b1) / safe_det
        s1 = (a00 * b1 - a01 * b0) / safe_det
        new_ok = (
            (cvalid > 0.5) & (s0 >= 0.0) & (s1 >= 0.0)
            & (jnp.abs(det) >= _DET_EPS)
        )
        vx = 0.5 * (s0 * d1x + it[0] + s1 * d2x)
        vy = 0.5 * (s0 * d1y + it[1] + s1 * d2y)
        vz = 0.5 * (s0 * d1z + it[2] + s1 * d2z)
        # Finiteness guard (ops/triangulation contract): a non-finite or
        # overflow-adjacent "valid" triangulation would NaN-poison the next
        # frame's GN lane reductions through inf * 0.
        new_ok = (
            new_ok
            & (jnp.abs(vx) < 1e18) & (jnp.abs(vy) < 1e18)
            & (jnp.abs(vz) < 1e18)
        )
        okf = new_ok.astype(jnp.float32)
        # where(), not multiply-by-mask: garbage lanes may be non-finite.
        ntx = jnp.where(new_ok, vx, 0.0)
        nty = jnp.where(new_ok, vy, 0.0)
        ntz = jnp.where(new_ok, vz, 0.0)

        # ---- first-wins lookup rebuild (_lookup_from_corr scatter-min) ----
        lanes = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1).astype(
            jnp.float32
        )
        contrib = (cvalid > 0.5) & new_ok
        # value[t, j] = j if (idx2[j] == t and contrib[j]) else BIG; min
        # over j.
        tgt = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0).astype(
            jnp.float32
        )
        vals = jnp.where(
            (tgt == idx2.reshape(1, s)) & contrib.reshape(1, s), lanes, _BIG
        )
        lut_min = jnp.min(vals, axis=1, keepdims=True)       # (S, 1)
        new_lut = jnp.where(lut_min < _BIG, lut_min, -1.0)

        # ---- emit this frame's rows, carry the state ----
        pose_row = jnp.pad(jnp.stack(new_pose), (0, s - 12))
        stats_row = jnp.pad(
            jnp.stack([chi_in, chi_out, n_in, jnp.sum(weight)]), (0, s - 4)
        )
        new_tri_rows = jnp.stack([ntx, nty, ntz, okf])       # (4, S)
        out_ref[i] = jnp.concatenate(
            [
                pose_row.reshape(1, s),
                stats_row.reshape(1, s),
                new_tri_rows,
                jnp.zeros((2, s), jnp.float32),
            ]
        )
        return (new_lut, new_tri_rows) + new_pose

    init = (
        init_lut_ref[:, :],
        init_tri_ref[:, :],
    ) + tuple(scal_ref[c, 28 + j] for j in range(12))
    jax.lax.fori_loop(0, num_frames, frame_body, init)


def _run_batched(
    num_iterations: int,
    min_iterations: int,
    keep_outliers: bool,
    warm_start: bool,
    interpret: bool,
    camera_matrix: Array,     # (C, 3, 3)
    cam_params: Array,        # (C, 4)
    x_init: Array,            # (C, 4, 4)
    init_lookup: Array,       # (C, S)
    init_tri: Array,          # (C, S, 3)
    init_tri_ok: Array,       # (C, S)
    corr_idx1: Array,         # (C, F, S)
    corr_idx2: Array,         # (C, F, S)
    corr_valid: Array,        # (C, F, S)
    prev_points: Array,       # (C, F, S, 2)
    cur_points: Array,        # (C, F, S, 2)
    kernel_threshold: Array,  # (C,)
    damping: Array,           # (C,)
    tolerance: Array,         # (C,)
    min_num_inliers: Array,   # (C,)
) -> Tuple[Array, Array, Array, Array]:
    """Chunk-batched fused tracking: grid (C,), whole frame loop per step.

    Chunks are independent; each grid step runs its chunk's entire frame
    loop as an in-kernel fori_loop over VMEM-resident frame blocks (see
    ``_kernel``).
    """
    c, f, s = corr_idx1.shape
    corr = jnp.stack(
        [
            corr_idx1.astype(jnp.float32),
            corr_idx2.astype(jnp.float32),
            corr_valid.astype(jnp.float32),
        ],
        axis=2,
    )                                                     # (C, F, 3, S)
    prev_t = prev_points.transpose(0, 1, 3, 2)            # (C, F, 2, S)
    cur_t = cur_points.transpose(0, 1, 3, 2)

    def make_scal(cm, cp, x0, kt, dmp, tol, min_inl):
        return jnp.concatenate(
            [
                cp.astype(jnp.float32),
                jnp.stack(
                    [
                        kt.astype(jnp.float32),
                        jnp.asarray(1.0 if keep_outliers else 0.0, jnp.float32),
                        dmp.astype(jnp.float32),
                        tol.astype(jnp.float32),
                        jnp.asarray(1.0 if warm_start else 0.0, jnp.float32),
                        min_inl.astype(jnp.float32),
                    ]
                ),
                cm.reshape(9).astype(jnp.float32),
                jnp.linalg.inv(cm).reshape(9).astype(jnp.float32),
                x0[:3, :4].reshape(12).astype(jnp.float32),
            ]
        )

    scal = jax.vmap(make_scal)(
        camera_matrix, cam_params, x_init, kernel_threshold, damping, tolerance,
        min_num_inliers,
    )                                                     # (C, 40)
    init_lut = init_lookup.astype(jnp.float32).reshape(c, s, 1)
    init_tri_rows = jnp.concatenate(
        [
            init_tri.transpose(0, 2, 1),
            init_tri_ok.astype(jnp.float32).reshape(c, 1, s),
        ],
        axis=1,
    )                                                     # (C, 4, S)

    out = pl.pallas_call(
        functools.partial(_kernel, num_iterations, min_iterations, f),
        grid=(c,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (None, f, 3, s), lambda c: (c, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, f, 2, s), lambda c: (c, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, f, 2, s), lambda c: (c, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, s, 1), lambda c: (c, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (None, 4, s), lambda c: (c, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, f, 8, s), lambda c: (c, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((c, f, 8, s), jnp.float32),
        interpret=interpret,
    )(scal, corr, prev_t, cur_t, init_lut, init_tri_rows)

    pose_rows = out[:, :, 0, :12].reshape(c, f, 3, 4)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32).reshape(1, 1, 1, 4),
        (c, f, 1, 4),
    )
    poses = jnp.concatenate([pose_rows, bottom], axis=2)
    tri = out[:, :, 2:5, :].transpose(0, 1, 3, 2)
    tri_ok = out[:, :, 5, :] > 0.5
    stats = out[:, :, 1, :4]
    return poses, tri, tri_ok, stats


@functools.lru_cache(maxsize=None)
def _fused_fn(num_iterations, min_iterations, keep_outliers, warm_start, interpret):
    """custom_vmap-wrapped single-sequence tracker for these static options.

    vmap-ing the fused call (the chunk axis of parallel/posegraph) must NOT
    go through Pallas' generic batching rule — it blocks SMEM operands —
    so the batch rule dispatches to the explicit (C, F) grid kernel, whose
    chunk axis costs nothing extra (same scratch, same per-frame blocks).
    """

    @jax.custom_batching.custom_vmap
    def fn(
        camera_matrix, cam_params, x_init, init_lookup, init_tri, init_tri_ok,
        corr_idx1, corr_idx2, corr_valid, prev_points, cur_points,
        kernel_threshold, damping, tolerance, min_num_inliers,
    ):
        args = (
            camera_matrix, cam_params, x_init, init_lookup, init_tri,
            init_tri_ok, corr_idx1, corr_idx2, corr_valid, prev_points,
            cur_points, kernel_threshold, damping, tolerance, min_num_inliers,
        )
        outs = _run_batched(
            num_iterations, min_iterations, keep_outliers, warm_start, interpret,
            *(a[None] for a in args),
        )
        return jax.tree.map(lambda x: x[0], outs)

    @fn.def_vmap
    def _fn_vmap(axis_size, in_batched, *args):
        args_b = tuple(
            a if b else jnp.broadcast_to(a, (axis_size,) + jnp.shape(a))
            for a, b in zip(args, in_batched)
        )
        outs = _run_batched(
            num_iterations, min_iterations, keep_outliers, warm_start,
            interpret, *args_b
        )
        return outs, jax.tree.map(lambda _: True, outs)

    return fn


def track_frames_fused(
    camera_matrix: Array,     # (3, 3)
    cam_params: Array,        # (4,) z_near, z_far, cols, rows
    x_init: Array,            # (4, 4) carried pose entering the loop
    init_lookup: Array,       # (S,) int32 measurement->slot lookup (-1 none)
    init_tri: Array,          # (S, 3) carried triangulation
    init_tri_ok: Array,       # (S,) bool
    corr_idx1: Array,         # (F, S) int32
    corr_idx2: Array,         # (F, S) int32
    corr_valid: Array,        # (F, S) bool
    prev_points: Array,       # (F, S, 2) reference-frame pixels per step
    cur_points: Array,        # (F, S, 2) current-frame pixels per step
    num_iterations: int,
    kernel_threshold: Array,
    damping: Array,
    tolerance: Array,
    keep_outliers: bool = False,
    warm_start: bool = False,
    interpret: bool = False,
    min_num_inliers: Array = 0.0,
    min_iterations: int = 1,
) -> Tuple[Array, Array, Array, Array]:
    """Run the whole F-frame tracking loop in one kernel launch.

    Returns (poses (F, 4, 4), tri_points (F, S, 3), tri_valid (F, S),
    stats (F, 4) = [chi_inliers, chi_outliers, num_inliers, num_solver_corr])
    — bitwise the same contract as scanning models/pipeline.frame_step with
    merge_map=False (the map merge is hoisted by the caller either way).
    vmap over a leading chunk axis folds into the kernel grid (see _fused_fn).
    """
    fn = _fused_fn(
        int(num_iterations), int(min_iterations), bool(keep_outliers),
        bool(warm_start), bool(interpret)
    )
    return fn(
        camera_matrix,
        cam_params,
        x_init,
        init_lookup,
        init_tri,
        init_tri_ok,
        corr_idx1,
        corr_idx2,
        corr_valid,
        prev_points,
        cur_points,
        jnp.asarray(kernel_threshold, jnp.float32),
        jnp.asarray(damping, jnp.float32),
        jnp.asarray(tolerance, jnp.float32),
        jnp.asarray(min_num_inliers, jnp.float32),
    )
