"""Fused PICP linearization (project -> Jacobian -> H/b) as a Pallas kernel.

The XLA path (``ops/picp.linearize``) materializes the per-correspondence
Jacobian tensor J (N, 2, 6) in HBM before the H/b contraction; at production
correspondence counts that intermediate dominates HBM traffic. This kernel
streams point tiles through VMEM, builds the Jacobian rows in registers and
folds them straight into the 6x6 normal system:

    traffic = N * (3 + 2 + 1) floats in, 8x128 accumulator out
    compute = two (6, T) x (T, 6) MXU contractions per tile

Layouts are transposed — world (3, N), measurements (2, N), weights (1, N) —
so the point axis rides the 128-lane dimension.

Semantics replicate ``picp_solver.cpp:25-96`` exactly like the JAX path:
frustum/image-bounds validity, saturating robust kernel
(chi > thr => sqrt(thr/chi)), outliers dropped unless ``keep_outliers``.

Output is one (8, 128) accumulator block:
    [0:6, 0:6]  H
    [6,   0:6]  b
    [7,   0:3]  (chi_inliers, chi_outliers, num_inliers)
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..picp import PICPStats

Array = jnp.ndarray


def _kernel(scal_ref, pose_ref, k_ref, world_ref, meas_ref, w_ref, out_ref, acc):
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        acc[:, :] = jnp.zeros_like(acc)

    z_near = scal_ref[0]
    z_far = scal_ref[1]
    cols = scal_ref[2]
    rows = scal_ref[3]
    kt = scal_ref[4]
    keep_outliers = scal_ref[5]

    r = pose_ref[:, 0:3]          # (3, 3)
    t = pose_ref[:, 3]            # (3,)
    k = k_ref[:, :]               # (3, 3)

    wx = world_ref[0, :]
    wy = world_ref[1, :]
    wz = world_ref[2, :]

    # p_cam = R w + t, fully unrolled over the 3x3 (lane-wise FMAs).
    px = r[0, 0] * wx + r[0, 1] * wy + r[0, 2] * wz + t[0]
    py = r[1, 0] * wx + r[1, 1] * wy + r[1, 2] * wz + t[1]
    pz = r[2, 0] * wx + r[2, 1] * wy + r[2, 2] * wz + t[2]

    # p_hom = K p_cam (K upper-triangular for pinhole, but keep general).
    hx = k[0, 0] * px + k[0, 1] * py + k[0, 2] * pz
    hy = k[1, 0] * px + k[1, 1] * py + k[1, 2] * pz
    hz = k[2, 0] * px + k[2, 1] * py + k[2, 2] * pz

    iz = 1.0 / jnp.where(hz == 0.0, 1.0, hz)
    u = hx * iz
    v = hy * iz
    valid = (
        (pz <= z_far) & (pz >= z_near)
        & (u >= 0.0) & (u <= cols - 1.0)
        & (v >= 0.0) & (v <= rows - 1.0)
    )

    ex = u - meas_ref[0, :]
    ey = v - meas_ref[1, :]
    chi = ex * ex + ey * ey
    is_out = chi > kt
    lam = jnp.where(is_out, jnp.sqrt(kt / jnp.maximum(chi, 1e-30)), 1.0)
    live = w_ref[0, :] * valid.astype(jnp.float32)
    contrib = live * jnp.where(is_out, keep_outliers, 1.0)
    wgt = contrib * lam

    # A = Jp K  (2, 3) per point; Jp = [[iz, 0, -hx iz^2], [0, iz, -hy iz^2]]
    iz2 = iz * iz
    a00 = k[0, 0] * iz - k[2, 0] * hx * iz2
    a01 = k[0, 1] * iz - k[2, 1] * hx * iz2
    a02 = k[0, 2] * iz - k[2, 2] * hx * iz2
    a10 = k[1, 0] * iz - k[2, 0] * hy * iz2
    a11 = k[1, 1] * iz - k[2, 1] * hy * iz2
    a12 = k[1, 2] * iz - k[2, 2] * hy * iz2

    # J = [A | A skew(-p_cam)]; skew(-p) = [[0, p_z, -p_y], [-p_z, 0, p_x], [p_y, -p_x, 0]]
    jx3 = a01 * (-pz) + a02 * py
    jx4 = a00 * pz + a02 * (-px)
    jx5 = a00 * (-py) + a01 * px
    jy3 = a11 * (-pz) + a12 * py
    jy4 = a10 * pz + a12 * (-px)
    jy5 = a10 * (-py) + a11 * px

    sw = jnp.sqrt(wgt)  # weight split across both factors of J^T J
    jx = jnp.stack([a00 * sw, a01 * sw, a02 * sw, jx3 * sw, jx4 * sw, jx5 * sw])  # (6, T)
    jy = jnp.stack([a10 * sw, a11 * sw, a12 * sw, jy3 * sw, jy4 * sw, jy5 * sw])

    # One (6, 2T) x (2T, 6) contraction for H (Mosaic dislikes accumulating
    # into a dot_general result, so the x/y residual rows are concatenated
    # along the contraction axis instead of summed pairwise).
    jxy = jnp.concatenate([jx, jy], axis=1)                     # (6, 2T)
    dims = (((1,), (1,)), ((), ()))
    h_tile = jax.lax.dot_general(jxy, jxy, dims, preferred_element_type=jnp.float32)

    exy = jnp.concatenate([(ex * sw).reshape(1, -1), (ey * sw).reshape(1, -1)], axis=1)
    b_tile = jnp.sum(jxy * exy, axis=1)                          # (6,)

    inl = live * (1.0 - is_out.astype(jnp.float32))
    stats = jnp.stack(
        [
            jnp.sum(chi * inl),
            jnp.sum(chi * live * is_out.astype(jnp.float32)),
            jnp.sum(inl),
        ]
    )

    acc[0:6, 0:6] += h_tile
    acc[6, 0:6] += b_tile
    acc[7, 0:3] += stats

    @pl.when(i == n_tiles - 1)
    def _():
        out_ref[:, :] = acc[:, :]


@functools.partial(jax.jit, static_argnames=("keep_outliers", "tile", "interpret"))
def linearize_pallas(
    camera_matrix: Array,     # (3, 3)
    world_in_camera: Array,   # (4, 4)
    cam_params: Array,        # (4,) z_near, z_far, cols, rows
    world_points: Array,      # (N, 3)
    measured_points: Array,   # (N, 2)
    weights: Array,           # (N,)
    kernel_threshold: Array,  # ()
    keep_outliers: bool = False,
    tile: int = 512,
    interpret: bool = False,
) -> Tuple[Array, Array, PICPStats]:
    """Drop-in replacement for ``ops.picp.linearize`` (H, b, stats)."""
    n = world_points.shape[0]
    n_pad = -(-n // tile) * tile
    wp = jnp.pad(world_points, ((0, n_pad - n), (0, 0))).T          # (3, Np)
    mp = jnp.pad(measured_points, ((0, n_pad - n), (0, 0))).T       # (2, Np)
    w = jnp.pad(weights, (0, n_pad - n)).reshape(1, n_pad)          # (1, Np)

    scal = jnp.concatenate(
        [
            cam_params.astype(jnp.float32),
            jnp.asarray(kernel_threshold, jnp.float32).reshape(1),
            jnp.asarray(1.0 if keep_outliers else 0.0, jnp.float32).reshape(1),
        ]
    )
    pose34 = world_in_camera[:3, :4]

    out = pl.pallas_call(
        _kernel,
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        interpret=interpret,
    )(scal, pose34, camera_matrix, wp, mp, w)

    h = out[0:6, 0:6]
    b = out[6, 0:6]
    stats = PICPStats(
        chi_inliers=out[7, 0],
        chi_outliers=out[7, 1],
        num_inliers=out[7, 2].astype(jnp.int32),
    )
    return h, b, stats


# ---------------------------------------------------------------------------
# Whole-solve kernel: the ENTIRE Gauss-Newton loop in one Pallas program.
#
# The op-level profile of the tracking pipeline shows it is dispatch-bound:
# each GN round in the XLA path issues ~45 small kernels (projection,
# Jacobian assembly, contraction, LU custom-calls, Euler update), and at
# ~600 rounds per sequence the fixed per-op sequencing overhead dominates
# wall time (device busy 13.8 ms of a 46 ms program). Here the whole
# iteration loop runs inside ONE kernel: per-point work on (N,) lane
# vectors, the 6x6 normal system as 30 lane reductions, the solve as a
# scalar-form 3x3-block Schur inverse (adjugate 3x3 inverses — no custom
# calls), and the Euler-chart update (utils.h:73-78) from scalar trig.
# The iteration loop is a real while_loop: once ||dx||^2 <= tolerance the
# remaining budget is skipped entirely (same result as ``ops.picp.solve``'s
# host while_loop, but the exit saves ~5x device time on converged frames).
# ---------------------------------------------------------------------------


def _inv3(m):
    """Scalar-form 3x3 inverse via adjugate. m is a 9-tuple, row-major."""
    a, b, c, d, e, f, g, h, i = m
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    inv_det = 1.0 / det
    return tuple(x * inv_det for x in (A, B, C, D, E, F, G, H, I))


def _mat3mul(m, n):
    """Row-major 9-tuple 3x3 product m @ n."""
    return (
        m[0] * n[0] + m[1] * n[3] + m[2] * n[6],
        m[0] * n[1] + m[1] * n[4] + m[2] * n[7],
        m[0] * n[2] + m[1] * n[5] + m[2] * n[8],
        m[3] * n[0] + m[4] * n[3] + m[5] * n[6],
        m[3] * n[1] + m[4] * n[4] + m[5] * n[7],
        m[3] * n[2] + m[4] * n[5] + m[5] * n[8],
        m[6] * n[0] + m[7] * n[3] + m[8] * n[6],
        m[6] * n[1] + m[7] * n[4] + m[8] * n[7],
        m[6] * n[2] + m[7] * n[5] + m[8] * n[8],
    )


def _mat3vec(m, v):
    return (
        m[0] * v[0] + m[1] * v[1] + m[2] * v[2],
        m[3] * v[0] + m[4] * v[1] + m[5] * v[2],
        m[6] * v[0] + m[7] * v[1] + m[8] * v[2],
    )


def _transpose3(m):
    return (m[0], m[3], m[6], m[1], m[4], m[7], m[2], m[5], m[8])


def gn_loop(
    num_iterations, k, pose0, wx, wy, wz, mx, my, wgt_in,
    z_near, z_far, cols, rows, kt, keep_out, damping, tol, min_inl=0.0,
    min_iterations=1,
):
    """The whole Gauss-Newton iteration as in-kernel lane/scalar code.

    ``k``/``pose0`` are row-major scalar tuples (9 / 12 entries); the point
    data are (N,)-lane vectors. Returns the final while_loop carry:
    12 pose scalars, the active flag, chi_in, chi_out, n_in. Shared by the
    standalone PICP solve kernel and the fused frame-step kernel.

    ``min_inl`` is the inlier floor of picp_solver.cpp:103-107: a round
    whose inlier count falls below it applies no pose update and ends the
    loop (the reference keeps re-running the identical skipped round, which
    cannot change the state — exiting yields the same final pose/stats).

    ``min_iterations`` keeps the tolerance exit from firing before that
    many rounds have run: a warm-started solve takes a SMALL first step
    near its prior even when not yet converged, so exit decisions need a
    couple of rounds of evidence (same contract as ``ops.picp.solve``).
    """

    def cond(carry):
        # True early exit: the whole remaining iteration budget is skipped
        # once ||dx||^2 <= tolerance (vs predicating the updates and still
        # paying every round's compute — ~5x wall time on converged frames).
        it, *_rest, active, _ci, _co, _ni = carry
        return (it < num_iterations) & ((active > 0.5) | (it < min_iterations))

    def body(carry):
        (it, r00, r01, r02, t0, r10, r11, r12, t1, r20, r21, r22, t2,
         active, chi_in, chi_out, n_in) = carry

        # --- linearize (picp_solver.cpp:25-96), all on lane vectors ---
        px = r00 * wx + r01 * wy + r02 * wz + t0
        py = r10 * wx + r11 * wy + r12 * wz + t1
        pz = r20 * wx + r21 * wy + r22 * wz + t2
        hx = k[0] * px + k[1] * py + k[2] * pz
        hy = k[3] * px + k[4] * py + k[5] * pz
        hz = k[6] * px + k[7] * py + k[8] * pz
        iz = 1.0 / jnp.where(hz == 0.0, 1.0, hz)
        u = hx * iz
        v = hy * iz
        # hz > 1e-6: minimum-depth guard (see ops/picp.linearize) — at
        # z_near == 0 a point at the pinhole passes the frustum test but
        # its 1/z^2 Jacobian terms overflow f32 and NaN-poison H.
        valid = (
            (pz <= z_far) & (pz >= z_near) & (hz > 1e-6)
            & (u >= 0.0) & (u <= cols - 1.0)
            & (v >= 0.0) & (v <= rows - 1.0)
        )
        ex = u - mx
        ey = v - my
        chi = ex * ex + ey * ey
        is_out = chi > kt
        lam = jnp.where(is_out, jnp.sqrt(kt / jnp.maximum(chi, 1e-30)), 1.0)
        live = wgt_in * valid.astype(jnp.float32)
        w = live * jnp.where(is_out, keep_out, 1.0) * lam

        iz2 = iz * iz
        a00 = k[0] * iz - k[6] * hx * iz2
        a01 = k[1] * iz - k[7] * hx * iz2
        a02 = k[2] * iz - k[8] * hx * iz2
        a10 = k[3] * iz - k[6] * hy * iz2
        a11 = k[4] * iz - k[7] * hy * iz2
        a12 = k[5] * iz - k[8] * hy * iz2
        jx = (
            a00, a01, a02,
            a01 * (-pz) + a02 * py, a00 * pz + a02 * (-px), a00 * (-py) + a01 * px,
        )
        jy = (
            a10, a11, a12,
            a11 * (-pz) + a12 * py, a10 * pz + a12 * (-px), a10 * (-py) + a11 * px,
        )

        # H (21 unique entries), b (6) and the 3 stats as ONE stacked
        # (30, N) lane reduction instead of 30 separate ones: the separate
        # form re-runs the cross-lane reduction tree per scalar, which
        # dominates the iteration at large N (measured on v5e: 100 rounds
        # at N=1024 drop 3.8 ms -> 1.4 ms; N=128 is latency-bound either
        # way and unchanged).
        inl = live * (1.0 - is_out.astype(jnp.float32))
        rows_l = []
        for i in range(6):
            for j in range(i, 6):
                rows_l.append(w * (jx[i] * jx[j] + jy[i] * jy[j]))
        for i in range(6):
            rows_l.append(w * (jx[i] * ex + jy[i] * ey))
        rows_l.append(chi * inl)
        rows_l.append(chi * live * is_out.astype(jnp.float32))
        rows_l.append(inl)
        sums = jnp.sum(jnp.stack(rows_l), axis=1)   # (30,)
        hm = {}
        idx = 0
        for i in range(6):
            for j in range(i, 6):
                hm[(i, j)] = sums[idx]
                idx += 1
        bv = tuple(sums[21 + i] for i in range(6))
        new_chi_in = sums[27]
        new_chi_out = sums[28]
        new_n_in = sums[29]

        # --- damped 6x6 solve via 3x3-block Schur complement ---
        # Jacobi pre-scaling first: solve (S M S) y = -S b with
        # S = diag(M)^(-1/2), dx = S y — algebraically identical, but the
        # scaled system has UNIT diagonal so every 3x3 adjugate cofactor is
        # O(1). Without it, near-pinhole points (depth ~ 1e-5 after a
        # collapsed-scale bootstrap) push H entries to ~1e20, the cofactor
        # PRODUCTS past f32 max, and det = inf - inf = NaN (observed on
        # v5e; the XLA backend's pivoted LU is immune).
        md = tuple(hm[(i, i)] + damping for i in range(6))
        sc = tuple(jax.lax.rsqrt(jnp.maximum(m, 1e-30)) for m in md)

        def se(i, j):
            return hm[(min(i, j), max(i, j))] * sc[i] * sc[j]

        one = jnp.ones_like(md[0])
        A = (one, se(0, 1), se(0, 2),
             se(0, 1), one, se(1, 2),
             se(0, 2), se(1, 2), one)
        B = (se(0, 3), se(0, 4), se(0, 5),
             se(1, 3), se(1, 4), se(1, 5),
             se(2, 3), se(2, 4), se(2, 5))
        D = (one, se(3, 4), se(3, 5),
             se(3, 4), one, se(4, 5),
             se(3, 5), se(4, 5), one)
        r1 = (-bv[0] * sc[0], -bv[1] * sc[1], -bv[2] * sc[2])
        r2 = (-bv[3] * sc[3], -bv[4] * sc[4], -bv[5] * sc[5])
        Ai = _inv3(A)
        Bt = _transpose3(B)
        S = tuple(d - s for d, s in zip(D, _mat3mul(Bt, _mat3mul(Ai, B))))
        Si = _inv3(S)
        t_r2 = tuple(x - y for x, y in zip(r2, _mat3vec(Bt, _mat3vec(Ai, r1))))
        x2 = _mat3vec(Si, t_r2)
        t_r1 = tuple(x - y for x, y in zip(r1, _mat3vec(B, x2)))
        x1 = _mat3vec(Ai, t_r1)
        y = x1 + x2
        dx = tuple(y[i] * sc[i] for i in range(6))
        enough = new_n_in >= min_inl
        dx = tuple(jnp.where(enough, d, 0.0) for d in dx)
        dx2 = sum(d * d for d in dx)

        # --- Euler-chart update X <- v2tEuler(dx) X (utils.h:73-78) ---
        sa, ca = jnp.sin(dx[3]), jnp.cos(dx[3])
        sb, cb = jnp.sin(dx[4]), jnp.cos(dx[4])
        sc, cc = jnp.sin(dx[5]), jnp.cos(dx[5])
        rd = (
            cb * cc, -cb * sc, sb,
            ca * sc + sa * sb * cc, ca * cc - sa * sb * sc, -sa * cb,
            sa * sc - ca * sb * cc, sa * cc + ca * sb * sc, ca * cb,
        )
        r_old = (r00, r01, r02, r10, r11, r12, r20, r21, r22)
        r_new = _mat3mul(rd, r_old)
        t_new = tuple(a + b for a, b in zip(_mat3vec(rd, (t0, t1, t2)),
                                            (dx[0], dx[1], dx[2])))

        out = (
            it + 1,
            r_new[0], r_new[1], r_new[2], t_new[0],
            r_new[3], r_new[4], r_new[5], t_new[1],
            r_new[6], r_new[7], r_new[8], t_new[2],
            (enough & (dx2 > tol)).astype(jnp.float32),
            new_chi_in, new_chi_out, new_n_in,
        )
        return out

    init = (
        (jnp.int32(0),)
        + pose0
        + (jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0))
    )
    return jax.lax.while_loop(cond, body, init)[1:]


def gn_loop_batched(
    num_iterations, k, pose0, wx, wy, wz, mx, my, wgt_in,
    z_near, z_far, cols, rows, kt, keep_out, damping, tol, min_inl=0.0,
    min_iterations=1,
):
    """B independent Gauss-Newton solves, lock-stepped on (B, S) tiles.

    The sublane-batched twin of :func:`gn_loop` for the serving path
    (parallel/multiseq): point rows are (B, S) — B sequences on the
    sublane axis, S correspondence lanes — and the pose carry is a tuple
    of 12 (B, 1) columns, so every elementwise op fills B sublanes where
    the single-sequence loop fills one. Per sequence the arithmetic is
    IDENTICAL to :func:`gn_loop` (same per-round op order, reductions
    over the lane axis only), so compiled results match bitwise (the CPU
    interpreter may re-associate the (30, B, S) reduction at ~1 ulp);
    the loop runs
    until every sequence's exit condition fires, with converged sequences
    frozen: their update is zeroed (the Euler chart of 0 is the identity)
    and their stats/active flags held, which reproduces each sequence's
    serial early-exit state exactly.

    ``k`` and the solver knobs are shared scalars (one camera per serving
    group); ``min_inl`` may be a scalar or (B, 1). Returns the final
    carry minus the counter: 12 (B, 1) pose entries, active, chi_in,
    chi_out, n_in (all (B, 1)).
    """

    def cond(carry):
        it, *_rest, active, _ci, _co, _ni = carry
        return (it < num_iterations) & (
            jnp.any(active > 0.5) | (it < min_iterations)
        )

    def body(carry):
        (it, r00, r01, r02, t0, r10, r11, r12, t1, r20, r21, r22, t2,
         active, chi_in, chi_out, n_in) = carry
        # Per-sequence "this round counts" mask: the serial loop's cond —
        # a sequence still iterates while active OR inside the
        # min_iterations window; afterwards it is frozen (see docstring).
        run = (active > 0.5) | (it < min_iterations)

        px = r00 * wx + r01 * wy + r02 * wz + t0
        py = r10 * wx + r11 * wy + r12 * wz + t1
        pz = r20 * wx + r21 * wy + r22 * wz + t2
        hx = k[0] * px + k[1] * py + k[2] * pz
        hy = k[3] * px + k[4] * py + k[5] * pz
        hz = k[6] * px + k[7] * py + k[8] * pz
        iz = 1.0 / jnp.where(hz == 0.0, 1.0, hz)
        u = hx * iz
        v = hy * iz
        valid = (
            (pz <= z_far) & (pz >= z_near) & (hz > 1e-6)
            & (u >= 0.0) & (u <= cols - 1.0)
            & (v >= 0.0) & (v <= rows - 1.0)
        )
        ex = u - mx
        ey = v - my
        chi = ex * ex + ey * ey
        is_out = chi > kt
        lam = jnp.where(is_out, jnp.sqrt(kt / jnp.maximum(chi, 1e-30)), 1.0)
        live = wgt_in * valid.astype(jnp.float32)
        w = live * jnp.where(is_out, keep_out, 1.0) * lam

        iz2 = iz * iz
        a00 = k[0] * iz - k[6] * hx * iz2
        a01 = k[1] * iz - k[7] * hx * iz2
        a02 = k[2] * iz - k[8] * hx * iz2
        a10 = k[3] * iz - k[6] * hy * iz2
        a11 = k[4] * iz - k[7] * hy * iz2
        a12 = k[5] * iz - k[8] * hy * iz2
        jx = (
            a00, a01, a02,
            a01 * (-pz) + a02 * py, a00 * pz + a02 * (-px), a00 * (-py) + a01 * px,
        )
        jy = (
            a10, a11, a12,
            a11 * (-pz) + a12 * py, a10 * pz + a12 * (-px), a10 * (-py) + a11 * px,
        )

        # One stacked (30, B, S) -> (30, B) lane reduction per round (same
        # row order as gn_loop; per sequence the reduction tree over S is
        # identical, so the sums match the serial loop bitwise).
        inl = live * (1.0 - is_out.astype(jnp.float32))
        rows_l = []
        for i in range(6):
            for j in range(i, 6):
                rows_l.append(w * (jx[i] * jx[j] + jy[i] * jy[j]))
        for i in range(6):
            rows_l.append(w * (jx[i] * ex + jy[i] * ey))
        rows_l.append(chi * inl)
        rows_l.append(chi * live * is_out.astype(jnp.float32))
        rows_l.append(inl)
        sums = jnp.sum(jnp.stack(rows_l), axis=-1)[:, :, None]  # (30, B, 1)
        hm = {}
        idx = 0
        for i in range(6):
            for j in range(i, 6):
                hm[(i, j)] = sums[idx]
                idx += 1
        bv = tuple(sums[21 + i] for i in range(6))
        new_chi_in = sums[27]
        new_chi_out = sums[28]
        new_n_in = sums[29]

        # Damped, Jacobi-scaled 3x3-block Schur solve — gn_loop's exact
        # scalar-form code, now on (B, 1) columns (B solves per vector op).
        md = tuple(hm[(i, i)] + damping for i in range(6))
        sc = tuple(jax.lax.rsqrt(jnp.maximum(m, 1e-30)) for m in md)

        def se(i, j):
            return hm[(min(i, j), max(i, j))] * sc[i] * sc[j]

        one = jnp.ones_like(md[0])
        A = (one, se(0, 1), se(0, 2),
             se(0, 1), one, se(1, 2),
             se(0, 2), se(1, 2), one)
        B = (se(0, 3), se(0, 4), se(0, 5),
             se(1, 3), se(1, 4), se(1, 5),
             se(2, 3), se(2, 4), se(2, 5))
        D = (one, se(3, 4), se(3, 5),
             se(3, 4), one, se(4, 5),
             se(3, 5), se(4, 5), one)
        r1 = (-bv[0] * sc[0], -bv[1] * sc[1], -bv[2] * sc[2])
        r2 = (-bv[3] * sc[3], -bv[4] * sc[4], -bv[5] * sc[5])
        Ai = _inv3(A)
        Bt = _transpose3(B)
        S = tuple(d - s for d, s in zip(D, _mat3mul(Bt, _mat3mul(Ai, B))))
        Si = _inv3(S)
        t_r2 = tuple(x - y for x, y in zip(r2, _mat3vec(Bt, _mat3vec(Ai, r1))))
        x2 = _mat3vec(Si, t_r2)
        t_r1 = tuple(x - y for x, y in zip(r1, _mat3vec(B, x2)))
        x1 = _mat3vec(Ai, t_r1)
        y = x1 + x2
        dx = tuple(y[i] * sc[i] for i in range(6))
        enough = new_n_in >= min_inl
        # Freeze finished sequences: a zero update leaves their pose
        # exactly where their serial loop exited.
        dx = tuple(jnp.where(run & enough, d, 0.0) for d in dx)
        dx2 = sum(d * d for d in dx)

        sa, ca = jnp.sin(dx[3]), jnp.cos(dx[3])
        sb, cb = jnp.sin(dx[4]), jnp.cos(dx[4])
        sc_, cc = jnp.sin(dx[5]), jnp.cos(dx[5])
        rd = (
            cb * cc, -cb * sc_, sb,
            ca * sc_ + sa * sb * cc, ca * cc - sa * sb * sc_, -sa * cb,
            sa * sc_ - ca * sb * cc, sa * cc + ca * sb * sc_, ca * cb,
        )
        r_old = (r00, r01, r02, r10, r11, r12, r20, r21, r22)
        r_new = _mat3mul(rd, r_old)
        t_new = tuple(a + b for a, b in zip(_mat3vec(rd, (t0, t1, t2)),
                                            (dx[0], dx[1], dx[2])))

        keep = run

        def held(new, old):
            return jnp.where(keep, new, old)

        out = (
            it + 1,
            held(r_new[0], r00), held(r_new[1], r01), held(r_new[2], r02),
            held(t_new[0], t0),
            held(r_new[3], r10), held(r_new[4], r11), held(r_new[5], r12),
            held(t_new[1], t1),
            held(r_new[6], r20), held(r_new[7], r21), held(r_new[8], r22),
            held(t_new[2], t2),
            held((enough & (dx2 > tol)).astype(jnp.float32), active),
            held(new_chi_in, chi_in),
            held(new_chi_out, chi_out),
            held(new_n_in, n_in),
        )
        return out

    b = wx.shape[0]
    ones = jnp.ones((b, 1), jnp.float32)
    init = (
        (jnp.int32(0),)
        + pose0
        + (ones, 0.0 * ones, 0.0 * ones, 0.0 * ones)
    )
    return jax.lax.while_loop(cond, body, init)[1:]


def gn_loop_se2(
    num_iterations, k, c, c_inv, pose0, wx, wy, wz, mx, my, wgt_in,
    z_near, z_far, cols, rows, kt, keep_out, damping, tol, min_inl=0.0,
    min_iterations=1,
):
    """The planar (conjugated-SE(2)) Gauss-Newton loop as in-kernel code.

    The 3-DoF twin of :func:`gn_loop`, replicating
    ``ops.picp_se2.solve_se2`` (the est_SE2 estimation branch,
    /root/reference/README.md:13): increments d = (dx, dy, dtheta) act on
    the world-in-camera pose conjugated through the camera mount,
    ``X <- c^-1 T(d) c X``, so the relative ROBOT motion stays exactly in
    SE(2). ``c``/``c_inv`` are the mount [R|t] and its inverse as
    row-major 12-scalar tuples; everything else matches :func:`gn_loop`
    (same frustum/robust-kernel semantics, same early-exit contract).

    Jacobian (picp_se2.linearize_se2): with q = c X p the point in robot
    coords, d(p_cam)/dd = c_R^T [e_x | e_y | skew(e_z) q], whose camera-
    coord columns are row0(c_R), row1(c_R) and qx*row1 - qy*row0 — three
    lane-vector dot products against the shared A = Jp K rows.
    """
    cr0 = (c[0], c[1], c[2])   # row 0 of the mount rotation
    cr1 = (c[4], c[5], c[6])   # row 1

    def cond(carry):
        it, *_rest, active, _ci, _co, _ni = carry
        return (it < num_iterations) & ((active > 0.5) | (it < min_iterations))

    def body(carry):
        (it, r00, r01, r02, t0, r10, r11, r12, t1, r20, r21, r22, t2,
         active, chi_in, chi_out, n_in) = carry

        # --- linearize (shared projection/robust math with gn_loop) ---
        px = r00 * wx + r01 * wy + r02 * wz + t0
        py = r10 * wx + r11 * wy + r12 * wz + t1
        pz = r20 * wx + r21 * wy + r22 * wz + t2
        hx = k[0] * px + k[1] * py + k[2] * pz
        hy = k[3] * px + k[4] * py + k[5] * pz
        hz = k[6] * px + k[7] * py + k[8] * pz
        iz = 1.0 / jnp.where(hz == 0.0, 1.0, hz)
        u = hx * iz
        v = hy * iz
        valid = (
            (pz <= z_far) & (pz >= z_near) & (hz > 1e-6)
            & (u >= 0.0) & (u <= cols - 1.0)
            & (v >= 0.0) & (v <= rows - 1.0)
        )
        ex = u - mx
        ey = v - my
        chi = ex * ex + ey * ey
        is_out = chi > kt
        lam = jnp.where(is_out, jnp.sqrt(kt / jnp.maximum(chi, 1e-30)), 1.0)
        live = wgt_in * valid.astype(jnp.float32)
        w = live * jnp.where(is_out, keep_out, 1.0) * lam

        iz2 = iz * iz
        a00 = k[0] * iz - k[6] * hx * iz2
        a01 = k[1] * iz - k[7] * hx * iz2
        a02 = k[2] * iz - k[8] * hx * iz2
        a10 = k[3] * iz - k[6] * hy * iz2
        a11 = k[4] * iz - k[7] * hy * iz2
        a12 = k[5] * iz - k[8] * hy * iz2

        # q = c p_cam in robot coords (x, y only — z never enters).
        qx = c[0] * px + c[1] * py + c[2] * pz + c[3]
        qy = c[4] * px + c[5] * py + c[6] * pz + c[7]
        # Planar Jacobian columns in camera coords.
        ctx = tuple(qx * b - qy * a for a, b in zip(cr0, cr1))
        jx = (
            a00 * cr0[0] + a01 * cr0[1] + a02 * cr0[2],
            a00 * cr1[0] + a01 * cr1[1] + a02 * cr1[2],
            a00 * ctx[0] + a01 * ctx[1] + a02 * ctx[2],
        )
        jy = (
            a10 * cr0[0] + a11 * cr0[1] + a12 * cr0[2],
            a10 * cr1[0] + a11 * cr1[1] + a12 * cr1[2],
            a10 * ctx[0] + a11 * ctx[1] + a12 * ctx[2],
        )

        # H (6 unique), b (3), stats (3): one stacked (12, N) reduction.
        inl = live * (1.0 - is_out.astype(jnp.float32))
        rows_l = []
        for i in range(3):
            for j in range(i, 3):
                rows_l.append(w * (jx[i] * jx[j] + jy[i] * jy[j]))
        for i in range(3):
            rows_l.append(w * (jx[i] * ex + jy[i] * ey))
        rows_l.append(chi * inl)
        rows_l.append(chi * live * is_out.astype(jnp.float32))
        rows_l.append(inl)
        sums = jnp.sum(jnp.stack(rows_l), axis=1)   # (12,)
        hm = {}
        idx = 0
        for i in range(3):
            for j in range(i, 3):
                hm[(i, j)] = sums[idx]
                idx += 1
        bv = tuple(sums[6 + i] for i in range(3))
        new_chi_in = sums[9]
        new_chi_out = sums[10]
        new_n_in = sums[11]

        # --- damped, Jacobi-scaled 3x3 solve (see gn_loop's rationale) ---
        md = tuple(hm[(i, i)] + damping for i in range(3))
        sc = tuple(jax.lax.rsqrt(jnp.maximum(m, 1e-30)) for m in md)

        def se(i, j):
            return hm[(min(i, j), max(i, j))] * sc[i] * sc[j]

        one = jnp.ones_like(md[0])
        A = (one, se(0, 1), se(0, 2),
             se(0, 1), one, se(1, 2),
             se(0, 2), se(1, 2), one)
        Ai = _inv3(A)
        r1 = (-bv[0] * sc[0], -bv[1] * sc[1], -bv[2] * sc[2])
        y = _mat3vec(Ai, r1)
        dx = tuple(y[i] * sc[i] for i in range(3))
        enough = new_n_in >= min_inl
        dx = tuple(jnp.where(enough, d, 0.0) for d in dx)
        dx2 = sum(d * d for d in dx)

        # --- conjugated update X <- c^-1 T(d) c X (picp_se2.one_round) ---
        sth, cth = jnp.sin(dx[2]), jnp.cos(dx[2])
        tr = (cth, -sth, 0.0 * cth, sth, cth, 0.0 * cth,
              0.0 * cth, 0.0 * cth, 1.0 + 0.0 * cth)
        c_r = (c[0], c[1], c[2], c[4], c[5], c[6], c[8], c[9], c[10])
        ci_r = (c_inv[0], c_inv[1], c_inv[2], c_inv[4], c_inv[5], c_inv[6],
                c_inv[8], c_inv[9], c_inv[10])
        c_t = (c[3], c[7], c[11])
        ci_t = (c_inv[3], c_inv[7], c_inv[11])
        incr_r = _mat3mul(ci_r, _mat3mul(tr, c_r))
        trc = _mat3vec(tr, c_t)
        trc = (trc[0] + dx[0], trc[1] + dx[1], trc[2])
        incr_t = tuple(a + b for a, b in zip(_mat3vec(ci_r, trc), ci_t))

        r_old = (r00, r01, r02, r10, r11, r12, r20, r21, r22)
        r_new = _mat3mul(incr_r, r_old)
        t_new = tuple(
            a + b for a, b in zip(_mat3vec(incr_r, (t0, t1, t2)), incr_t)
        )

        out = (
            it + 1,
            r_new[0], r_new[1], r_new[2], t_new[0],
            r_new[3], r_new[4], r_new[5], t_new[1],
            r_new[6], r_new[7], r_new[8], t_new[2],
            (enough & (dx2 > tol)).astype(jnp.float32),
            new_chi_in, new_chi_out, new_n_in,
        )
        return out

    init = (
        (jnp.int32(0),)
        + pose0
        + (jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0))
    )
    return jax.lax.while_loop(cond, body, init)[1:]


def gn_loop_se2_batched(
    num_iterations, k, c, c_inv, pose0, wx, wy, wz, mx, my, wgt_in,
    z_near, z_far, cols, rows, kt, keep_out, damping, tol, min_inl=0.0,
    min_iterations=1,
):
    """B lock-stepped conjugated-SE(2) solves on (B, S) tiles.

    The sublane-batched twin of :func:`gn_loop_se2`, with the same
    batching rules as :func:`gn_loop_batched` (pose carry as 12 (B, 1)
    columns, per-sequence freeze masking, lane-axis-only reductions —
    compiled results match the serial loop bitwise per sequence). The
    mount ``c``/``c_inv`` and camera are shared scalars: one serving
    group = one rig."""
    cr0 = (c[0], c[1], c[2])
    cr1 = (c[4], c[5], c[6])

    def cond(carry):
        it, *_rest, active, _ci, _co, _ni = carry
        return (it < num_iterations) & (
            jnp.any(active > 0.5) | (it < min_iterations)
        )

    def body(carry):
        (it, r00, r01, r02, t0, r10, r11, r12, t1, r20, r21, r22, t2,
         active, chi_in, chi_out, n_in) = carry
        run = (active > 0.5) | (it < min_iterations)

        px = r00 * wx + r01 * wy + r02 * wz + t0
        py = r10 * wx + r11 * wy + r12 * wz + t1
        pz = r20 * wx + r21 * wy + r22 * wz + t2
        hx = k[0] * px + k[1] * py + k[2] * pz
        hy = k[3] * px + k[4] * py + k[5] * pz
        hz = k[6] * px + k[7] * py + k[8] * pz
        iz = 1.0 / jnp.where(hz == 0.0, 1.0, hz)
        u = hx * iz
        v = hy * iz
        valid = (
            (pz <= z_far) & (pz >= z_near) & (hz > 1e-6)
            & (u >= 0.0) & (u <= cols - 1.0)
            & (v >= 0.0) & (v <= rows - 1.0)
        )
        ex = u - mx
        ey = v - my
        chi = ex * ex + ey * ey
        is_out = chi > kt
        lam = jnp.where(is_out, jnp.sqrt(kt / jnp.maximum(chi, 1e-30)), 1.0)
        live = wgt_in * valid.astype(jnp.float32)
        w = live * jnp.where(is_out, keep_out, 1.0) * lam

        iz2 = iz * iz
        a00 = k[0] * iz - k[6] * hx * iz2
        a01 = k[1] * iz - k[7] * hx * iz2
        a02 = k[2] * iz - k[8] * hx * iz2
        a10 = k[3] * iz - k[6] * hy * iz2
        a11 = k[4] * iz - k[7] * hy * iz2
        a12 = k[5] * iz - k[8] * hy * iz2

        qx = c[0] * px + c[1] * py + c[2] * pz + c[3]
        qy = c[4] * px + c[5] * py + c[6] * pz + c[7]
        ctx = tuple(qx * b - qy * a for a, b in zip(cr0, cr1))
        jx = (
            a00 * cr0[0] + a01 * cr0[1] + a02 * cr0[2],
            a00 * cr1[0] + a01 * cr1[1] + a02 * cr1[2],
            a00 * ctx[0] + a01 * ctx[1] + a02 * ctx[2],
        )
        jy = (
            a10 * cr0[0] + a11 * cr0[1] + a12 * cr0[2],
            a10 * cr1[0] + a11 * cr1[1] + a12 * cr1[2],
            a10 * ctx[0] + a11 * ctx[1] + a12 * ctx[2],
        )

        inl = live * (1.0 - is_out.astype(jnp.float32))
        rows_l = []
        for i in range(3):
            for j in range(i, 3):
                rows_l.append(w * (jx[i] * jx[j] + jy[i] * jy[j]))
        for i in range(3):
            rows_l.append(w * (jx[i] * ex + jy[i] * ey))
        rows_l.append(chi * inl)
        rows_l.append(chi * live * is_out.astype(jnp.float32))
        rows_l.append(inl)
        sums = jnp.sum(jnp.stack(rows_l), axis=-1)[:, :, None]  # (12, B, 1)
        hm = {}
        idx = 0
        for i in range(3):
            for j in range(i, 3):
                hm[(i, j)] = sums[idx]
                idx += 1
        bv = tuple(sums[6 + i] for i in range(3))
        new_chi_in = sums[9]
        new_chi_out = sums[10]
        new_n_in = sums[11]

        md = tuple(hm[(i, i)] + damping for i in range(3))
        sc = tuple(jax.lax.rsqrt(jnp.maximum(m, 1e-30)) for m in md)

        def se(i, j):
            return hm[(min(i, j), max(i, j))] * sc[i] * sc[j]

        one = jnp.ones_like(md[0])
        A = (one, se(0, 1), se(0, 2),
             se(0, 1), one, se(1, 2),
             se(0, 2), se(1, 2), one)
        Ai = _inv3(A)
        r1 = (-bv[0] * sc[0], -bv[1] * sc[1], -bv[2] * sc[2])
        y = _mat3vec(Ai, r1)
        dx = tuple(y[i] * sc[i] for i in range(3))
        enough = new_n_in >= min_inl
        dx = tuple(jnp.where(run & enough, d, 0.0) for d in dx)
        dx2 = sum(d * d for d in dx)

        sth, cth = jnp.sin(dx[2]), jnp.cos(dx[2])
        tr = (cth, -sth, 0.0 * cth, sth, cth, 0.0 * cth,
              0.0 * cth, 0.0 * cth, 1.0 + 0.0 * cth)
        c_r = (c[0], c[1], c[2], c[4], c[5], c[6], c[8], c[9], c[10])
        ci_r = (c_inv[0], c_inv[1], c_inv[2], c_inv[4], c_inv[5], c_inv[6],
                c_inv[8], c_inv[9], c_inv[10])
        c_t = (c[3], c[7], c[11])
        ci_t = (c_inv[3], c_inv[7], c_inv[11])
        incr_r = _mat3mul(ci_r, _mat3mul(tr, c_r))
        trc = _mat3vec(tr, c_t)
        trc = (trc[0] + dx[0], trc[1] + dx[1], trc[2])
        incr_t = tuple(a + b for a, b in zip(_mat3vec(ci_r, trc), ci_t))

        r_old = (r00, r01, r02, r10, r11, r12, r20, r21, r22)
        r_new = _mat3mul(incr_r, r_old)
        t_new = tuple(
            a + b for a, b in zip(_mat3vec(incr_r, (t0, t1, t2)), incr_t)
        )

        keep = run

        def held(new, old):
            return jnp.where(keep, new, old)

        out = (
            it + 1,
            held(r_new[0], r00), held(r_new[1], r01), held(r_new[2], r02),
            held(t_new[0], t0),
            held(r_new[3], r10), held(r_new[4], r11), held(r_new[5], r12),
            held(t_new[1], t1),
            held(r_new[6], r20), held(r_new[7], r21), held(r_new[8], r22),
            held(t_new[2], t2),
            held((enough & (dx2 > tol)).astype(jnp.float32), active),
            held(new_chi_in, chi_in),
            held(new_chi_out, chi_out),
            held(new_n_in, n_in),
        )
        return out

    b = wx.shape[0]
    ones = jnp.ones((b, 1), jnp.float32)
    init = (
        (jnp.int32(0),)
        + pose0
        + (ones, 0.0 * ones, 0.0 * ones, 0.0 * ones)
    )
    return jax.lax.while_loop(cond, body, init)[1:]


def _solve_kernel(num_iterations, min_iterations, scal_ref, world_ref, meas_ref, w_ref, out_ref):
    z_near, z_far, cols, rows = scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3]
    kt, keep_out, damping, tol = scal_ref[4], scal_ref[5], scal_ref[6], scal_ref[7]
    min_inl = scal_ref[8]
    k = tuple(scal_ref[9 + i] for i in range(9))           # K row-major
    pose0 = tuple(scal_ref[18 + i] for i in range(12))     # [R|t] row-major 3x4

    final = gn_loop(
        num_iterations, k, pose0,
        world_ref[0, :], world_ref[1, :], world_ref[2, :],
        meas_ref[0, :], meas_ref[1, :], w_ref[0, :],
        z_near, z_far, cols, rows, kt, keep_out, damping, tol, min_inl,
        min_iterations,
    )

    row0 = jnp.stack(final[0:4])
    row1 = jnp.stack(final[4:8])
    row2 = jnp.stack(final[8:12])
    row3 = jnp.stack(final[12:16])
    out_ref[0, :] = jnp.pad(row0, (0, 124))
    out_ref[1, :] = jnp.pad(row1, (0, 124))
    out_ref[2, :] = jnp.pad(row2, (0, 124))
    out_ref[3, :] = jnp.pad(row3, (0, 124))


@functools.partial(
    jax.jit,
    static_argnames=("num_iterations", "keep_outliers", "interpret", "min_iterations"),
)
def solve_fused(
    camera_matrix: Array,     # (3, 3)
    world_in_camera: Array,   # (4, 4) start pose
    cam_params: Array,        # (4,) z_near, z_far, cols, rows
    world_points: Array,      # (N, 3)
    measured_points: Array,   # (N, 2)
    weights: Array,           # (N,)
    num_iterations: int,
    kernel_threshold: Array,
    damping: Array,
    tolerance: Array,         # pass < 0 for the fixed-budget (no-exit) loop
    keep_outliers: bool = False,
    interpret: bool = False,
    min_num_inliers: Array = 0.0,
    min_iterations: int = 1,
) -> Tuple[Array, PICPStats]:
    """Whole PICP solve as one kernel. Returns (pose (4,4), stats).

    Drop-in for ``ops.picp.solve``'s loop (picp_solver.cpp:98-112 iterated);
    the single-kernel form eliminates the ~45-op-per-round dispatch overhead
    of the XLA path. N is padded to a lane multiple; the whole point set
    must fit one VMEM block (N <= ~8192 — far above the tracker's slot
    counts).
    """
    n = world_points.shape[0]
    n_pad = max(-(-n // 128) * 128, 128)
    wp = jnp.pad(world_points, ((0, n_pad - n), (0, 0))).T
    mp = jnp.pad(measured_points, ((0, n_pad - n), (0, 0))).T
    w = jnp.pad(weights, (0, n_pad - n)).reshape(1, n_pad)

    scal = jnp.concatenate(
        [
            cam_params.astype(jnp.float32),
            jnp.stack(
                [
                    jnp.asarray(kernel_threshold, jnp.float32),
                    jnp.asarray(1.0 if keep_outliers else 0.0, jnp.float32),
                    jnp.asarray(damping, jnp.float32),
                    jnp.asarray(tolerance, jnp.float32),
                    jnp.asarray(min_num_inliers, jnp.float32),
                ]
            ),
            camera_matrix.reshape(9).astype(jnp.float32),
            world_in_camera[:3, :4].reshape(12).astype(jnp.float32),
        ]
    )

    out = pl.pallas_call(
        functools.partial(_solve_kernel, num_iterations, min_iterations),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, n_pad), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, n_pad), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad), lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )(scal, wp, mp, w)

    pose = jnp.eye(4, dtype=jnp.float32)
    pose = pose.at[:3, :4].set(
        jnp.stack([out[0, 0:4], out[1, 0:4], out[2, 0:4]])
    )
    stats = PICPStats(
        chi_inliers=out[3, 1],
        chi_outliers=out[3, 2],
        num_inliers=out[3, 3].astype(jnp.int32),
    )
    return pose, stats


def _solve_se2_kernel(num_iterations, min_iterations, scal_ref, world_ref,
                      meas_ref, w_ref, out_ref):
    z_near, z_far, cols, rows = scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3]
    kt, keep_out, damping, tol = scal_ref[4], scal_ref[5], scal_ref[6], scal_ref[7]
    min_inl = scal_ref[8]
    k = tuple(scal_ref[9 + i] for i in range(9))            # K row-major
    pose0 = tuple(scal_ref[18 + i] for i in range(12))      # [R|t] 3x4
    c = tuple(scal_ref[30 + i] for i in range(12))          # mount [R|t]
    c_inv = tuple(scal_ref[42 + i] for i in range(12))

    final = gn_loop_se2(
        num_iterations, k, c, c_inv, pose0,
        world_ref[0, :], world_ref[1, :], world_ref[2, :],
        meas_ref[0, :], meas_ref[1, :], w_ref[0, :],
        z_near, z_far, cols, rows, kt, keep_out, damping, tol, min_inl,
        min_iterations,
    )

    out_ref[0, :] = jnp.pad(jnp.stack(final[0:4]), (0, 124))
    out_ref[1, :] = jnp.pad(jnp.stack(final[4:8]), (0, 124))
    out_ref[2, :] = jnp.pad(jnp.stack(final[8:12]), (0, 124))
    out_ref[3, :] = jnp.pad(jnp.stack(final[12:16]), (0, 124))


@functools.partial(
    jax.jit,
    static_argnames=("num_iterations", "keep_outliers", "interpret", "min_iterations"),
)
def solve_se2_fused(
    camera_matrix: Array,     # (3, 3)
    world_in_camera: Array,   # (4, 4) start pose (planarized by callers)
    cam_params: Array,        # (4,) z_near, z_far, cols, rows
    cam_in_robot: Array,      # (4, 4) mount pose (identity => camera IS body)
    world_points: Array,      # (N, 3)
    measured_points: Array,   # (N, 2)
    weights: Array,           # (N,)
    num_iterations: int,
    kernel_threshold: Array,
    damping: Array,
    tolerance: Array,         # pass < 0 for the fixed-budget (no-exit) loop
    keep_outliers: bool = False,
    interpret: bool = False,
    min_num_inliers: Array = 0.0,
    min_iterations: int = 1,
) -> Tuple[Array, PICPStats]:
    """Whole planar PICP solve as one kernel (ops.picp_se2.solve_se2's
    loop, est_SE2 branch). Same contract as :func:`solve_fused`."""
    from ...ops import se3

    n = world_points.shape[0]
    n_pad = max(-(-n // 128) * 128, 128)
    wp = jnp.pad(world_points, ((0, n_pad - n), (0, 0))).T
    mp = jnp.pad(measured_points, ((0, n_pad - n), (0, 0))).T
    w = jnp.pad(weights, (0, n_pad - n)).reshape(1, n_pad)
    c44 = jnp.asarray(cam_in_robot, jnp.float32)

    scal = jnp.concatenate(
        [
            cam_params.astype(jnp.float32),
            jnp.stack(
                [
                    jnp.asarray(kernel_threshold, jnp.float32),
                    jnp.asarray(1.0 if keep_outliers else 0.0, jnp.float32),
                    jnp.asarray(damping, jnp.float32),
                    jnp.asarray(tolerance, jnp.float32),
                    jnp.asarray(min_num_inliers, jnp.float32),
                ]
            ),
            camera_matrix.reshape(9).astype(jnp.float32),
            world_in_camera[:3, :4].reshape(12).astype(jnp.float32),
            c44[:3, :4].reshape(12),
            se3.inverse(c44)[:3, :4].reshape(12),
        ]
    )

    out = pl.pallas_call(
        functools.partial(_solve_se2_kernel, num_iterations, min_iterations),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, n_pad), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, n_pad), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad), lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )(scal, wp, mp, w)

    pose = jnp.eye(4, dtype=jnp.float32)
    pose = pose.at[:3, :4].set(
        jnp.stack([out[0, 0:4], out[1, 0:4], out[2, 0:4]])
    )
    stats = PICPStats(
        chi_inliers=out[3, 1],
        chi_outliers=out[3, 2],
        num_inliers=out[3, 3].astype(jnp.int32),
    )
    return pose, stats
