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
