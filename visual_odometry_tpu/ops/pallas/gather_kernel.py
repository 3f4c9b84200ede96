"""Batched lane gather as a Pallas kernel.

XLA lowers a general batched gather (``jnp.take_along_axis`` over the lane
axis, ``x[idx]`` row gathers) to a serialized scalar-core loop on TPU —
measured ~5.3 ms per 510x1024 int32 gather inside the tracking program's
prep stage, which made five such gathers the single largest cost of the
whole pipeline. This kernel runs the same gather on the vector unit via
Mosaic's single-vreg ``tpu.dynamic_gather`` tiled over 128-lane vregs
(out[r, j] = src[r, 128*hi + lo], one (R, 128) gather + tile-select per
(out-tile, src-tile) pair — the same primitive as the fused frame kernel's
world join): ~60 us for the same shape, 90x faster.

Semantics: ``gather_rows(src, idx)[f, r, j] = src[f, r, idx[f, r, j]]``
with per-row independent indices. Indices must be pre-sanitized to
[0, S). float32 payloads; int payloads round-trip exactly through f32 for
values < 2^24 (every index/slot value in this package).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .frame_kernel import _LANE, _lane_gather

Array = jnp.ndarray


def _kernel(block, src_ref, idx_ref, out_ref):
    def body(i, _):
        idx = idx_ref[i]
        hi = idx // _LANE
        lo = idx - hi * _LANE
        out_ref[i] = _lane_gather(src_ref[i], lo, hi)
        return 0

    jax.lax.fori_loop(0, block, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows(src: Array, idx: Array, interpret: bool = False) -> Array:
    """out[f, r, j] = src[f, r, idx[f, r, j]]; src (F, R, S) f32, idx i32.

    R <= 8 keeps each (out-tile, src-tile) pair one vreg-level gather;
    larger R still works (Mosaic splits the sublane axis).
    """
    f, r, s = src.shape
    assert idx.shape == (f, r, s), (src.shape, idx.shape)
    # ~2 MB of blocks per grid step.
    per_frame = 2 * r * s * 4
    fb = max(1, min(f, (2 * 1024 * 1024) // per_frame))
    nb = -(-f // fb)
    f_pad = nb * fb
    if f_pad != f:
        src = jnp.pad(src, ((0, f_pad - f), (0, 0), (0, 0)))
        idx = jnp.pad(idx, ((0, f_pad - f), (0, 0), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_kernel, fb),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((fb, r, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fb, r, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (fb, r, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((f_pad, r, s), jnp.float32),
        interpret=interpret,
    )(src.astype(jnp.float32), idx.astype(jnp.int32))
    return out[:f]


def take_lanes(rows, idx, interpret: bool = False):
    """Convenience: gather a list of (F, S) f32/int rows by a matching list
    of (F, S) index rows in ONE kernel call; returns the gathered rows with
    each input's dtype restored (ints round-trip exactly below 2^24)."""
    src = jnp.stack([r.astype(jnp.float32) for r in rows], axis=1)
    ix = jnp.stack(idx, axis=1)
    out = gather_rows(src, ix, interpret=interpret)
    return tuple(
        out[:, i].astype(r.dtype) if r.dtype != jnp.float32 else out[:, i]
        for i, r in enumerate(rows)
    )


def _table_gather(table: Array, lo: Array, hi: Array) -> Array:
    """out[r, j] = table[r, 128*hi[r, j] + lo[r, j]].

    Like :func:`_lane_gather` but the source is a SHARED (R, T) table
    (T <= 1024 lanes) while the output spans arbitrarily many lanes —
    the per-out-tile inner loop runs over the table's T/128 tiles only.
    """
    r, t = table.shape
    nb = lo.shape[1]
    if t <= _LANE and nb <= _LANE:
        return jnp.take_along_axis(table, lo, axis=1)
    nt = max(1, -(-t // _LANE))
    outs = []
    for u in range(nb // _LANE):
        sl = slice(u * _LANE, (u + 1) * _LANE)
        lo_u, hi_u = lo[:, sl], hi[:, sl]
        acc = jnp.zeros((r, _LANE), table.dtype)
        for ti in range(nt):
            g = jnp.take_along_axis(
                table[:, ti * _LANE:(ti + 1) * _LANE], lo_u, axis=1
            )
            acc = jnp.where(hi_u == ti, g, acc)
        outs.append(acc)
    return jnp.concatenate(outs, axis=1)


def _tab_kernel(block, table_ref, idx_ref, out_ref):
    table = table_ref[...]                    # (8, T) whole table, VMEM
    idx = idx_ref[...]                        # (8, NB), rows identical
    t = table.shape[1]
    # (Indices arrive pre-replicated across the 8 sublanes: an in-kernel
    # (1, NB) -> (8, NB) broadcast is a Mosaic relayout it rejects.)
    idx = jnp.clip(idx, 0, t - 1)
    hi = idx // _LANE
    lo = idx - hi * _LANE
    out_ref[...] = _table_gather(table, lo, hi)


@functools.partial(jax.jit, static_argnames=("interpret",))
def take_table(table: Array, idx: Array, interpret: bool = False) -> Array:
    """out[r, n] = table[r, idx[n]] for a small shared table.

    table (R, T) f32 with R <= 8, T <= 1024 (e.g. a (6, F) pose-update
    table in the sparse-BA CG matvec); idx (N,) int32 in [0, T). XLA's
    general gather runs this on the scalar core at ~10 ns/element; here it
    is (N/128) * (T/128) single-vreg dynamic gathers on the VPU.
    """
    r, t = table.shape
    assert r <= 8 and t <= 1024, (r, t)
    n = idx.shape[0]
    nb = 2048
    blocks = -(-n // nb)
    n_pad = blocks * nb
    # Lane-pad the table to a vreg multiple: _table_gather's tiled
    # single-vreg gathers need full 128-lane source tiles (a 64-frame
    # table would otherwise feed a (8, 64) source to a 128-lane gather,
    # which Mosaic rejects). idx is clipped to t-1, so pad lanes are dead.
    t_lane = max(_LANE, -(-t // _LANE) * _LANE)
    tab = jnp.pad(table.astype(jnp.float32), ((0, 8 - r), (0, t_lane - t)))
    idx_p = jnp.broadcast_to(
        jnp.pad(idx.astype(jnp.int32), (0, n_pad - n)).reshape(blocks, 1, nb),
        (blocks, 8, nb),
    )
    out = pl.pallas_call(
        functools.partial(_tab_kernel, nb),
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((8, t_lane), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, nb), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, 8, nb), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((blocks, 8, nb), jnp.float32),
        interpret=interpret,
    )(tab, idx_p)
    return out.transpose(1, 0, 2).reshape(8, n_pad)[:r, :n]
