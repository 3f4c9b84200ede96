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
