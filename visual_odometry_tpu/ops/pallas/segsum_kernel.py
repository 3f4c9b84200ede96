"""Segment-sum into a SMALL segment space as a one-hot MXU matmul kernel.

``jax.ops.segment_sum`` lowers to an XLA scatter-add, which serializes on
the TPU scalar core (~10 ns per scattered element — the sparse-BA CG
matvec spent most of its 4.3 s/iteration there at 600k observations).
When the segment space is small (the F <= 1024 camera poses of a bundle
adjustment), the sum is one accumulated matmul:

    out[r, t] = sum_n values[r, n] * (seg[n] == t)

with the (NB, T) one-hot built per block from an iota compare in VMEM and
contracted on the MXU — no scatter anywhere. f32 sums accumulate in MXU
order (deterministic, but not bitwise segment_sum order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _kernel(vals_ref, seg_ref, out_ref, acc):
    i = pl.program_id(0)
    nblocks = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    vals = vals_ref[...]                       # (R, NB)
    seg = seg_ref[...]                         # (NB, 1) column
    t = acc.shape[1]
    oh = (
        seg == jax.lax.broadcasted_iota(jnp.int32, (seg.shape[0], t), 1)
    ).astype(jnp.float32)                      # (NB, T)
    acc[...] += jax.lax.dot_general(
        vals, oh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(i == nblocks - 1)
    def _():
        out_ref[...] = acc[...]


@functools.partial(jax.jit, static_argnames=("num_segments", "interpret"))
def segment_sum_small(
    values: Array,       # (N, R) per-item rows
    seg: Array,          # (N,) int32 segment ids; out-of-range rows dropped
    num_segments: int,   # T <= 1024
    interpret: bool = False,
) -> Array:
    """(T, R) sums of ``values`` rows by segment id, scatter-free.

    Rows whose id is outside [0, T) contribute nothing (their one-hot row
    is all zeros) — pass the padding id T for masked items, exactly like
    the segment_sum-with-drop idiom.
    """
    n, r = values.shape
    assert num_segments <= 1024, num_segments
    r_pad = -(-r // 8) * 8
    nb = 2048
    blocks = -(-n // nb)
    n_pad = blocks * nb
    vals = jnp.pad(values.astype(jnp.float32), ((0, n_pad - n), (0, r_pad - r)))
    vals = vals.T.reshape(r_pad, blocks, nb).transpose(1, 0, 2)  # (B, R, NB)
    segs = jnp.pad(
        seg.astype(jnp.int32), (0, n_pad - n),
        constant_values=num_segments,
    ).reshape(blocks, nb, 1)
    out = pl.pallas_call(
        _kernel,
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((None, r_pad, nb), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, nb, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (r_pad, num_segments), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((r_pad, num_segments), jnp.float32),
        scratch_shapes=[pltpu.VMEM((r_pad, num_segments), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(vals, segs)
    return out[:r].T
