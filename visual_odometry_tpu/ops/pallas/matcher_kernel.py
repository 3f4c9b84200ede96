"""Fused top-1 appearance matcher as a Pallas TPU kernel.

The XLA path (``ops/matching.py``) computes the full (Q, K) squared-distance
matrix via the gram trick, which materializes Q*K floats in HBM before the
argmin reduction — at production scale (K ~ 10^5..10^6 database landmarks)
that traffic IS the cost. This kernel streams database tiles through VMEM,
does the gram matmul on the MXU, and folds the (min, argmin) reduction into
the same pass, so HBM traffic is just Q*D + K*D + O(Q).

Semantics are identical to ``ops.matching``/the reference kd-tree search
(brute_force_search.h:22-41): nearest database row by squared distance over
the descriptor (ids excluded by construction), first index wins ties
(ascending tile order + in-tile first-argmin).

Descriptors are padded to 128 lanes; the MXU contracts 128 lanes per pass
regardless, so the padding costs nothing.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_BIG = 3.4e38
LANE = 128


def _make_kernel(precision, bf16_select):
    def _kernel(q_ref, qn_ref, db_ref, dbn_ref, dist_ref, idx_ref, acc_d, acc_i):
        j = pl.program_id(1)
        nk = pl.num_programs(1)
        tk = db_ref.shape[0]

        @pl.when(j == 0)
        def _():
            acc_d[:, :] = jnp.full_like(acc_d, _BIG)
            acc_i[:, :] = jnp.zeros_like(acc_i)

        if bf16_select:
            # Fast-select mode: the (TQ, TK) selection epilogue is the
            # matcher's real cost (measured: time is invariant in tk — so
            # not grid sequencing — and a bf16 gram removes 6x of MXU time
            # but only ~40% of wall: ~1.1 ms of VPU work over the distance
            # tile remains at Q=1024 x K=131072). The epilogue here is ONE
            # i32 min-reduction over a PACKED key: clamped-non-negative
            # f32 bit patterns are monotonic in value, so stealing the low
            # log2(tk) mantissa bits for the column index yields value AND
            # first-argmin (ties on the truncated distance -> smallest
            # column) from a single reduce — no compare/select/second-
            # reduce passes. Selection precision is 23-log2(tk) mantissa
            # bits (12 at tk=2048 — finer than bf16's 7); the caller's
            # exact f32 rescore makes every returned distance, and thus
            # every radius decision, exact for the selected index.
            # ||q||^2 must STAY in the selection: the bit-pattern trick
            # needs non-negative values, and clamping dbn - 2 q.db (which
            # is negative whenever 2 q.db > ||db||^2) would collapse the
            # ordering below zero.
            gram = jax.lax.dot_general(
                q_ref[:, :],
                db_ref[:, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,  # MXU acc must be 32-bit
                precision=jax.lax.Precision.DEFAULT,
            )
            idx_bits = max((tk - 1).bit_length(), 1)
            idx_mask = jnp.int32((1 << idx_bits) - 1)
            d = jnp.maximum(
                qn_ref[:, :] + dbn_ref[:, :].reshape(1, tk) - 2.0 * gram,
                0.0,
            )
            col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
            key = (
                jax.lax.bitcast_convert_type(d, jnp.int32) & ~idx_mask
            ) | col
            kmin = jnp.min(key, axis=1, keepdims=True)        # (TQ, 1)
            tile_idx = (kmin & idx_mask) + j * tk
            tmin = jax.lax.bitcast_convert_type(
                kmin & ~idx_mask, jnp.float32
            )
            better = tmin < acc_d[:, :]
            acc_i[:, :] = jnp.where(better, tile_idx, acc_i[:, :])
            acc_d[:, :] = jnp.where(better, tmin, acc_d[:, :])
        else:
            # d[q, k] = ||q||^2 + ||k||^2 - 2 q.k  (gram on the MXU) —
            # the exact expression, in the exact order, of the XLA
            # matcher (bitwise-identical distances and tie-breaks).
            gram = jax.lax.dot_general(
                q_ref[:, :],
                db_ref[:, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            d = qn_ref[:, :] + dbn_ref[:, :].reshape(1, tk) - 2.0 * gram

            tile_min = jnp.min(d, axis=1, keepdims=True)              # (TQ, 1)
            # First-argmin without lax.argmin (not lowerable on all Mosaic
            # versions): smallest column index achieving the tile minimum.
            col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
            tile_arg = jnp.min(
                jnp.where(d <= tile_min, col, jnp.int32(2**30)),
                axis=1, keepdims=True,
            )
            tile_idx = tile_arg + j * tk

            better = tile_min < acc_d[:, :]
            acc_i[:, :] = jnp.where(better, tile_idx.astype(jnp.int32), acc_i[:, :])
            acc_d[:, :] = jnp.where(better, tile_min, acc_d[:, :])

        @pl.when(j == nk - 1)
        def _():
            dist_ref[:, :] = acc_d[:, :]
            idx_ref[:, :] = acc_i[:, :]

    return _kernel


def _pad_lane(x: Array, value: float = 0.0) -> Array:
    d = x.shape[-1]
    if d % LANE == 0:
        return x
    pad = LANE - d % LANE
    return jnp.pad(x, ((0, 0), (0, pad)), constant_values=value)


@functools.partial(
    jax.jit, static_argnames=("tq", "tk", "interpret", "precision", "exact_rescore")
)
def best_match_pallas(
    queries: Array,     # (Q, D)
    q_mask: Array,      # (Q,) bool
    db: Array,          # (K, D)
    db_mask: Array,     # (K,) bool
    tq: int = 0,
    tk: int = 0,
    interpret: bool = False,
    precision: str = "highest",
    exact_rescore: bool = False,
) -> Tuple[Array, Array]:
    """Top-1 match per query -> (sq_distance (Q,), db index (Q,)).

    Masked database rows can never win (their norm term is pushed to +BIG);
    masked queries return _BIG distance. Q and K are padded to tile
    multiples internally.

    ``precision="highest"`` keeps the gram matmul in full f32 (exact parity
    with the XLA matcher). ``precision="default"`` runs the MXU in fast
    bf16 passes — selection can then differ only between candidates within
    bf16 noise of each other; pair it with ``exact_rescore=True`` to
    recompute the winner's distance exactly in f32 so the radius-acceptance
    test stays exact (classic select-fast / rescore-exact retrieval).
    """
    q, d_dim = queries.shape
    k = db.shape[0]
    if tq <= 0:
        # Whole query set in one tile (up to 1024 rows): the grid is then
        # K/tk steps total. Small tiles pay the per-step sequencing cost
        # K/tk * Q/tq times — measured at Q=1024, K=2^20: tq=128/tk=512 ->
        # 16384 steps, ~20 ms; tq=1024/tk=2048 -> 512 steps, near the
        # ~8 ms f32-highest MXU floor.
        tq = min(1024, -(-q // LANE) * LANE)
    if tk <= 0:
        # Measured (Q=1024, K=131072, r5): wall time is essentially flat
        # in tk for the exact path (2.12/2.14/2.32 ms at 2048/4096/8192 —
        # the cost scales with CELLS, i.e. the VPU selection epilogue, not
        # with Mosaic grid steps), and the fast packed-key path is
        # fastest at 2048 (1.04 vs 1.44 ms at 8192: fewer stolen index
        # bits, smaller VMEM transient). 2048 everywhere.
        tk = 2048
    q_pad = -(-q // tq) * tq
    k_pad = -(-k // tk) * tk

    dbm = jnp.pad(db_mask, (0, k_pad - k), constant_values=False)
    qp = _pad_lane(jnp.pad(queries, ((0, q_pad - q), (0, 0))))
    dbp = _pad_lane(jnp.pad(db, ((0, k_pad - k), (0, 0))))
    # Zero out masked db rows so garbage (inf/nan sentinels) can't poison
    # the tile reductions; their distance is forced to +BIG via the norm.
    dbp = jnp.where(dbm[:, None], dbp, 0.0)
    qn = jnp.sum(qp * qp, -1, keepdims=True)                     # (Qp, 1)
    dbn = jnp.sum(dbp * dbp, -1, keepdims=True)                  # (Kp, 1)
    dbn = jnp.where(dbm[:, None], dbn, _BIG)

    grid = (q_pad // tq, k_pad // tk)
    bf16_sel = exact_rescore and precision != "highest"
    dist, idx = pl.pallas_call(
        _make_kernel(precision, bf16_sel),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, qp.shape[1]), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, dbp.shape[1]), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tq, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((q_pad, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tq, 1), jnp.float32),
            pltpu.VMEM((tq, 1), jnp.int32),
        ],
        # The (tq, tk) distance tile exceeds the conservative 16 MB default
        # scoped-VMEM limit at the large-tile defaults; v5e has 128 MB.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(qp, qn, dbp, dbn)

    dist = dist[:q, 0]
    idx = idx[:q, 0]
    if exact_rescore:
        # Recompute the winners' distances exactly in f32 (O(Q*D) work) so
        # the downstream radius test is unaffected by fast-matmul rounding.
        diff = queries - db[jnp.clip(idx, 0, k - 1)]
        dist = jnp.sum(diff * diff, axis=-1)
        win_masked = ~db_mask[jnp.clip(idx, 0, k - 1)]
        dist = jnp.where(win_masked, _BIG, dist)
    dist = jnp.where(q_mask, jnp.maximum(dist, 0.0), _BIG)
    return dist, idx


# ---------------------------------------------------------------------------
# Batched pair matcher: BOTH match directions for a batch of frame pairs in
# one pass, distance matrix never leaving VMEM.
#
# The hoisted per-sequence matcher (pipeline._batched_match) needs, for
# every consecutive frame pair, the top-1 match in BOTH directions (the
# kd-side selection of vo_complete.cpp:15-33 picks per pair). The dense XLA
# form materializes the (B, N, N) distance tensor in HBM (2.1 GB at
# B=510, N=1024) and re-reads it for each of the four (arg)min reductions —
# and inside large programs XLA rematerializes the whole distance
# computation per consumer (measured: the matcher stage alone cost 46 ms of
# a 91 ms tracking program at S=1024). Here each frame pair's (N, N)
# distances are computed and fully reduced inside one kernel: HBM traffic
# is 2*N*128 descriptor floats in and 4 N-vectors out per pair.
# ---------------------------------------------------------------------------


def _pairs_kernel(block_frames, precision, a_ref, b_ref, auxc_ref, auxr_ref,
                  d1_ref, i1_ref, d2_ref, i2_ref):
    """One block of frame pairs; per frame the full join in VMEM.

    Layouts per frame i: a/b (N, 128) lane-padded descriptors,
    auxc (N, 2) = [|a|^2, mask1] columns, auxr (2, N) = [|b|^2, mask2]
    rows; outputs (1, N) for the column direction (best frame-1 row per
    frame-2 point) and (N, 1) for the row direction — each reduction is
    emitted in its natural orientation, no transposes anywhere.
    """

    def body(i, _):
        a = a_ref[i]                      # (N, 128)
        b = b_ref[i]                      # (N, 128)
        a2 = auxc_ref[i, :, 0:1]          # (N, 1)
        m1 = auxc_ref[i, :, 1:2]          # (N, 1)
        b2 = auxr_ref[i, 0:1, :]          # (1, N)
        m2 = auxr_ref[i, 1:2, :]          # (1, N)
        n = a.shape[0]

        gram = jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )                                 # (N, N) rows=frame1, cols=frame2
        # Bitwise the XLA path: max(a2 + b2 - 2 gram, 0), masked to _BIG
        # (ops/matching.pairwise_sq_dists + match_appearances).
        d = jnp.maximum(a2 + b2 - 2.0 * gram, 0.0)
        d = jnp.where((m1 > 0.5) & (m2 > 0.5), d, _BIG)

        bigi = jnp.int32(2**30)
        # Direction A (kd = frame 1): per frame-2 column, first best row.
        cmin = jnp.min(d, axis=0, keepdims=True)               # (1, N)
        rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        carg = jnp.min(jnp.where(d <= cmin, rows, bigi), axis=0,
                       keepdims=True)
        # Direction B (kd = frame 2): per frame-1 row, first best column.
        rmin = jnp.min(d, axis=1, keepdims=True)               # (N, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        rarg = jnp.min(jnp.where(d <= rmin, cols, bigi), axis=1,
                       keepdims=True)

        d1_ref[i] = cmin
        i1_ref[i] = carg
        d2_ref[i] = rmin
        i2_ref[i] = rarg
        return 0

    jax.lax.fori_loop(0, block_frames, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "precision"))
def match_pairs_pallas(
    app1: Array,     # (B, N, D)
    mask1: Array,    # (B, N) bool
    app2: Array,     # (B, N, D)
    mask2: Array,    # (B, N) bool
    interpret: bool = False,
    precision: str = "highest",
) -> Tuple[Array, Array, Array, Array]:
    """Both-direction top-1 matches for B frame pairs.

    Returns (best1_d, best1, best2_d, best2), each (B, N):
    ``best1[j]`` = frame-1 index best matching frame-2 point j (the
    kd-is-frame-1 direction), ``best2[i]`` = frame-2 index best matching
    frame-1 point i. Bitwise identical to the dense XLA reductions in
    ops.matching.match_appearances (same gram expression at the same
    precision, first index wins ties).
    """
    b, n, d_dim = app1.shape
    # Descriptors ship UNPADDED: the MXU zero-pads the contraction to its
    # 128 lanes either way, so lane-padding on the host only adds a 12.8x
    # larger HBM array + a ~1.6 ms pad kernel (measured at B=510, N=1024)
    # for bitwise-identical grams.
    a2 = jnp.sum(app1 * app1, -1)     # unpadded-row reduction, as XLA path
    b2 = jnp.sum(app2 * app2, -1)
    auxc = jnp.stack([a2, mask1.astype(jnp.float32)], axis=-1)   # (B, N, 2)
    auxr = jnp.stack([b2, mask2.astype(jnp.float32)], axis=1)    # (B, 2, N)

    # Frames per grid block: ~8 MB of (VMEM-resident, lane-padded)
    # descriptor blocks per step.
    per_frame = 2 * n * 128 * 4
    fb = max(1, min(b, (8 * 1024 * 1024) // per_frame))
    prec = (
        jax.lax.Precision.HIGHEST if precision == "highest"
        else jax.lax.Precision.DEFAULT
    )

    def call(blk, a_s, b_s, c_s, r_s):
        nb = a_s.shape[0] // blk
        return pl.pallas_call(
            functools.partial(_pairs_kernel, blk, prec),
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((blk, n, d_dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((blk, n, d_dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((blk, n, 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((blk, 2, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((blk, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((blk, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((blk, n, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((blk, n, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((a_s.shape[0], 1, n), jnp.float32),
                jax.ShapeDtypeStruct((a_s.shape[0], 1, n), jnp.int32),
                jax.ShapeDtypeStruct((a_s.shape[0], n, 1), jnp.float32),
                jax.ShapeDtypeStruct((a_s.shape[0], n, 1), jnp.int32),
            ],
            # Descriptor blocks + the in-flight (N, N) distance tile exceed
            # the conservative 16 MB default scoped-VMEM limit at N=1024;
            # v5e has 128 MB of physical VMEM.
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(a_s, b_s, c_s, r_s)

    # Unaligned batch: one full-block call plus a small tail call, rather
    # than padding the batch axis — the pad op rewrites the whole
    # descriptor arrays in HBM (2 x 0.8 ms at B=510, N=1024) to feed two
    # extra frames.
    b_main = (b // fb) * fb
    outs = []
    if b_main:
        outs.append(call(
            fb, app1[:b_main], app2[:b_main], auxc[:b_main], auxr[:b_main]
        ))
    if b_main != b:
        outs.append(call(
            b - b_main, app1[b_main:], app2[b_main:], auxc[b_main:],
            auxr[b_main:],
        ))
    d1, i1, d2, i2 = (
        outs[0] if len(outs) == 1
        else tuple(jnp.concatenate(parts, axis=0) for parts in zip(*outs))
    )
    return (
        d1[:, 0, :],
        i1[:, 0, :],
        d2[:, :, 0],
        i2[:, :, 0],
    )
