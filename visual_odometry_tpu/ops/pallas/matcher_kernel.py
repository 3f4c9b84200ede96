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


def _make_kernel(precision):
    def _kernel(q_ref, qn_ref, db_ref, dbn_ref, dist_ref, idx_ref, acc_d, acc_i):
        j = pl.program_id(1)
        nk = pl.num_programs(1)
        tk = db_ref.shape[0]

        @pl.when(j == 0)
        def _():
            acc_d[:, :] = jnp.full_like(acc_d, _BIG)
            acc_i[:, :] = jnp.zeros_like(acc_i)

        # d[q, k] = ||q||^2 + ||k||^2 - 2 q.k  (gram on the MXU)
        gram = jax.lax.dot_general(
            q_ref[:, :],
            db_ref[:, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        d = qn_ref[:, :] + dbn_ref[:, :].reshape(1, tk) - 2.0 * gram  # (TQ, TK)

        tile_min = jnp.min(d, axis=1, keepdims=True)                  # (TQ, 1)
        # First-argmin without lax.argmin (not lowerable on all Mosaic
        # versions): smallest column index achieving the tile minimum.
        col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        tile_arg = jnp.min(
            jnp.where(d <= tile_min, col, jnp.int32(2**30)), axis=1, keepdims=True
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
    tq: int = 128,
    tk: int = 512,
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
    dist, idx = pl.pallas_call(
        _make_kernel(precision),
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
