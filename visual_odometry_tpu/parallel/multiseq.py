"""Data-parallel tracking: many sequences in flight on one chip or a mesh.

The reference processes one sequence in one thread; the frame loop is
inherently serial (SURVEY.md §7 "hard parts"), so the TPU-native way to
scale *tracking* throughput is batch parallelism over independent sequences
(or keyframe windows of one long sequence): the whole vo_complete program
(models/pipeline) is vmapped over a leading batch axis — every per-frame
stage (matching, GN rounds, triangulation, map merge) then runs as batched
tensor ops that actually fill the MXU/VPU — and the batch axis is sharded
over the ``dp`` mesh axis across chips (zero cross-chip communication:
sequences are independent).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import pipeline
from ..models.landmark_map import LandmarkMap
from ..ops.camera import Camera
from ..utils.config import VOConfig

Array = jnp.ndarray


@functools.partial(jax.jit, static_argnames=("config",))
def _run_batch(camera: Camera, config: VOConfig, points, appearances, masks, ids):
    def one(p, a, m, i):
        return pipeline._run(camera, config, p, a, m, i, False)

    return jax.vmap(one)(points, appearances, masks, ids)


def run_sequences_batched(
    camera: Camera,
    config: VOConfig,
    points: Array,        # (B, F, S, 2)
    appearances: Array,   # (B, F, S, D)
    masks: Array,         # (B, F, S)
    mesh: Optional[Mesh] = None,
    dp_axis: str = "dp",
    validate: bool = True,
) -> Tuple[Array, LandmarkMap, pipeline.FrameOutput]:
    """Track B sequences at once; returns batched (trajectories, maps, outs).

    With ``mesh`` the batch axis is sharded over ``dp_axis`` (B must divide
    the axis size); without, the batch is vmapped on the current device.
    ``validate`` runs the fused world-join exactness guard on the result
    (pipeline.check_join_overflow — a scalar fetch); throughput harnesses
    that queue batches asynchronously can defer it after checking the
    workload once.
    """
    ids = jnp.full(masks.shape, -1, jnp.int32)
    if mesh is not None:
        spec = NamedSharding(mesh, P(dp_axis))
        points = jax.device_put(points, spec)
        appearances = jax.device_put(appearances, spec)
        masks = jax.device_put(masks, spec)
        ids = jax.device_put(ids, spec)
    out = _run_batch(camera, config, points, appearances, masks, ids)
    if validate:
        pipeline.check_join_overflow(out[2])
    return out
