"""Fixed-capacity landmark map with exact-appearance merge, on device.

TPU-native re-design of ``PointCloudVector::update``
(``/root/reference/include/PointCloud.h:52-66``): the reference linearly
scans the whole map per incoming point (O(map x new) on the host, the
hottest non-solver loop per SURVEY.md §3.1); here the merge is one
(new x capacity) equality matrix + argmax + two scatters, entirely inside
jit. Appearance identity is EXACT float equality (PointCloud.h:56 —
appearances act as opaque landmark keys, SURVEY.md §6 gotcha 4); they are
carried verbatim and never recomputed, so exact equality is well defined
even in float32.

Merge semantics preserved exactly:
  * an incoming point whose appearance equals an existing entry's REPLACES
    that entry's position (first match in insertion order);
  * otherwise it is APPENDED, in incoming order;
  * appearances are never modified.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from ..ops import se3

Array = jnp.ndarray


class LandmarkMap(NamedTuple):
    points: Array       # (C, 3)
    appearances: Array  # (C, D)
    valid: Array        # (C,) bool
    count: Array        # () int32 number of live entries (prefix of slots)

    @classmethod
    def empty(cls, capacity: int, appearance_dim: int = 10, dtype=jnp.float32) -> "LandmarkMap":
        return cls(
            points=jnp.zeros((capacity, 3), dtype),
            # Padding appearance is +inf-ish and unique-ish; real appearances
            # can never equal it so empty slots never absorb an update.
            appearances=jnp.full((capacity, appearance_dim), jnp.inf, dtype),
            valid=jnp.zeros((capacity,), bool),
            count=jnp.zeros((), jnp.int32),
        )


def update(map_state: LandmarkMap, points: Array, appearances: Array, mask: Array) -> LandmarkMap:
    """Merge a cloud into the map (PointCloud.h:52-66 semantics).

    Args:
      points: (N, 3) incoming positions.
      appearances: (N, D) incoming appearance keys (exact-match identity).
      mask: (N,) live incoming entries.

    Incoming entries beyond remaining capacity are dropped (the reference
    grows unboundedly; our capacity is a config knob sized to the dataset).
    """
    cap = map_state.points.shape[0]
    # (N, C) exact-equality: all D components equal AND the slot is live.
    eq = jnp.all(appearances[:, None, :] == map_state.appearances[None, :, :], axis=-1)
    eq = eq & map_state.valid[None, :] & mask[:, None]
    found = jnp.any(eq, axis=1)                      # (N,)
    match_idx = jnp.argmax(eq, axis=1).astype(jnp.int32)  # first match

    # Replace matched entries' positions. Two live incoming entries can only
    # target the same map slot if they share an appearance key (excluded by
    # construction: keys are unique landmark identities).
    safe_idx = jnp.where(found, match_idx, cap)  # cap == dropped
    new_points = map_state.points.at[safe_idx].set(points, mode="drop")

    # Append the rest, in incoming order, at count + running offset.
    append = mask & ~found
    offsets = jnp.cumsum(append.astype(jnp.int32)) - 1   # (N,)
    pos = jnp.where(append, map_state.count + offsets, cap)
    pos = jnp.where(pos < cap, pos, cap)  # overflow -> dropped
    new_points = new_points.at[pos].set(points, mode="drop")
    new_apps = map_state.appearances.at[pos].set(appearances, mode="drop")
    new_valid = map_state.valid.at[pos].set(True, mode="drop")
    n_appended = jnp.sum((append & (pos < cap)).astype(jnp.int32))
    return LandmarkMap(
        points=new_points,
        appearances=new_apps,
        valid=new_valid,
        count=map_state.count + n_appended,
    )


def transform(map_state: LandmarkMap, pose: Array) -> LandmarkMap:
    """Apply an isometry to all points (PointCloud.h:77-82); appearances kept."""
    return map_state._replace(points=se3.transform_points(pose, map_state.points))


def compact(map_state: LandmarkMap) -> Tuple[Array, Array]:
    """Host-side helper: live (points, appearances) in insertion order."""
    import numpy as np

    valid = np.asarray(map_state.valid)
    return np.asarray(map_state.points)[valid], np.asarray(map_state.appearances)[valid]
