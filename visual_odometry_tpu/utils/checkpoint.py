"""Checkpoint / resume for the tracking pipeline.

The reference has no in-run checkpointing — its de-facto checkpoint is the
final output file set (SURVEY.md §5). This module adds real mid-sequence
checkpointing: the scan carry (:class:`models.pipeline.VOState`) plus the
trajectory-so-far round-trips through one ``.npz`` file, so a long run can
be resumed from frame k with bitwise-identical continuation (all state is
explicit — there is no hidden host state in the pipeline).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..models import pipeline
from ..models.landmark_map import LandmarkMap


def save_state(file_path: str, state: pipeline.VOState, trajectory: np.ndarray) -> None:
    np.savez_compressed(
        file_path,
        ref_points=np.asarray(state.ref.points),
        ref_appearances=np.asarray(state.ref.appearances),
        ref_mask=np.asarray(state.ref.mask),
        ref_ids=np.asarray(state.ref.ids),
        point_lookup=np.asarray(state.point_lookup),
        tri_points=np.asarray(state.tri_points),
        tri_valid=np.asarray(state.tri_valid),
        x_curr=np.asarray(state.x_curr),
        history=np.asarray(state.history),
        map_points=np.asarray(state.map.points),
        map_appearances=np.asarray(state.map.appearances),
        map_valid=np.asarray(state.map.valid),
        map_count=np.asarray(state.map.count),
        trajectory=np.asarray(trajectory),
    )


def load_state(file_path: str) -> Tuple[pipeline.VOState, np.ndarray]:
    z = np.load(file_path)
    state = pipeline.VOState(
        ref=pipeline.FrameData(
            points=jnp.asarray(z["ref_points"]),
            appearances=jnp.asarray(z["ref_appearances"]),
            mask=jnp.asarray(z["ref_mask"]),
            ids=jnp.asarray(z["ref_ids"]),
        ),
        point_lookup=jnp.asarray(z["point_lookup"]),
        tri_points=jnp.asarray(z["tri_points"]),
        tri_valid=jnp.asarray(z["tri_valid"]),
        x_curr=jnp.asarray(z["x_curr"]),
        history=jnp.asarray(z["history"]),
        map=LandmarkMap(
            points=jnp.asarray(z["map_points"]),
            appearances=jnp.asarray(z["map_appearances"]),
            valid=jnp.asarray(z["map_valid"]),
            count=jnp.asarray(z["map_count"]),
        ),
    )
    return state, z["trajectory"]
