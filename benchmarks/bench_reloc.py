"""Map-scale re-localization throughput: streaming kernel vs dense XLA.

The end-to-end production seat of ops/pallas/matcher_kernel: one frame's
descriptors queried against a map_capacity-row landmark map, matches fed
to the PICP solve (pipeline.relocalize_frame). The dense XLA matcher
materializes the (S, capacity) distance matrix in HBM; the streaming
kernel's traffic is O(S + capacity). One JSON line per (capacity,
backend).
"""

from __future__ import annotations

import json
import time

import numpy as np

import _path  # noqa: F401


def main(small: bool = False) -> None:
    import jax
    import jax.numpy as jnp

    import visual_odometry_tpu  # noqa: F401
    from visual_odometry_tpu.models import pipeline
    from visual_odometry_tpu.models.landmark_map import LandmarkMap
    from visual_odometry_tpu.utils import synthetic
    from visual_odometry_tpu.utils.config import VOConfig

    rng = np.random.default_rng(0)
    s = 1024
    caps = [1 << 14] if small else [1 << 14, 1 << 17, 1 << 20]
    reps = 5 if small else 30

    for cap in caps:
        # Synthetic map: landmarks with unique appearance keys; the query
        # frame observes s of them exactly (worst case for the matcher:
        # every query live, full database live).
        world = np.stack(
            [
                rng.uniform(-2.5, 2.5, cap),
                rng.uniform(-2.0, 2.0, cap),
                rng.uniform(2.0, 6.0, cap),
            ],
            axis=1,
        ).astype(np.float32)
        apps = rng.uniform(-1.0, 1.0, (cap, 10)).astype(np.float32)
        map_state = LandmarkMap(
            points=jnp.asarray(world),
            appearances=jnp.asarray(apps),
            valid=jnp.ones((cap,), bool),
            count=jnp.asarray(cap, jnp.int32),
        )
        sel = rng.integers(0, cap, s)
        camera = synthetic.default_camera()
        from visual_odometry_tpu.ops.camera import project_points

        uv, valid = project_points(camera, jnp.asarray(world[sel]))
        frame = pipeline.FrameData(
            points=uv,
            appearances=jnp.asarray(apps[sel]),
            mask=valid,
            ids=jnp.full((s,), -1, jnp.int32),
        )
        x0 = jnp.eye(4, dtype=jnp.float32)

        for backend in ("xla", "pallas"):
            cfg = VOConfig(
                n_slots=s, map_capacity=cap, matcher_backend=backend,
                gn_iterations=30,
            )
            fn = lambda: pipeline.relocalize_frame(  # noqa: E731
                camera, cfg, map_state, frame, x0
            )
            jax.block_until_ready(fn())
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                rs = [fn() for _ in range(reps)]
                jax.block_until_ready(rs)
                best = min(best, (time.perf_counter() - t0) / reps)
            print(
                json.dumps(
                    {
                        "metric": f"reloc_cap{cap}_{backend}",
                        "value": round(1.0 / best, 1),
                        "unit": "queries/s",
                        "ms": round(best * 1e3, 3),
                    }
                )
            )


if __name__ == "__main__":
    import sys

    main(small="--small" in sys.argv)
