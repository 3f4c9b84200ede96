"""Map-scale re-localization throughput: streaming kernel vs dense XLA.

The end-to-end production seat of ops/pallas/matcher_kernel: one frame's
descriptors queried against a map_capacity-row landmark map, matches fed
to the PICP solve (pipeline.relocalize_frame). One JSON line per
(capacity, backend).

Measurement isolation: each (capacity, backend) point runs in its OWN
subprocess. Measured on the tunneled chip: after several distinct
programs have executed in one process, steady-state timings can read
impossibly fast (0.07 ms for a 1024 x 2^20 match whose MXU floor is
~8 ms — the same artifact the repo bench notes as "never trust a single
suspicious-fast number"); fresh-process measurements are reproducible.
Every row also carries ``floor_ms`` — the analytic speed-of-light time
from utils/roofline's matcher model — and is marked ``suspect`` if it
beats physics.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

import _path  # noqa: F401


def measure_one(cap: int, backend: str, reps: int) -> None:
    import jax
    import jax.numpy as jnp

    import visual_odometry_tpu  # noqa: F401
    from visual_odometry_tpu.models import pipeline
    from visual_odometry_tpu.models.landmark_map import LandmarkMap
    from visual_odometry_tpu.utils import roofline, synthetic
    from visual_odometry_tpu.utils.config import VOConfig
    from visual_odometry_tpu.ops.camera import project_points

    rng = np.random.default_rng(0)
    s = 1024
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
    uv, valid = project_points(camera, jnp.asarray(world[sel]))
    frame = pipeline.FrameData(
        points=uv,
        appearances=jnp.asarray(apps[sel]),
        mask=valid,
        ids=jnp.full((s,), -1, jnp.int32),
    )
    x0 = jnp.eye(4, dtype=jnp.float32)
    # "pallas_fast" = the streaming kernel with the bf16-select +
    # exact-f32-rescore mode (config.matcher_precision="fast"): one MXU
    # pass instead of six, radius decisions still exact.
    fast = backend == "pallas_fast"
    cfg = VOConfig(
        n_slots=s, map_capacity=cap,
        matcher_backend="pallas" if fast else backend,
        matcher_precision="fast" if fast else "highest",
        gn_iterations=30,
    )
    fn = lambda: pipeline.relocalize_frame(  # noqa: E731
        camera, cfg, map_state, frame, x0
    )
    from visual_odometry_tpu.utils.timing import sync

    sync(fn())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        rs = [fn() for _ in range(reps)]
        sync(rs)
        best = min(best, (time.perf_counter() - t0) / reps)

    # Amortized: 8 queries chained inside one dispatched program — the
    # fixed ~0.9-1.2 ms per-dispatch tunnel cost (dominant at the smaller
    # map sizes) divides out; a production relocalization service queries
    # in exactly this regime (see utils/roofline._steady_state_chained_s).
    def step(eps):
        f2 = frame._replace(points=frame.points + eps)
        return pipeline.relocalize_frame(camera, cfg, map_state, f2, x0)

    chained = roofline._steady_state_chained_s(step, g=8, reps=4, rounds=2)

    chip = roofline.V5E_BF16 if fast else roofline.V5E
    floor = roofline.matcher_model(s, cap).speed_of_light_s(chip)
    row = {
        "metric": f"reloc_cap{cap}_{backend}",
        "value": round(1.0 / chained, 1),
        "unit": "queries/s",
        "ms": round(best * 1e3, 3),
        "ms_chained": round(chained * 1e3, 3),
        "floor_ms": round(floor * 1e3, 3),
    }
    if chained < floor:
        row["suspect"] = True  # beats physics => broken measurement
    print(json.dumps(row))


def main(small: bool = False) -> None:
    caps = [1 << 14] if small else [1 << 14, 1 << 17, 1 << 20]
    reps = 5 if small else 20
    here = os.path.abspath(__file__)
    for cap in caps:
        for backend in ("xla", "pallas", "pallas_fast"):
            subprocess.run(
                [sys.executable, here, "--one", str(cap), backend, str(reps)],
                check=True,
            )


if __name__ == "__main__":
    if "--one" in sys.argv:
        i = sys.argv.index("--one")
        measure_one(int(sys.argv[i + 1]), sys.argv[i + 2], int(sys.argv[i + 3]))
    else:
        main(small="--small" in sys.argv)
