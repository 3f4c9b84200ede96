"""Pipeline throughput: single sequence and batched multi-sequence.

Prints one JSON line per measurement:
  {"metric": "...", "value": ..., "unit": "frames/s", ...}
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main(small: bool = False) -> None:
    import jax.numpy as jnp

    import visual_odometry_tpu  # noqa: F401
    from visual_odometry_tpu import apps
    from visual_odometry_tpu.ops.camera import Camera
    from visual_odometry_tpu.parallel import multiseq
    from visual_odometry_tpu.utils import io
    from visual_odometry_tpu.utils.config import VOConfig

    data = "/root/reference/example_data/data"
    reps = 3 if small else 6

    # Single sequence (the bench.py headline).
    apps.run_vo_complete(data, "/tmp/vo_bench_out", verbose=False)
    best = min(
        apps.run_vo_complete(data, "/tmp/vo_bench_out", verbose=False)[3]
        for _ in range(reps)
    )
    print(json.dumps({
        "metric": "pipeline_single_sequence",
        "value": round(121 / best, 1),
        "unit": "frames/s",
    }))

    # Batched.
    params = io.load_camera_params(f"{data}/camera.dat")
    camera = Camera.create(
        params.camera_matrix, rows=params.height, cols=params.width,
        z_near=params.z_near, z_far=params.z_far,
    )
    seq = io.load_sequence(data, 128)
    cfg = VOConfig()
    for b in ([2] if small else [4, 16]):
        pts = jnp.asarray(np.tile(seq.points[None], (b, 1, 1, 1)))
        apps_a = jnp.asarray(np.tile(seq.appearances[None], (b, 1, 1, 1)))
        m = jnp.asarray(np.tile(seq.mask[None], (b, 1, 1)))
        tr, _, _ = multiseq.run_sequences_batched(camera, cfg, pts, apps_a, m)
        np.asarray(tr)
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            tr, _, _ = multiseq.run_sequences_batched(camera, cfg, pts, apps_a, m)
            np.asarray(tr)
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({
            "metric": f"pipeline_batched_b{b}",
            "value": round(b * 121 / best, 1),
            "unit": "frames/s",
        }))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--small", action="store_true")
    main(**vars(p.parse_args()))
