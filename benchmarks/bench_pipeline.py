"""Pipeline throughput: single sequence and batched multi-sequence serving.

The flagship tracking program is latency-bound by design (one sequence's
frame loop is serial; BENCH_r04 measured it at ~3% of roofline), so the
chip-filling axis is BATCH parallelism over independent sequences
(parallel/multiseq). Since r5 the serving path lock-steps groups of
sequences on the SUBLANE axis of the fused frame kernel
(frame_kernel.track_frames_fused_serving) instead of folding them into
serial grid rows, and every surrounding stage batches into one kernel;
measured sweep on v5e: 150k/192k/194k frames/s at b=32/64/128 (the vmap
grid-row form saturated at ~103k). This bench sweeps the batch size and
reports frames/s per point plus the serving utilization against
utils/roofline.pipeline_floor_s (the additive per-stage speed-of-light
of B independent sequences).

Prints one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import _path  # noqa: F401  (repo-root import shim)


def main(small: bool = False) -> None:
    import jax
    import jax.numpy as jnp

    import visual_odometry_tpu  # noqa: F401
    from visual_odometry_tpu.ops.camera import Camera
    from visual_odometry_tpu.parallel import multiseq
    from visual_odometry_tpu.utils import io, roofline
    from visual_odometry_tpu.utils.config import VOConfig
    from visual_odometry_tpu.utils.timing import sync

    data = "/root/reference/example_data/data"

    params = io.load_camera_params(f"{data}/camera.dat")
    camera = Camera.create(
        params.camera_matrix, rows=params.height, cols=params.width,
        z_near=params.z_near, z_far=params.z_far,
    )
    seq = io.load_sequence(data, 128)
    cfg = VOConfig()
    f_total = int(seq.mask.shape[0])

    # Single sequence under the SAME device protocol as the batched rows
    # (and bench.py's headline): queued device-resident programs, sync
    # once — so scaling_vs_single is device-vs-device, not app wall time.
    from visual_odometry_tpu.models import pipeline as pl_mod

    pj = jnp.asarray(seq.points)
    aj = jnp.asarray(seq.appearances)
    mj = jnp.asarray(seq.mask)
    sync(pl_mod.run_sequence(camera, cfg, pj, aj, mj)[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        rs = [
            pl_mod.run_sequence(camera, cfg, pj, aj, mj, validate=False)[0]
            for _ in range(30)
        ]
        sync(rs)
        best = min(best, (time.perf_counter() - t0) / 30)
    single_fps = f_total / best
    print(json.dumps({
        "metric": "pipeline_single_sequence",
        "value": round(single_fps, 1),
        "unit": "frames/s",
    }))
    floor1 = roofline.pipeline_floor_s(f_total, 128)
    best_row = None
    for b in ([2] if small else [4, 16, 32, 64, 128]):
        # Distinct per-sequence noise so no cross-sequence redundancy can
        # be exploited (it isn't, but the measurement shouldn't rely on it).
        rng = np.random.default_rng(b)
        pts = np.tile(seq.points[None], (b, 1, 1, 1))
        pts = pts + rng.uniform(-0.5, 0.5, (b, 1, 1, 2)).astype(np.float32)
        pts_j = jnp.asarray(pts)
        apps_a = jnp.asarray(np.tile(seq.appearances[None], (b, 1, 1, 1)))
        m = jnp.asarray(np.tile(seq.mask[None], (b, 1, 1)))
        try:
            call = lambda: multiseq.run_sequences_batched(  # noqa: E731
                camera, cfg, pts_j, apps_a, m, validate=False
            )[0]
            tr = multiseq.run_sequences_batched(camera, cfg, pts_j, apps_a, m)[0]
            sync(tr)  # compile + warm + validated once
            queue = max(1, (8 if small else 20) // max(1, b // 8))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                rs = [call() for _ in range(queue)]
                sync(rs)
                best = min(best, (time.perf_counter() - t0) / queue)
            fps = b * f_total / best
            row = {
                "metric": f"pipeline_batched_b{b}",
                "value": round(fps, 1),
                "unit": "frames/s",
                "ms": round(best * 1e3, 2),
                "scaling_vs_single": round(fps / single_fps, 2),
                # Lower bound on utilization: B x the single-sequence
                # additive stage floor over the measured wall time.
                "serving_roofline_fraction": round(b * floor1 / best, 4),
            }
            print(json.dumps(row))
            if best_row is None or fps > best_row["value"]:
                best_row = {**row, "batch": b}
        except Exception as e:  # report, keep sweeping
            print(json.dumps({
                "metric": f"pipeline_batched_b{b}",
                "value": 0,
                "unit": "frames/s",
                "error": str(e)[:200],
            }))
    if best_row is not None:
        print(json.dumps({
            "metric": "pipeline_serving_best",
            "value": best_row["value"],
            "unit": "frames/s",
            "batch": best_row["batch"],
            "serving_roofline_fraction": best_row["serving_roofline_fraction"],
        }))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--small", action="store_true")
    main(**vars(p.parse_args()))
