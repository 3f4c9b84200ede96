"""Production-scale synthetic tracking throughput.

The reference dataset is tiny (121 frames, <= 115 measurements/frame);
this bench exercises the SAME fused tracking program at production shapes
— more measurement slots per frame (bigger per-frame matcher/join/GN
tensors) and longer sequences — on synthetic scenes, verifying the
static-shape design holds and reporting frames/s per configuration.

One JSON line per (n_slots, frames) point. Measured on the real chip
(TPU v5e, 2026-08-21, round 4, fetch-forced sync): S=256/F=128 -> ~27.1k,
S=512/F=256 -> ~33.6k, S=1024/F=512 -> ~18.5k frames/s steady state.
(Round 3 measured 24.3k/19.1k/9.3k — the round-4 kernelization of the
join, matcher, gathers and map fold removed the S^2 terms; the remaining
slope is the matcher gram + map-fold sort, both ~linear in S. The small
S=256/F=128 program is fixed-cost-bound: its 128 frames amortize the
bootstrap/merge less than the longer sequences.)
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np

import _path  # noqa: F401  (repo-root import shim)


def _make_seq(n_slots: int, frames: int, seed: int = 0):
    import jax.numpy as jnp

    from visual_odometry_tpu.ops import se3
    from visual_odometry_tpu.ops.camera import project_points
    from visual_odometry_tpu.utils import synthetic

    rng = np.random.default_rng(seed)
    world = np.stack(
        [
            rng.uniform(-2.5, 2.5, n_slots),
            rng.uniform(-2.0, 2.0, n_slots),
            rng.uniform(2.0, 6.0, n_slots),
        ],
        axis=1,
    ).astype(np.float32)
    apps = synthetic.generate_appearances(rng, n_slots)
    pts, masks = [], []
    for i in range(frames):
        # Real parallax per consecutive pair (~0.07 translation/frame):
        # a near-pure-rotation step makes the monocular two-view bootstrap
        # degenerate by construction (E -> 0 as t -> 0), which is a
        # failure-path test concern (tests/test_pipeline.py), not a
        # throughput workload.
        v = np.float32(
            [0.05 * i, -0.02 * i, 0.04 * i, 0.001 * i, -0.001 * i, 0.0005 * i]
        )
        pose = np.array(se3.v2t_euler(jnp.asarray(v)))
        uv, valid = project_points(synthetic.default_camera(pose), jnp.asarray(world))
        pts.append(np.asarray(uv))
        masks.append(np.asarray(valid))
    return np.stack(pts), np.tile(apps[None], (frames, 1, 1)), np.stack(masks)


def main(small: bool = False) -> None:
    import jax
    import jax.numpy as jnp  # noqa: F401

    import visual_odometry_tpu  # noqa: F401
    from visual_odometry_tpu.models import pipeline
    from visual_odometry_tpu.utils.timing import sync
    from visual_odometry_tpu.utils import synthetic
    from visual_odometry_tpu.utils.config import VOConfig

    sizes = [(256, 64)] if small else [(256, 128), (512, 256), (1024, 512)]
    reps = 3 if small else 10

    for n_slots, frames in sizes:
        p, a, m = _make_seq(n_slots, frames)
        cfg = VOConfig(n_slots=n_slots, map_capacity=2 * n_slots)
        pj, aj, mj = jax.block_until_ready(jax.device_put((p, a, m)))
        # validate=False in the measurement loop: the join-overflow guard's
        # scalar fetch would serialize the queued programs. The warm-up call
        # below validates the workload once (validate defaults True).
        f = functools.partial(
            pipeline.run_sequence, synthetic.default_camera(), cfg,
            validate=False,
        )
        try:
            traj = jax.block_until_ready(
                pipeline.run_sequence(
                    synthetic.default_camera(), cfg, pj, aj, mj
                )[0]
            )
            assert np.isfinite(np.asarray(traj)).all()
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                rs = [f(pj, aj, mj)[0] for _ in range(reps)]
                sync(rs)
                best = min(best, (time.perf_counter() - t0) / reps)
            print(
                json.dumps(
                    {
                        "metric": f"pipeline_scale_s{n_slots}_f{frames}",
                        "value": round(frames / best, 1),
                        "unit": "frames/s",
                        "ms": round(best * 1e3, 2),
                    }
                )
            )
        except Exception as e:  # report, keep sweeping
            print(
                json.dumps(
                    {
                        "metric": f"pipeline_scale_s{n_slots}_f{frames}",
                        "value": 0,
                        "unit": "frames/s",
                        "error": str(e)[:160],
                    }
                )
            )


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--small", action="store_true")
    main(**vars(p.parse_args()))
