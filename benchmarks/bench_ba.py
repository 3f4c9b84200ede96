"""Bundle-adjustment step throughput (single device + sharded-mesh dry run)."""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import _path  # noqa: F401  (repo-root import shim)


def main(small: bool = False) -> None:
    import jax.numpy as jnp

    import visual_odometry_tpu  # noqa: F401
    from visual_odometry_tpu.ops import se3
    from visual_odometry_tpu.ops.camera import project_points
    from visual_odometry_tpu.parallel import bundle_adjustment as ba
    from visual_odometry_tpu.utils import synthetic

    rng = np.random.default_rng(0)
    cases = [(8, 256)] if small else [(32, 1024), (121, 2048)]
    reps = 3 if small else 5

    for f, l in cases:
        world = np.stack(
            [rng.uniform(-2, 2, l), rng.uniform(-1.5, 1.5, l), rng.uniform(2, 4, l)],
            axis=1,
        ).astype(np.float32)
        poses, obs, mask = [], [], []
        for i in range(f):
            v = np.float32([0.01 * i, -0.005 * i, 0.02 * i, 0.002 * i, -0.002 * i, 0.001 * i])
            pose = np.array(se3.v2t_euler(jnp.asarray(v)))
            uv, valid = project_points(synthetic.default_camera(pose), jnp.asarray(world))
            poses.append(pose)
            obs.append(np.array(uv))
            mask.append(np.array(valid))
        problem = ba.BAProblem(
            poses=jnp.asarray(np.stack(poses)),
            landmarks=jnp.asarray(world + rng.uniform(-0.02, 0.02, world.shape).astype(np.float32)),
            observations=jnp.asarray(np.stack(obs)),
            obs_mask=jnp.asarray(np.stack(mask)),
        )
        cam = synthetic.default_camera()
        out, _ = ba.refine(cam.camera_matrix, problem, num_iterations=5)
        np.asarray(out.poses)
        t0 = time.perf_counter()
        for _ in range(reps):
            out, _ = ba.refine(cam.camera_matrix, problem, num_iterations=5)
        np.asarray(out.poses)
        dt = (time.perf_counter() - t0) / reps / 5
        n_obs = int(np.stack(mask).sum())
        print(json.dumps({
            "metric": f"ba_step_f{f}_l{l}",
            "value": round(n_obs / dt / 1e6, 2),
            "unit": "Mobs/s_per_iter",
            "ms_per_iter": round(dt * 1e3, 2),
        }))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--small", action="store_true")
    main(**vars(p.parse_args()))
