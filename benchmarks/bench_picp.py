"""PICP linearization throughput at production correspondence counts."""

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
    from visual_odometry_tpu.ops import picp
    from visual_odometry_tpu.ops.pallas.picp_kernel import linearize_pallas
    from visual_odometry_tpu.utils import synthetic

    rng = np.random.default_rng(0)
    sizes = [4096] if small else [4096, 65536, 1048576]
    reps = 3 if small else 10

    for n in sizes:
        world = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(1, 4, n)],
            axis=1,
        ).astype(np.float32)
        cam = synthetic.default_camera(np.eye(4, dtype=np.float32))
        meas = rng.uniform(0, 480, (n, 2)).astype(np.float32)
        w = np.ones(n, np.float32)
        args_np = (jnp.asarray(world), jnp.asarray(meas), jnp.asarray(w))
        kt = jnp.float32(1e4)
        cam_params = jnp.asarray([0.0, 5.0, 640.0, 480.0], jnp.float32)

        jax_lin = jax.jit(lambda wp, mp, wt: picp.linearize(cam, wp, mp, wt, kt))

        def pal_lin(wp, mp, wt):
            return linearize_pallas(
                cam.camera_matrix, cam.world_in_camera, cam_params, wp, mp, wt, kt
            )

        for name, f in (("xla", jax_lin), ("pallas", pal_lin)):
            r = f(*args_np)
            np.asarray(r[0])
            t0 = time.perf_counter()
            for _ in range(reps):
                r = f(*args_np)
            np.asarray(r[0])
            dt = (time.perf_counter() - t0) / reps
            print(json.dumps({
                "metric": f"picp_linearize_{name}_n{n}",
                "value": round(n / dt / 1e6, 1),
                "unit": "Mcorr/s",
                "ms": round(dt * 1e3, 3),
            }))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--small", action="store_true")
    main(**vars(p.parse_args()))
