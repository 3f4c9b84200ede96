"""Appearance-matcher throughput: XLA path vs Pallas kernel across scales."""

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
    from visual_odometry_tpu.ops import matching
    from visual_odometry_tpu.ops.pallas.matcher_kernel import best_match_pallas

    rng = np.random.default_rng(0)
    sizes = (
        [(1024, 8192)]
        if small
        else [(1024, 8192), (4096, 65536), (8192, 262144), (8192, 1048576)]
    )
    reps = 3 if small else 10

    for q_n, k_n in sizes:
        db = rng.uniform(-1, 1, (k_n, 10)).astype(np.float32)
        q = db[rng.integers(0, k_n, q_n)].copy()
        dbj, qj = jnp.asarray(db), jnp.asarray(q)
        dbm = jnp.ones(k_n, bool)
        qm = jnp.ones(q_n, bool)

        @jax.jit
        def xla(a, b):
            d = matching.pairwise_sq_dists(a, b)
            return jnp.min(d, 1), jnp.argmin(d, 1)

        def pal(a, b):
            return best_match_pallas(a, qm, b, dbm, precision="default", exact_rescore=True)

        for name, f in (("xla", xla), ("pallas", pal)):
            try:
                r = f(qj, dbj)
                [np.asarray(x) for x in r]
                t0 = time.perf_counter()
                for _ in range(reps):
                    r = f(qj, dbj)
                [np.asarray(x) for x in r]
                dt = (time.perf_counter() - t0) / reps
                print(json.dumps({
                    "metric": f"matcher_{name}_{q_n}x{k_n}",
                    "value": round(q_n * k_n / dt / 1e9, 2),
                    "unit": "Gpairs/s",
                    "ms": round(dt * 1e3, 2),
                }))
            except Exception as e:
                print(json.dumps({
                    "metric": f"matcher_{name}_{q_n}x{k_n}",
                    "value": 0, "unit": "Gpairs/s", "error": str(e)[:120],
                }))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--small", action="store_true")
    main(**vars(p.parse_args()))
