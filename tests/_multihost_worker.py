"""Worker process for the multi-host smoke test (tests/test_multihost.py).

Each process owns 2 virtual CPU devices; after ``init_distributed`` the
global mesh spans 4 devices across the 2 processes and a shard_map psum
reduces over it — the DCN/ICI collective path of parallel/mesh.py's
multi-process branch, exercised for real (two OS processes, gRPC
coordination), just on CPU devices.

Usage: python _multihost_worker.py <coordinator> <num_processes> <process_id>
"""

import os
import sys


def main() -> int:
    coordinator, num_processes, process_id = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
    )
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import visual_odometry_tpu  # noqa: F401
    from visual_odometry_tpu.parallel import mesh as mesh_mod

    n_global = mesh_mod.init_distributed(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes, jax.process_count()
    assert n_global == 2 * num_processes, n_global

    import functools

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = mesh_mod.single_axis_mesh(name="lm")
    spec = NamedSharding(mesh, P("lm"))

    # Globally-sharded array: shard i holds [i, i+1) scaled rows.
    def cb(index):
        start = index[0].start or 0
        return np.arange(start, start + 1, dtype=np.float32).reshape(1, 1) + 1.0

    x = jax.make_array_from_callback((n_global, 1), spec, cb)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=P("lm"), out_specs=P()
    )
    def total(v):
        return jax.lax.psum(jnp.sum(v), "lm")

    result = float(np.asarray(jax.jit(total)(x)))
    expected = float(sum(range(1, n_global + 1)))
    assert result == expected, (result, expected)
    print(f"MULTIHOST OK process={process_id} devices={n_global} psum={result}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
