"""Production-scale sparse bundle adjustment: 512 poses x 100k landmarks.

The regime the dense (F, L)-grid BA cannot represent (its coupling tensor
alone would be 3.7 TB); the COO + matrix-free Schur-CG formulation
(parallel/sparse_ba) holds O(N) state. Synthetic problem: landmarks on a
corridor, each observed by ~6 consecutive cameras => N ~ 600k
observations (utils/synthetic.generate_ba_corridor). One JSON line with
the per-LM-iteration wall time plus the bytes-model roofline fields
(utils/roofline.sparse_ba_model): the CG matvec and assembly are
HBM/segment-sum-bound, so achieved GB/s against the chip's 819 GB/s is
the speed-of-light context for the ms/iter headline.

The measurement packs ONCE and drives the jitted step directly: packing
is a host-side layout transform (pack_problem), not per-iteration work —
refine_sparse's convenience loop re-packs per call and would bill ~40 ms
of numpy argsort to every iteration.
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
    from visual_odometry_tpu.parallel import sparse_ba as sba
    from visual_odometry_tpu.utils import roofline, synthetic
    from visual_odometry_tpu.utils.timing import sync

    f, l = (64, 5_000) if small else (512, 100_000)
    k, problem, n_live = synthetic.generate_ba_corridor(f=f, l=l)
    kj = jnp.asarray(k)

    cg_iterations = 64
    packed, degree = sba.pack_problem(problem)
    p, stats = sba._jitted_step(
        kj, packed, jnp.float32(1.0), jnp.float32(10000.0), cg_iterations,
        jnp.float32(1e-6), lm_degree=degree,
    )
    sync(p.poses)  # compile + warm (real completion)
    chi0 = float(stats.chi)

    reps = 2 if small else 5
    t0 = time.perf_counter()
    for _ in range(reps):
        p, stats = sba._jitted_step(
            kj, p, jnp.float32(1.0), jnp.float32(10000.0), cg_iterations,
            jnp.float32(1e-6), lm_degree=degree,
        )
    sync(p.poses)
    per_iter = (time.perf_counter() - t0) / reps

    # Roofline fields against a FIXED CG budget (tolerance 0 => all
    # cg_iterations run, making the matvec count in the model exact; the
    # production tolerance above may exit CG early, which would overstate
    # utilization). Same compiled program — tolerance is a traced operand.
    t0 = time.perf_counter()
    for _ in range(reps):
        pf, _ = sba._jitted_step(
            kj, p, jnp.float32(1.0), jnp.float32(10000.0), cg_iterations,
            jnp.float32(0.0), lm_degree=degree,
        )
    sync(pf.poses)
    per_iter_fixed = (time.perf_counter() - t0) / reps

    n_slots = int(packed.uv.shape[0])  # packed slot count (padded slots work)
    model = roofline.sparse_ba_model(n_slots, f, l, cg_iterations)
    chip = roofline.V5E
    out = {
        "metric": f"sparse_ba_f{f}_l{l}",
        "value": round(1.0 / per_iter, 2),
        "unit": "LM_iters/s",
        "ms": round(per_iter * 1e3, 1),
        "observations": n_live,
        "packed_slots": n_slots,
        "chi_first": round(chi0, 1),
        "chi_now": round(float(stats.chi), 1),
        "cg_residual": float(stats.cg_residual),
        "ms_fixed_budget": round(per_iter_fixed * 1e3, 1),
    }
    out.update(model.report(per_iter_fixed, chip))
    print(json.dumps(out))
    assert float(stats.chi) < chi0, "BA did not reduce chi"


if __name__ == "__main__":
    import sys

    main(small="--small" in sys.argv)
