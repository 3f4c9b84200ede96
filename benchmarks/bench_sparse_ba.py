"""Production-scale sparse bundle adjustment: 512 poses x 100k landmarks.

The regime the dense (F, L)-grid BA cannot represent (its coupling tensor
alone would be 3.7 TB); the COO + matrix-free Schur-CG formulation
(parallel/sparse_ba) holds O(N) state. Synthetic problem: landmarks on a
corridor, each observed by ~6 consecutive cameras => N ~ 600k
observations. One JSON line with the per-LM-iteration wall time.
"""

from __future__ import annotations

import json
import time

import numpy as np

import _path  # noqa: F401


def make_problem(f=512, l=100_000, obs_per_lm=6, seed=0):
    import jax.numpy as jnp

    from visual_odometry_tpu.ops import se3
    from visual_odometry_tpu.parallel import sparse_ba as sba

    rng = np.random.default_rng(seed)
    # Cameras advance along z; landmark i becomes visible around camera
    # i * f / l and is observed by the next obs_per_lm cameras.
    world = np.stack(
        [
            rng.uniform(-2.0, 2.0, l),
            rng.uniform(-1.5, 1.5, l),
            rng.uniform(0.0, 0.2 * f, l),
        ],
        axis=1,
    ).astype(np.float32)
    vs = np.zeros((f, 6), np.float32)
    vs[:, 2] = 0.2 * np.arange(f)  # t_z
    poses = np.asarray(
        np.stack([np.array(se3.v2t_euler(jnp.asarray(-v))) for v in vs])
    )

    # Cameras look +z from z = 0.2*i: observe each landmark from the
    # obs_per_lm cameras ~1-2.2 units BEFORE it (all depths positive).
    first = np.clip(
        (world[:, 2] / 0.2).astype(np.int64) - obs_per_lm - 5, 0, f - obs_per_lm
    )
    lm_idx = np.repeat(np.arange(l, dtype=np.int64), obs_per_lm)
    frame_idx = (
        np.repeat(first, obs_per_lm)
        + np.tile(np.arange(obs_per_lm), l)
    ).astype(np.int64)

    k = np.array(
        [[180.0, 0.0, 320.0], [0.0, 180.0, 240.0], [0.0, 0.0, 1.0]],
        np.float32,
    )
    pw = world[lm_idx]
    rp = poses[frame_idx]
    pc = np.einsum("nij,nj->ni", rp[:, :3, :3], pw) + rp[:, :3, 3]
    depth_ok = pc[:, 2] > 0.1
    uv = (pc @ k.T)
    uv = uv[:, :2] / np.maximum(uv[:, 2:], 1e-6)
    in_img = (
        (uv[:, 0] >= 0) & (uv[:, 0] < 640) & (uv[:, 1] >= 0) & (uv[:, 1] < 480)
    )
    mask = depth_ok & in_img

    noisy_lms = world + rng.normal(0, 0.02, world.shape).astype(np.float32)
    noisy_poses = poses.copy()
    for i in range(1, f):
        dv = rng.uniform(-0.01, 0.01, 6).astype(np.float32)
        noisy_poses[i] = np.array(se3.v2t_euler(jnp.asarray(dv))) @ noisy_poses[i]

    problem = sba.SparseBAProblem(
        poses=jnp.asarray(noisy_poses),
        landmarks=jnp.asarray(noisy_lms),
        frame_idx=jnp.asarray(frame_idx.astype(np.int32)),
        lm_idx=jnp.asarray(lm_idx.astype(np.int32)),
        uv=jnp.asarray(uv.astype(np.float32)),
        obs_mask=jnp.asarray(mask),
    )
    return k, problem, int(mask.sum())


def main(small: bool = False) -> None:
    import jax
    import jax.numpy as jnp

    import visual_odometry_tpu  # noqa: F401
    from visual_odometry_tpu.parallel import sparse_ba as sba

    f, l = (64, 5_000) if small else (512, 100_000)
    k, problem, n_live = make_problem(f=f, l=l)
    kj = jnp.asarray(k)

    refined, stats = sba.refine_sparse(kj, problem, num_iterations=1)
    from visual_odometry_tpu.utils.timing import sync

    sync(refined.poses)  # compile + warm (real completion)
    chi0 = float(stats.chi)

    reps = 2 if small else 5
    t0 = time.perf_counter()
    p = problem
    for _ in range(reps):
        p, stats = sba.refine_sparse(kj, p, num_iterations=1)
    sync(p.poses)
    per_iter = (time.perf_counter() - t0) / reps
    print(
        json.dumps(
            {
                "metric": f"sparse_ba_f{f}_l{l}",
                "value": round(1.0 / per_iter, 2),
                "unit": "LM_iters/s",
                "ms": round(per_iter * 1e3, 1),
                "observations": n_live,
                "chi_first": round(chi0, 1),
                "chi_now": round(float(stats.chi), 1),
                "cg_residual": float(stats.cg_residual),
            }
        )
    )
    assert float(stats.chi) < chi0, "BA did not reduce chi"


if __name__ == "__main__":
    import sys

    main(small="--small" in sys.argv)
