"""On-device Pallas-vs-XLA equality self-check.

The Pallas kernels (ops/pallas) are validated bit-for-bit against the XLA
paths in interpret mode on CPU (tests/test_pallas_kernels.py); this module
runs the SAME comparisons through the compiled kernels on the actual
device, so compiled-mode (Mosaic) correctness is asserted directly rather
than riding on the benchmark's end-to-end accuracy guard. ``bench.py``
runs :func:`run_all` on the real chip before reporting throughput — a
fast-but-wrong kernel fails the round.

All checks build synthetic scenes (utils/synthetic) and compare:

  1. the whole-GN-loop kernel ``solve_fused`` vs ``ops.picp.solve``'s
     lax-loop backend (fixed budget AND early exit);
  2. the full fused frame-loop pipeline (``scan_backend="fused"``, one
     Pallas program for all frames) vs the ``lax.scan`` form — whole
     trajectories and landmark maps;
  3. the streaming matcher kernel vs the dense XLA matcher — exact index
     and distance equality.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models import pipeline
from ..ops import matching, picp
from ..ops.camera import project_points
from ..utils import synthetic
from ..utils.config import VOConfig


def check_picp_solver(interpret: bool = False, seed: int = 0) -> Dict[str, float]:
    """solve_fused (compiled unless ``interpret``) vs the XLA solve loop."""
    rng = np.random.default_rng(seed)
    world = synthetic.generate_points3d(rng, 192)
    x_gt = synthetic.generate_pose(rng)
    cam = synthetic.default_camera(np.eye(4, dtype=np.float32))
    meas, valid = project_points(synthetic.default_camera(x_gt), jnp.asarray(world))
    w = valid.astype(jnp.float32)
    cam_params = jnp.stack([cam.z_near, cam.z_far, cam.cols, cam.rows])

    from ..ops.pallas.picp_kernel import solve_fused

    diffs = {}
    for name, tol in (("fixed", 0.0), ("early_exit", 1e-12)):
        solved, st = picp.solve(
            cam, jnp.asarray(world), meas, w, 50,
            kernel_threshold=10000.0, tolerance=tol, backend="xla",
        )
        pose, st2 = solve_fused(
            cam.camera_matrix, cam.world_in_camera, cam_params,
            jnp.asarray(world), meas, w, 50,
            jnp.float32(10000.0), jnp.float32(1.0),
            jnp.float32(tol if tol > 0 else -1.0), interpret=interpret,
        )
        d = float(
            np.abs(np.asarray(pose) - np.asarray(solved.world_in_camera)).max()
        )
        diffs[f"picp_pose_diff_{name}"] = d
        assert d < 5e-4, (name, d)
        assert int(st.num_inliers) == int(st2.num_inliers), name
    return diffs


def check_frame_pipeline(interpret: bool = False, seed: int = 1) -> Dict[str, float]:
    """Fused frame-loop kernel pipeline vs the lax.scan pipeline, end to end."""
    rng = np.random.default_rng(seed)
    n_slots, frames = 64, 10
    pts, apps, masks = synthetic.generate_tracking_sequence(rng, frames, n_slots)
    # deep_camera: with z_far=5 the monocular rescale pushes synthetic
    # triangulations out of the frustum and tracking degenerates to
    # zero-inlier no-ops — the equality check must compare REAL work.
    camera = synthetic.deep_camera()
    base = VOConfig(n_slots=n_slots, map_capacity=128, gn_iterations=30)
    fused_backend = "fused_interpret" if interpret else "fused"

    traj_x, map_x, _ = pipeline.run_sequence(
        camera, base.replace(scan_backend="xla", solver_backend="xla"),
        jnp.asarray(pts), jnp.asarray(apps), jnp.asarray(masks),
    )
    traj_f, map_f, _ = pipeline.run_sequence(
        camera, base.replace(scan_backend=fused_backend),
        jnp.asarray(pts), jnp.asarray(apps), jnp.asarray(masks),
    )
    traj_x, traj_f = np.asarray(traj_x), np.asarray(traj_f)
    d_traj = float(np.abs(traj_x - traj_f).max())
    n_x = int(np.asarray(map_x.valid).sum())
    n_f = int(np.asarray(map_f.valid).sum())
    assert np.isfinite(traj_f).all()
    # The two backends are genuinely different f32 programs (scalar-form
    # Jacobi-scaled Schur solve vs pivoted LU, fused vs staged arithmetic);
    # on a REAL tracked trajectory (deep_camera orbit scene — the old
    # degenerate scene agreed to 5e-4 because both no-op'ed) they agree to
    # ~7e-4 absolute over 10 frames of O(1) translations. Structure
    # (landmark count) must match exactly.
    assert d_traj < 2e-3, d_traj
    assert n_x == n_f, (n_x, n_f)
    return {"frame_traj_diff": d_traj, "map_size": float(n_f)}


def check_picp_se2_solver(interpret: bool = False, seed: int = 4) -> Dict[str, float]:
    """solve_se2_fused (conjugated-SE(2) kernel) vs ops.picp_se2.solve_se2."""
    rng = np.random.default_rng(seed)
    from ..ops import picp_se2, se3
    from ..ops.pallas.picp_kernel import solve_se2_fused

    world = synthetic.generate_points3d(rng, 192)
    mount = np.array(
        se3.v2t_euler(jnp.float32([0.1, -0.2, 0.05, 0.02, -0.01, 0.03]))
    )
    x_gt = np.array(
        np.linalg.inv(mount)
        @ np.array(se3.v2t_se2(jnp.float32([0.15, -0.08, 0.1])))
        @ mount
    )
    cam = synthetic.default_camera(np.eye(4, dtype=np.float32))
    meas, valid = project_points(synthetic.default_camera(x_gt), jnp.asarray(world))
    w = valid.astype(jnp.float32)
    cam_params = jnp.stack([cam.z_near, cam.z_far, cam.cols, cam.rows])

    diffs = {}
    for name, tol in (("fixed", 0.0), ("early_exit", 1e-12)):
        solved, st = picp_se2.solve_se2(
            cam, jnp.asarray(world), meas, w, 50,
            kernel_threshold=10000.0, tolerance=tol, cam_in_robot=mount,
        )
        pose, st2 = solve_se2_fused(
            cam.camera_matrix, cam.world_in_camera, cam_params,
            jnp.asarray(mount), jnp.asarray(world), meas, w, 50,
            jnp.float32(10000.0), jnp.float32(1.0),
            jnp.float32(tol if tol > 0 else -1.0), interpret=interpret,
        )
        d = float(
            np.abs(np.asarray(pose) - np.asarray(solved.world_in_camera)).max()
        )
        diffs[f"picp_se2_pose_diff_{name}"] = d
        assert d < 5e-4, (name, d)
        assert int(st.num_inliers) == int(st2.num_inliers), name
    return diffs


def check_frame_pipeline_planar(interpret: bool = False, seed: int = 5) -> Dict[str, float]:
    """The PLANAR fused frame-loop (gn_loop_se2 in-kernel) vs the lax.scan
    planar pipeline (est_SE2 parity), end to end with a non-trivial mount."""
    rng = np.random.default_rng(seed)
    n_slots, frames = 64, 10
    pts, apps, masks = synthetic.generate_tracking_sequence(rng, frames, n_slots)
    camera = synthetic.deep_camera()
    from ..ops import se3

    mount = np.array(
        se3.v2t_euler(jnp.float32([0.05, -0.1, 0.02, 0.01, -0.02, 0.015]))
    )
    base = VOConfig(
        n_slots=n_slots, map_capacity=128, gn_iterations=30
    ).with_planar_mount(mount)
    fused_backend = "fused_interpret" if interpret else "fused"

    traj_x, map_x, _ = pipeline.run_sequence(
        camera, base.replace(scan_backend="xla", solver_backend="xla"),
        jnp.asarray(pts), jnp.asarray(apps), jnp.asarray(masks),
    )
    traj_f, map_f, _ = pipeline.run_sequence(
        camera, base.replace(scan_backend=fused_backend),
        jnp.asarray(pts), jnp.asarray(apps), jnp.asarray(masks),
    )
    traj_x, traj_f = np.asarray(traj_x), np.asarray(traj_f)
    d_traj = float(np.abs(traj_x - traj_f).max())
    n_x = int(np.asarray(map_x.valid).sum())
    n_f = int(np.asarray(map_f.valid).sum())
    assert np.isfinite(traj_f).all()
    assert d_traj < 2e-3, d_traj
    assert n_x == n_f, (n_x, n_f)
    # Every fused pose must stay exactly in the conjugated SE(2) subgroup:
    # c X c^-1 has no z-translation and a pure z-rotation block.
    conj = np.einsum(
        "ij,fjk,kl->fil", mount, traj_f, np.linalg.inv(mount)
    )
    planar_dev = max(
        float(np.abs(conj[:, 2, 3]).max()),
        float(np.abs(conj[:, 2, 0:2]).max()),
        float(np.abs(conj[:, 0:2, 2]).max()),
    )
    assert planar_dev < 1e-4, planar_dev
    return {"frame_planar_traj_diff": d_traj, "planar_subgroup_dev": planar_dev}


def check_matcher(interpret: bool = False, seed: int = 2) -> Dict[str, float]:
    """Streaming matcher kernel vs dense XLA matcher: exact equality."""
    rng = np.random.default_rng(seed)
    db = rng.uniform(-1, 1, (2048, 10)).astype(np.float32)
    q = db[rng.integers(0, 2048, 256)].copy()
    q[::3] += 0.01
    db_mask = np.ones(2048, bool)
    db_mask[::5] = False
    q_mask = np.ones(256, bool)
    d_x, i_x = matching.best_match(
        jnp.asarray(q), jnp.asarray(q_mask), jnp.asarray(db),
        jnp.asarray(db_mask), backend="xla",
    )
    d_p, i_p = matching.best_match(
        jnp.asarray(q), jnp.asarray(q_mask), jnp.asarray(db),
        jnp.asarray(db_mask), backend="pallas", interpret=interpret,
    )
    idx_equal = bool((np.asarray(i_x) == np.asarray(i_p)).all())
    d_diff = float(np.abs(np.asarray(d_x) - np.asarray(d_p)).max())
    assert idx_equal
    assert d_diff == 0.0, d_diff
    return {"matcher_dist_diff": d_diff}


def check_matcher_fast(interpret: bool = False, seed: int = 6) -> Dict[str, float]:
    """The fast (reduced-precision-select + exact-f32-rescore) matcher
    mode's contract (ops/matching.best_match precision="fast"):

      1. selection equals the exact matcher's wherever the nearest-vs-
         second-nearest RELATIVE margin exceeds the documented selection
         precision (~2^-9; the packed-key select truncates 11-13 mantissa
         bits and the bf16 gram rounds its inputs). The margin set is
         computed from an exact host top-2;
      2. on the sub-margin near-ties where selection may differ, the
         chosen candidate's EXACT distance exceeds the optimum by at most
         the same relative tolerance (never a wrong-by-a-margin pick);
      3. every returned distance is the EXACT f32 distance of the
         returned index (the rescore guarantee that keeps radius
         decisions exact), verified against a host recompute.
    """
    rng = np.random.default_rng(seed)
    k, q_n, d = 4096, 256, 10
    db = rng.uniform(-1, 1, (k, d)).astype(np.float32)
    q = db[rng.integers(0, k, q_n)].copy()
    q += rng.normal(0, 0.005, q.shape).astype(np.float32)  # near-dup winner
    db_mask = np.ones(k, bool)
    db_mask[::7] = False
    q_mask = np.ones(q_n, bool)

    d_x, i_x = matching.best_match(
        jnp.asarray(q), jnp.asarray(q_mask), jnp.asarray(db),
        jnp.asarray(db_mask), backend="xla",
    )
    d_f, i_f = matching.best_match(
        jnp.asarray(q), jnp.asarray(q_mask), jnp.asarray(db),
        jnp.asarray(db_mask), backend="pallas", interpret=interpret,
        precision="fast",
    )
    i_x, i_f = np.asarray(i_x), np.asarray(i_f)
    d_f = np.asarray(d_f)
    tol = 2.0 ** -9

    # Exact top-2 on the host.
    dist = ((q[:, None, :] - db[None, :, :]) ** 2).sum(-1)
    dist[:, ~db_mask] = np.inf
    top2 = np.partition(dist, 1, axis=1)[:, :2]
    margin = (top2[:, 1] - top2[:, 0]) / np.maximum(top2[:, 0], 1e-12)

    separated = margin > tol
    agree = i_x == i_f
    n_sep_mismatch = int((~agree & separated).sum())
    assert n_sep_mismatch == 0, n_sep_mismatch
    # Near-ties: the pick must be within tolerance of optimal (exactly).
    exact_pick = np.take_along_axis(dist, i_f[:, None], axis=1)[:, 0]
    excess = (exact_pick - top2[:, 0]) / np.maximum(top2[:, 0], 1e-12)
    assert float(excess.max()) <= tol, float(excess.max())
    # Rescore exactness: fast distances == f32 recompute at the index
    # (up to reduction-order ulps over the D=10 sum).
    diff = q - db[i_f]
    exact = np.sum(diff * diff, axis=1, dtype=np.float32)
    d_err = float(np.abs(d_f - exact).max())
    assert d_err < 1e-6, d_err
    return {
        "matcher_fast_rescore_err": d_err,
        "matcher_fast_tie_picks": float((~agree).sum()),
    }


def check_frame_serving(interpret: bool = False, seed: int = 7) -> Dict[str, float]:
    """Sublane-batched serving tracker vs the single-sequence fused path.

    The serving kernel's claim (ops/pallas/frame_kernel._kernel_serving,
    picp_kernel.gn_loop_batched) is that lock-stepping B sequences on the
    sublane axis changes tile LAYOUT, not arithmetic: per sequence every
    op runs in the same order on the same lanes, converged sequences are
    frozen exactly where their serial loop exited. Verified end to end
    (bootstrap + batched matching + serving kernel + map fold) against
    ``pipeline.run_sequence`` on the fused backend, per sequence."""
    from ..parallel import multiseq

    n_slots, frames, b = 64, 10, 4
    seqs = [
        synthetic.generate_tracking_sequence(
            np.random.default_rng(seed + i), frames, n_slots
        )
        for i in range(b)
    ]
    pts = np.stack([s[0] for s in seqs])
    apps = np.stack([s[1] for s in seqs])
    masks = np.stack([s[2] for s in seqs])
    camera = synthetic.deep_camera()
    fused_backend = "fused_interpret" if interpret else "fused"
    cfg = VOConfig(
        n_slots=n_slots, map_capacity=256, gn_iterations=30,
        scan_backend=fused_backend,
    )
    traj_b, maps_b, _ = multiseq.run_sequences_batched(
        camera, cfg, jnp.asarray(pts), jnp.asarray(apps), jnp.asarray(masks),
        backend="sublane", inner_batch=2, interpret=interpret,
    )
    # Apples-to-apples reference: the vmap form shares the serving path's
    # batched bootstrap bit-for-bit (vmapped eigh differs from single-pair
    # eigh at ~1e-6, which 30 GN rounds amplify to ~1e-3 — a property of
    # XLA's batched eigendecomposition, not of either frame loop), so the
    # only difference left is grid-row vs sublane frame tracking. Compiled
    # on TPU the two are BITWISE equal (verified r5 on an adversarial
    # random-join workload); the CPU interpreter lowers the (30, B, S)
    # lane reductions through different XLA fusions than (30, S) and
    # re-associates at ~1 ulp per GN round, so interpret mode gets the
    # fused-vs-scan style tolerance instead.
    traj_v, maps_v, _ = multiseq.run_sequences_batched(
        camera, cfg, jnp.asarray(pts), jnp.asarray(apps), jnp.asarray(masks),
        backend="vmap",
    )
    worst = float(np.abs(np.asarray(traj_b) - np.asarray(traj_v)).max())
    assert worst < (5e-3 if interpret else 1e-6), worst
    for i in range(b):
        n_ref = int(np.asarray(maps_v.valid)[i].sum())
        n_got = int(np.asarray(maps_b.valid)[i].sum())
        assert n_ref == n_got, (i, n_ref, n_got)
    # And against the per-sequence serial product path at the
    # bootstrap-sensitivity tolerance.
    worst_serial = 0.0
    for i in range(b):
        traj, _, _ = pipeline.run_sequence(
            camera, cfg, jnp.asarray(pts[i]), jnp.asarray(apps[i]),
            jnp.asarray(masks[i]),
        )
        worst_serial = max(
            worst_serial,
            float(np.abs(np.asarray(traj) - np.asarray(traj_b)[i]).max()),
        )
    assert worst_serial < 5e-3, worst_serial
    return {"serving_traj_diff": worst, "serving_vs_serial": worst_serial}


def check_pair_matcher(interpret: bool = False, seed: int = 3) -> Dict[str, float]:
    """Batched pair-matcher kernel vs the vmapped dense matcher: identical
    validity, indices and kd-side selection (compiled unless ``interpret``)."""
    rng = np.random.default_rng(seed)
    b, n, d = 6, 128, 10
    a1 = rng.uniform(-1, 1, (b, n, d)).astype(np.float32)
    a2 = a1 + rng.normal(0, 0.02, (b, n, d)).astype(np.float32)
    m1 = rng.uniform(size=(b, n)) > 0.2
    m2 = rng.uniform(size=(b, n)) > 0.2
    ref = matching.match_appearances_batch(
        jnp.asarray(a1), jnp.asarray(m1), jnp.asarray(a2), jnp.asarray(m2),
        backend="xla",
    )
    got = matching.match_appearances_batch(
        jnp.asarray(a1), jnp.asarray(m1), jnp.asarray(a2), jnp.asarray(m2),
        backend="pairs_pallas", interpret=interpret,
    )
    valid_equal = bool((np.asarray(ref.valid) == np.asarray(got.valid)).all())
    v = np.asarray(ref.valid)
    idx_equal = bool(
        (np.asarray(ref.idx1)[v] == np.asarray(got.idx1)[v]).all()
        and (np.asarray(ref.idx2)[v] == np.asarray(got.idx2)[v]).all()
    )
    assert valid_equal
    assert idx_equal
    return {"pair_matcher_n_valid": float(v.sum())}


def run_all(interpret: bool | None = None) -> Dict[str, float]:
    """Run every backend-equality check; raises AssertionError on mismatch.

    ``interpret=None`` auto-selects: compiled kernels on TPU, the Pallas
    interpreter elsewhere (kernels cannot compile for CPU).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = {}
    out.update(check_picp_solver(interpret))
    out.update(check_picp_se2_solver(interpret))
    out.update(check_frame_pipeline(interpret))
    out.update(check_frame_pipeline_planar(interpret))
    out.update(check_frame_serving(interpret))
    out.update(check_matcher(interpret))
    out.update(check_matcher_fast(interpret))
    out.update(check_pair_matcher(interpret))
    return out
