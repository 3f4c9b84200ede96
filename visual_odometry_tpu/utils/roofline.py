"""MFU / roofline accounting for the hot kernels.

BASELINE.md sets "PICP Jacobian/Hessian-accumulation and appearance-matching
kernels at speed-of-light per chip" as a target; this module turns that
claim into numbers. For each hot kernel it pairs an analytic resource model
(MXU FLOPs, VPU element-ops, HBM bytes — counted from the kernel code, see
the *_model functions) with a measured steady-state runtime, and reports

  * achieved GB/s, MXU GFLOP/s and VPU Gop/s,
  * ``roofline_fraction`` = t_speed_of_light / t_measured, where the
    speed-of-light time is max(bytes/BW, mxu/peak, vpu/peak) — the fraction
    of the binding resource's peak the kernel actually sustains,
  * ``mfu`` = achieved MXU FLOP/s over the chip's matmul peak (meaningful
    for the MXU-bound matcher; the PICP/frame kernels are VPU/lane-bound by
    design — their Jacobians are 6-wide, far below MXU shape, which is WHY
    they are formulated as lane vectors — so their utilization story is
    ``vpu_fraction``/``roofline_fraction``, not MFU).

Chip peaks (TPU v5e, public spec / jax-ml.github.io/scaling-book): 197
bf16 TFLOP/s via 4 128x128 MXUs (=> ~1.5 GHz core clock), 819 GB/s HBM,
16 GB HBM. f32 operands at HIGHEST precision take 6 bf16 MXU passes =>
f32-highest matmul peak = 197/6 ~= 32.8 TFLOP/s. VPU: 8x128 lanes x 4
ALUs/lane at the core clock ~= 6.1e12 element-ops/s (an FMA counted as ONE
op — the conservative convention, since most ops in these kernels are not
FMAs).

The models count *useful* work only (no padding credit beyond the 128-lane
descriptor pad the MXU contracts for free) and are deliberately simple —
each is a lower bound on the true op count, so every fraction reported
here is a lower bound on the kernel's real utilization.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict

import numpy as np


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    name: str
    mxu_f32_flops: float   # f32-at-HIGHEST matmul peak, FLOP/s
    vpu_ops: float         # element-ops/s (FMA = 1 op)
    hbm_bw: float          # bytes/s


V5E = ChipSpec(
    name="tpu_v5e",
    mxu_f32_flops=197e12 / 6.0,
    vpu_ops=8 * 128 * 4 * 1.5e9,
    hbm_bw=819e9,
)

# Same chip with the matmul peak at the native single-pass bf16 rate —
# the right speed-of-light reference for kernels that run their MXU work
# in one bf16 pass (the matcher's "fast" select+rescore mode).
V5E_BF16 = ChipSpec(
    name="tpu_v5e_bf16",
    mxu_f32_flops=197e12,
    vpu_ops=V5E.vpu_ops,
    hbm_bw=V5E.hbm_bw,
)


@dataclasses.dataclass(frozen=True)
class KernelModel:
    """Analytic resource footprint of one kernel invocation."""

    name: str
    mxu_flops: float
    vpu_ops: float
    hbm_bytes: float

    def speed_of_light_s(self, chip: ChipSpec) -> float:
        return max(
            self.mxu_flops / chip.mxu_f32_flops,
            self.vpu_ops / chip.vpu_ops,
            self.hbm_bytes / chip.hbm_bw,
        )

    def report(self, measured_s: float, chip: ChipSpec) -> Dict[str, float]:
        sol = self.speed_of_light_s(chip)
        return {
            f"{self.name}_time_us": round(measured_s * 1e6, 2),
            f"{self.name}_gbps": round(self.hbm_bytes / measured_s / 1e9, 1),
            f"{self.name}_mxu_gflops": round(self.mxu_flops / measured_s / 1e9, 1),
            f"{self.name}_vpu_gops": round(self.vpu_ops / measured_s / 1e9, 1),
            f"{self.name}_mfu": round(
                self.mxu_flops / measured_s / chip.mxu_f32_flops, 4
            ),
            f"{self.name}_roofline_fraction": round(sol / measured_s, 4),
        }


# --- analytic models (op counts from the kernel code, cited per term) ----


def matcher_model(q: int, k: int) -> KernelModel:
    """Streaming top-1 matcher (ops/pallas/matcher_kernel.py).

    Gram matmul (Q, 128) x (128, K) at HIGHEST precision -> 2*Q*K*128 MXU
    FLOPs (descriptors are lane-padded to 128; the MXU contracts 128 lanes
    per pass, so the pad is physically contracted — counted as useful since
    it is unavoidable shape, matcher_kernel.py:15-16). VPU: distance
    assembly + tile (min, argmin) + running-min update ~= 6 ops per (q, k)
    cell (matcher_kernel.py:55-67). HBM: queries + database once, plus
    norms and the (dist, idx) outputs.
    """
    return KernelModel(
        name="matcher",
        mxu_flops=2.0 * q * k * 128,
        vpu_ops=6.0 * q * k,
        hbm_bytes=4.0 * (q * 128 + k * 128 + q + k + 2 * q),
    )


# Hand count of gn_loop's per-point per-round element ops
# (ops/pallas/picp_kernel.py:288-360): projection+K 36, perspective/validity
# 26, error/robust-kernel 16, Jp*K coefficients 24, J columns 18, 21 H rows
# x 4 ops + 6 b rows x 4 + 3 stat rows x 2 = 114, stacked (30, N) lane
# reduction ~30. Total ~264; the O(1) Schur solve + Euler update
# (~350 scalar ops/round) is excluded (vanishes per point for N >= 128).
GN_OPS_PER_POINT_ROUND = 264.0


def picp_model(n: int, rounds: int) -> KernelModel:
    """Whole-GN-loop solver (ops/pallas/picp_kernel.solve_fused).

    Pure VPU lane work; HBM traffic is the (3+2+1) input rows once plus the
    (8, 128) output block — every round after the first reads VMEM only.
    """
    return KernelModel(
        name="picp",
        mxu_flops=0.0,
        vpu_ops=GN_OPS_PER_POINT_ROUND * n * rounds,
        hbm_bytes=4.0 * (6 * n + 8 * 128),
    )


def frame_model(frames: int, s: int, depth: int, rounds: int) -> KernelModel:
    """Fused frame-loop kernel (ops/pallas/frame_kernel.py), per launch.

    Per frame: carried-triangulation transform 18*S, the tiled-gather join
    ~4 ops per (out-lane, src-tile) pair over 4*depth sublanes
    (= 4 * 4*depth * S * ceil(S/128)), chain select ~6*depth*S, GN rounds
    (GN_OPS_PER_POINT_ROUND * rounds * S), mid-point triangulation ~80*S
    (frame_kernel.py _kernel). HBM: (5 pix + 3*depth cand + 8 out) rows of
    S f32 per frame.
    """
    nt = max(1, -(-s // 128))
    join = 4.0 * (4 * depth) * 128 * nt * nt
    per_frame = (
        18.0 * s
        + join
        + 6.0 * depth * s
        + GN_OPS_PER_POINT_ROUND * rounds * s
        + 80.0 * s
    )
    return KernelModel(
        name="frame",
        mxu_flops=0.0,
        vpu_ops=frames * per_frame,
        hbm_bytes=frames * 4.0 * (5 + 3 * depth + 8) * s,
    )


def pipeline_floor_s(
    frames: int,
    s: int,
    depth: int = 2,
    gn_rounds: int = 3,
    d_app: int = 10,
    chip: ChipSpec = V5E,
) -> float:
    """Speed-of-light seconds for ONE tracking sequence (the vo_complete
    program): the sum of each stage's own binding-resource floor — stages
    are distinct sequential kernels, so the pipeline floor is additive.

    Deliberate LOWER bound (every fraction reported against it is a lower
    bound on true utilization): per consecutive frame pair one f32-HIGHEST
    gram (2*S*S*128 MXU FLOPs) + ~8 VPU ops per (i, j) cell for the
    in-kernel distance/arg reductions (matcher_kernel._pairs_kernel); the
    join-candidate kernel's (S, S) equality + depth+1 masked mins
    (~3*(depth+2) ops/cell); the fused frame kernel at ``gn_rounds``
    GN rounds per frame (converged early-exit solves measure 2-4 rounds
    on example_data — 3 keeps the floor below any real run); one
    payload-carrying merge-stream fold over the F*S observation stream
    (two sorts x (D+5) f32 columns, counted as one read + one write of
    the full width each — real bitonic passes cost more).
    """
    pairs = max(frames - 1, 0)
    t = 0.0
    # matcher (both-direction pair kernel)
    t += max(
        pairs * 2.0 * s * s * 128 / chip.mxu_f32_flops,
        pairs * 8.0 * s * s / chip.vpu_ops,
        pairs * 2.0 * s * 128 * 4 / chip.hbm_bw,
    )
    # join candidates
    t += pairs * 3.0 * (depth + 2) * s * s / chip.vpu_ops
    # fused frame loop
    fm = frame_model(pairs, s, depth, gn_rounds)
    t += fm.speed_of_light_s(chip)
    # map fold (two payload sorts over the stream)
    stream = frames * s
    t += 2.0 * 2.0 * stream * (d_app + 5) * 4.0 / chip.hbm_bw
    return t


def sparse_ba_model(n: int, f: int, l: int, cg_iters: int) -> KernelModel:
    """One LM iteration of the packed sparse Schur-CG BA
    (parallel/sparse_ba.sparse_ba_step with lm_degree set).

    The step is HBM-bound: every stage streams (N, R) per-observation row
    blocks. Byte counts are LOWER bounds — only operands that must cross
    HBM at least once are counted, assuming XLA fuses every elementwise
    chain (intermediates that a fusion keeps in registers are free, the
    segment-sum reshape-reduce reads its input once):

      * assembly (_build_reduced): per-obs inputs uv/idx/mask ~5N reads;
        the four sqrt-weighted Jacobian row blocks written then re-read by
        the outer products (2 * 18N); pose/landmark outer products
        written+read through the segment sums (2 * 45N); the
        preconditioner's coupling correction (w_n 18N written+read, y_n/
        diag 2 * 54N) — ~220N floats, plus 2 * 9L for H_ll/its inverse.
      * each CG matvec (_coupling_apply + the H_pp diagonal term): the row
        blocks re-read (18N), the landmark-stage intermediates u/mn
        (2 * 3N write+read), mask (N), h_ll_inv (9L) — ~31N + 9L floats.
      * back-substitution: one more matvec-shaped pass (~31N + 9L).

    VPU ops (FMA = 1): assembly ~320/obs (projection+Jacobians ~110,
    outers 45+9, preconditioner correction ~150), matvec ~45/obs.
    MXU: none — the 6-wide pose blocks are far below MXU shape, which is
    why the formulation is lane-vector segment sums (module docstring).
    """
    floats = (220.0 * n + 18.0 * l) + (cg_iters + 1) * (31.0 * n + 9.0 * l)
    return KernelModel(
        name="sparse_ba",
        mxu_flops=0.0,
        vpu_ops=320.0 * n + (cg_iters + 1) * 45.0 * n,
        hbm_bytes=4.0 * floats,
    )


# --- measured utilization on the current device --------------------------


def _steady_state_s(fn, reps: int = 30, rounds: int = 3) -> float:
    """Best-of-rounds steady-state seconds per call, queue depth ``reps``
    (the tunnel's ~2 ms per-call completion latency overlaps across queued
    programs; single-shot timing under-reports the chip)."""
    import jax

    from .timing import sync

    sync(fn())  # compile + real completion
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        rs = [fn() for _ in range(reps)]
        # sync(), not block_until_ready: the tunnel can report readiness
        # before execution completes (utils/timing.py).
        sync(rs)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def dispatch_overhead_s(reps: int = 30, rounds: int = 3) -> float:
    """Fixed per-dispatch cost of ONE program execution on this host/device
    path: the steady-state time of a trivial jitted ``x + 1`` on an (8, 128)
    block. Measured ~0.9 ms under the axon tunnel (r5) — and it does NOT
    overlap across queued calls, so every per-call kernel timing sits on
    this floor. A kernel's own time is what :func:`_steady_state_chained_s`
    reports; this number is published alongside so the decomposition
    (program time vs host-path dispatch) is visible in the bench JSON."""
    import jax
    import jax.numpy as jnp

    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda v: v + 1.0)
    return _steady_state_s(lambda: f(x), reps=reps, rounds=rounds)


def _steady_state_chained_s(
    step_fn, g: int = 16, reps: int = 6, rounds: int = 3
) -> float:
    """Per-invocation seconds with ``g`` invocations chained inside ONE
    dispatched program (a ``lax.scan`` whose carry perturbs the next step's
    input by ~1e-30x an output scalar, so steps stay data-dependent and
    cannot be CSE'd away).

    Why: the per-dispatch overhead (:func:`dispatch_overhead_s`, ~0.9 ms
    under the tunnel) is serialized per call — measured r5: a trivial jit
    call costs 897 us at queue depth 30, and the exact matcher reads
    1.94 ms per single call but 1.23 ms per invocation when 16 are chained
    in-program. Production programs (whole-sequence trackers, batched
    serving) amortize dispatch over milliseconds of device work exactly
    like the chain does, so the chained number is the kernel's true
    steady-state device time; the per-call number is published alongside
    as ``*_call_us``. The g-th of the overhead still included here keeps
    the estimate conservative (no subtraction)."""
    import jax
    import jax.numpy as jnp

    from .timing import sync

    @jax.jit
    def run(eps):
        def body(c, _):
            out = step_fn(c)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return leaf.reshape(-1)[0].astype(jnp.float32) * 1e-30, None

        return jax.lax.scan(body, eps, None, length=g)[0]

    z = jnp.float32(0.0)
    sync(run(z))
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        rs = [run(z) for _ in range(reps)]
        sync(rs)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best / g


def measure(seed: int = 0) -> Dict[str, float]:
    """Time the three hot kernels at production shapes on the current
    device and report achieved-vs-peak utilization for each.

    Shapes: matcher Q=1024 x K=131072 (map-relocalization scale), PICP
    N=1024 x 100 fixed rounds, frame loop S=1024 x 10 fixed rounds x 128
    frames. Fixed GN budgets (tolerance < 0) make the analytic op model
    exact — the early-exit production path can only do LESS work.

    Each kernel is timed two ways: per single dispatched call
    (``*_call_us`` — includes the fixed host-path dispatch overhead,
    ``dispatch_overhead_us``) and amortized over 16 invocations chained
    inside one program (``*_time_us`` — the kernel's true steady-state
    device time; see :func:`_steady_state_chained_s`). Roofline/MFU
    fractions use the chained time: they describe the KERNEL, and the
    ~0.9 ms dispatch constant under the tunnel is a property of the host
    path that production whole-sequence/batched programs amortize away.
    """
    import jax
    import jax.numpy as jnp

    from ..ops import matching
    from ..ops.pallas import frame_kernel, picp_kernel
    from . import synthetic

    rng = np.random.default_rng(seed)
    chip = V5E
    out: Dict[str, float] = {"chip": chip.name}  # type: ignore[dict-item]
    out["dispatch_overhead_us"] = round(dispatch_overhead_s() * 1e6, 1)

    # Every measured callable is wrapped in ONE jit: called eagerly, the
    # host-side packing ops around a kernel dispatch one device op at a
    # time (~2 ms tunnel latency each — measured 3.5 ms/frame vs the real
    # 4 us/frame before this was jitted).

    # 1. matcher at map scale.
    q_n, k_n = 1024, 131072
    db = jnp.asarray(rng.uniform(-1, 1, (k_n, 10)), jnp.float32)
    qs = jnp.asarray(rng.uniform(-1, 1, (q_n, 10)), jnp.float32)
    db_mask = jnp.ones((k_n,), bool)
    q_mask = jnp.ones((q_n,), bool)
    # db/masks as closure constants: passing them as jit arguments made
    # this measurement read 58x too fast on the tunneled chip (a
    # physically impossible mfu > 1 — cf. the "never trust a single
    # suspicious-fast number" protocol note in bench.py); the closure form
    # measures consistently and matches the un-wrapped kernel timing.
    match_j = jax.jit(
        lambda q: matching.best_match(q, q_mask, db, db_mask, backend="pallas")
    )
    t_call = _steady_state_s(lambda: match_j(qs), reps=15)
    t = _steady_state_chained_s(
        lambda eps: matching.best_match(
            qs + eps, q_mask, db, db_mask, backend="pallas"
        )
    )
    out.update(matcher_model(q_n, k_n).report(t, chip))
    out["matcher_call_us"] = round(t_call * 1e6, 2)
    assert out["matcher_mfu"] <= 1.0, out  # a >1 "mfu" is a broken timer

    # 2. whole-GN-loop PICP solve, fixed budget.
    n, rounds_gn = 1024, 100
    world = synthetic.generate_points3d(rng, n)
    x_gt = synthetic.generate_pose(rng)
    cam = synthetic.default_camera(np.eye(4, dtype=np.float32))
    from ..ops.camera import project_points

    meas, valid = project_points(synthetic.default_camera(x_gt), jnp.asarray(world))
    w = valid.astype(jnp.float32)
    cam_params = jnp.stack([cam.z_near, cam.z_far, cam.cols, cam.rows])

    def picp_step(eps):
        return picp_kernel.solve_fused(
            cam.camera_matrix, cam.world_in_camera, cam_params,
            wp_j + eps, meas, w, rounds_gn,
            jnp.float32(10000.0), jnp.float32(1.0), jnp.float32(-1.0),
        )

    picp_j = jax.jit(picp_step)
    wp_j = jnp.asarray(world)
    zero = jnp.float32(0.0)
    t_call = _steady_state_s(lambda: picp_j(zero), reps=15)
    t = _steady_state_chained_s(picp_step)
    out.update(picp_model(n, rounds_gn).report(t, chip))
    out["picp_call_us"] = round(t_call * 1e6, 2)

    # 3. fused frame loop, fixed budget.
    frames, s, depth, rounds_fr = 128, 1024, 2, 10
    world = np.stack(
        [
            rng.uniform(-2.5, 2.5, s),
            rng.uniform(-2.0, 2.0, s),
            rng.uniform(2.0, 6.0, s),
        ],
        axis=1,
    ).astype(np.float32)
    uv, valid = project_points(synthetic.default_camera(), jnp.asarray(world))
    idx = jnp.arange(s, dtype=jnp.int32)
    ok = jnp.asarray(valid)
    cand = frame_kernel.JoinCandidates(
        lo=jnp.broadcast_to(idx % 128, (frames, depth, s)),
        hi=jnp.broadcast_to(idx // 128, (frames, depth, s)),
        ok=jnp.broadcast_to(ok, (frames, depth, s)),
        overflow=jnp.zeros((frames, s), bool),
    )
    pix = jnp.broadcast_to(jnp.asarray(uv), (frames, s, 2))
    cvalid = jnp.broadcast_to(ok, (frames, s))
    tri0 = jnp.asarray(world)

    def frame_step(eps):
        return frame_kernel.track_frames_fused(
            cam.camera_matrix, cam_params, jnp.eye(4, dtype=jnp.float32),
            tri0 + eps, ok, cand, pix, pix, cvalid,
            rounds_fr, jnp.float32(10000.0), jnp.float32(1.0),
            jnp.float32(-1.0),
        )

    frame_j = jax.jit(frame_step)
    t_call = _steady_state_s(lambda: frame_j(zero), reps=15)
    t = _steady_state_chained_s(frame_step, g=8, reps=4)
    out.update(frame_model(frames, s, depth, rounds_fr).report(t, chip))
    out["frame_call_us"] = round(t_call * 1e6, 2)
    out["frame_us_per_frame"] = round(t / frames * 1e6, 2)
    return out


def measure_sparse_ba(
    f: int = 512, l: int = 100_000, cg_iterations: int = 64
) -> Dict[str, float]:
    """Sparse-BA roofline fields at the production headline shape
    (512 poses x 100k landmarks x ~590k observations, the
    benchmarks/bench_sparse_ba problem): ms/LM-iteration at a FIXED CG
    budget (tolerance 0 keeps the model's matvec count exact) against
    :func:`sparse_ba_model`'s HBM-bytes speed of light."""
    import jax.numpy as jnp

    from ..parallel import sparse_ba as sba
    from . import synthetic
    from .timing import sync

    k, problem, _ = synthetic.generate_ba_corridor(f=f, l=l)
    kj = jnp.asarray(k)
    packed, degree = sba.pack_problem(problem)

    def step(p):
        return sba._jitted_step(
            kj, p, jnp.float32(1.0), jnp.float32(10000.0), cg_iterations,
            jnp.float32(0.0), lm_degree=degree,
        )[0]

    p = step(packed)
    sync(p.poses)  # compile + warm
    reps = 3
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        q = p
        for _ in range(reps):
            q = step(q)
        sync(q.poses)
        best = min(best, (time.perf_counter() - t0) / reps)
    n_slots = int(packed.uv.shape[0])
    out = sparse_ba_model(n_slots, f, l, cg_iterations).report(best, V5E)
    out["sparse_ba_ms_per_iter"] = round(best * 1e3, 1)
    return out


def main() -> None:
    import json

    print(json.dumps(measure()))


if __name__ == "__main__":
    main()
