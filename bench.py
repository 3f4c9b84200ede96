"""Headline benchmark: full vo_complete pipeline throughput on example_data.

Prints ONE JSON line:
  {"metric": "vo_pipeline_throughput", "value": <frames/s>, "unit":
   "frames/s", "vs_baseline": <ours / reference C++>, ...spread and
   roofline fields...}

Baseline: the reference implementation (lucanunz/Visual-odometry, C++17 +
Eigen3, -O3, single thread) compiled on THIS host and timed on the same
121-frame example dataset: 0.193 s end-to-end => ~627 frames/s
(build: g++ -O3 -DNDEBUG -std=c++17 with tensorflow's bundled Eigen
headers; timed 2026-08-17, best of runs). The reference publishes no
throughput numbers of its own (SURVEY.md §6), so this measured number is
the baseline of record in BASELINE_MEASURED below.

Protocol. The benchmark measures steady-state device throughput of the
FULL pipeline (appearance matching + PICP + triangulation + map
maintenance for every frame): 30 tracking programs queued back-to-back
over device-resident inputs, completion forced by a host fetch
(utils/timing.sync — block_until_ready can lie under the tunnel), best
of 5 rounds — the serving regime, where per-call tunnel latency overlaps
across queued work.

Variance control. The same protocol measured 34.9k / 48.7k / ~57.9k
frames/s across rounds 3-4 — the spread is PROCESS-level (tunnel/process
state; within one process rounds agree to a few percent), so a
single-process best-of-rounds cannot bound it. The measurement therefore
runs in N_PROCESSES fresh sequential subprocesses; the headline is the
best process (process noise only ever slows a latency-bound program —
the floor is physics) and the JSON reports the per-process values,
median, and spread so a degraded capture is visible instead of silently
published. A `suspect` flag marks the impossible direction (beating the
analytic pipeline floor).

Dispatch-overhead decomposition (r5). Every dispatched program on this
host path pays a fixed ~0.9 ms (a trivial jitted x+1 measures 897 us at
queue depth 30 — the tunnel serializes it per call, queueing does not
hide it). The per-call protocol above therefore over-counts the
pipeline's device time by that constant; ``fps_chained`` re-measures
with 8 whole tracking programs chained inside ONE dispatched program
(data-dependent lax.scan), amortizing the constant to ~1/8 — that is
the chip's true steady-state single-sequence throughput. ``value``
stays the per-call protocol for round-to-round comparability.

Guards (run once, in the first subprocess): every Pallas kernel is
compared against its XLA twin compiled on THIS chip
(utils/selfcheck.run_all), and the end-to-end accuracy must beat the
reference baselines — a fast-but-wrong kernel zeroes the headline.

Extra published numbers: per-kernel MFU/roofline fields
(utils/roofline.measure), the sparse-BA production-scale roofline fields
(utils/roofline.measure_sparse_ba; disable with VO_BENCH_SPARSE=0), and
the batched multi-sequence SERVING throughput at b=64 — the chip-filling
number for the latency-bound flagship (disable with VO_BENCH_SERVING=0).
"""

import json
import os
import subprocess
import sys
import time

BASELINE_MEASURED_FPS = 627.0  # reference C++ on this host, see docstring

DATA_DIR = os.environ.get("VO_BENCH_DATA", "/root/reference/example_data/data")
N_PROCESSES = int(os.environ.get("VO_BENCH_PROCESSES", "3"))
ROUNDS = 5
REPS = 30  # queue depth per round (see docstring)
SERVING_BATCH = 64  # sublane serving saturates here (r5 sweep: 150k/192k/194k at b=32/64/128)


def _measure(full: bool) -> int:
    """Child-process body: measure throughput (and, when ``full``, run the
    guards + roofline/serving/sparse extras). Prints one JSON line."""
    import numpy as np

    import jax

    import visual_odometry_tpu  # noqa: F401  (precision policy)
    from visual_odometry_tpu import apps
    from visual_odometry_tpu.models import pipeline
    from visual_odometry_tpu.ops.camera import Camera
    from visual_odometry_tpu.utils import io
    from visual_odometry_tpu.utils.config import DEFAULT_CONFIG
    from visual_odometry_tpu.utils.timing import sync

    out_dir = "/tmp/vo_bench_out"
    out = {}

    # Warm-up (compiles the whole program; persistently cached) + the
    # output files the accuracy guard evaluates.
    apps.run_vo_complete(DATA_DIR, out_dir, verbose=False)

    params = io.load_camera_params(os.path.join(DATA_DIR, "camera.dat"))
    camera = Camera.create(
        params.camera_matrix, rows=params.height, cols=params.width,
        z_near=params.z_near, z_far=params.z_far,
    )
    seq = io.load_sequence(DATA_DIR, DEFAULT_CONFIG.n_slots)
    pts, apps_a, mask = jax.block_until_ready(
        jax.device_put((seq.points, seq.appearances, seq.mask))
    )
    # Workload validated once (join-overflow guard); the measurement loop
    # then queues programs asynchronously (validate would force a fetch
    # per call and serialize the queue).
    sync(pipeline.run_sequence(camera, DEFAULT_CONFIG, pts, apps_a, mask)[0])
    n_frames = int(mask.shape[0])
    rounds = []
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        rs = [
            pipeline.run_sequence(
                camera, DEFAULT_CONFIG, pts, apps_a, mask, validate=False
            )[0]
            for _ in range(REPS)
        ]
        sync(rs)
        rounds.append((time.perf_counter() - t0) / REPS)
    best = min(rounds)
    out["fps"] = round(n_frames / best, 1)
    out["round_ms"] = [round(r * 1e3, 3) for r in rounds]

    # Chained protocol: CHAIN_G whole tracking programs executed
    # back-to-back inside ONE dispatched program (lax.scan with a ~1e-30
    # data dependency between iterations). Each dispatched call pays a
    # fixed ~0.9 ms host-path cost under the tunnel (measured r5:
    # a trivial jitted x+1 costs 897 us at queue depth 30 — see
    # utils/roofline.dispatch_overhead_s), which the per-call protocol
    # above cannot amortize below REPS-deep queueing; chaining in-program
    # divides it by CHAIN_G and reports the pipeline's true steady-state
    # device throughput.
    import jax.numpy as jnp

    chain_g = 8

    @jax.jit
    def chained(eps):
        def body(c, _):
            traj, _m, _o = pipeline.run_sequence(
                camera, DEFAULT_CONFIG, pts + c, apps_a, mask, validate=False
            )
            return jnp.sum(traj) * 1e-30, None

        return jax.lax.scan(body, eps, None, length=chain_g)[0]

    zero = jnp.float32(0.0)
    sync(chained(zero))
    cbest = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        rs = [chained(zero) for _ in range(10)]
        sync(rs)
        cbest = min(cbest, (time.perf_counter() - t0) / 10)
    out["fps_chained"] = round(chain_g * n_frames / cbest, 1)

    if full:
        # Guard 1: compiled-kernel correctness on THIS chip.
        from visual_odometry_tpu.utils import selfcheck

        try:
            selfcheck.run_all()
        except AssertionError as e:
            out["error"] = f"pallas selfcheck failed: {e}"
            print(json.dumps(out))
            return 1

        # Guard 2: throughput only counts at beat-the-reference accuracy.
        res = apps.run_evaluation(DATA_DIR, out_dir, verbose=False)
        finite = np.isfinite(res.orientation_errors)
        e_theta = float(np.abs(res.orientation_errors[finite]).mean())
        if not (e_theta < 5.3e-6 and res.rmse_position < 0.145):
            out["error"] = (
                f"accuracy regression: e_theta={e_theta}, "
                f"rmse={res.rmse_position}"
            )
            print(json.dumps(out))
            return 1

        # MFU / roofline accounting for the hot kernels.
        from visual_odometry_tpu.utils import roofline

        try:
            out.update(roofline.measure())
        except Exception as e:  # reporting, never a bench failure
            out["roofline_error"] = str(e)[:200]

        # Batched multi-sequence serving: the chip-filling number.
        if os.environ.get("VO_BENCH_SERVING", "1") != "0":
            try:
                from visual_odometry_tpu.parallel import multiseq
                import jax.numpy as jnp

                b = SERVING_BATCH
                rng = np.random.default_rng(b)
                bp = np.tile(np.asarray(seq.points)[None], (b, 1, 1, 1))
                bp = bp + rng.uniform(-0.5, 0.5, (b, 1, 1, 2)).astype(np.float32)
                bp = jnp.asarray(bp)
                ba = jnp.asarray(
                    np.tile(np.asarray(seq.appearances)[None], (b, 1, 1, 1))
                )
                bm = jnp.asarray(np.tile(np.asarray(seq.mask)[None], (b, 1, 1)))
                sync(multiseq.run_sequences_batched(
                    camera, DEFAULT_CONFIG, bp, ba, bm
                )[0])
                sbest = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    rs = [
                        multiseq.run_sequences_batched(
                            camera, DEFAULT_CONFIG, bp, ba, bm, validate=False
                        )[0]
                        for _ in range(5)
                    ]
                    sync(rs)
                    sbest = min(sbest, (time.perf_counter() - t0) / 5)
                floor1 = roofline.pipeline_floor_s(n_frames, 128)
                out["serving_batch"] = b
                out["serving_fps"] = round(b * n_frames / sbest, 1)
                out["serving_roofline_fraction"] = round(
                    b * floor1 / sbest, 4
                )
            except Exception as e:
                out["serving_error"] = str(e)[:200]

        # Sparse-BA production-scale roofline fields.
        if os.environ.get("VO_BENCH_SPARSE", "1") != "0":
            try:
                out.update(roofline.measure_sparse_ba())
            except Exception as e:
                out["sparse_ba_error"] = str(e)[:200]

    print(json.dumps(out))
    return 0


def main() -> int:
    here = os.path.abspath(__file__)
    results = []
    extras = {}
    error = None
    for i in range(max(N_PROCESSES, 1)):
        # Sequential subprocesses: ONE process owns the chip at a time;
        # the persistent compile cache makes non-first children start in
        # seconds. Child stdout is captured so exactly one JSON line
        # reaches the driver.
        proc = subprocess.run(
            [sys.executable, here, "--measure"] + (["--full"] if i == 0 else []),
            capture_output=True, text=True,
        )
        line = None
        for cand in reversed(proc.stdout.strip().splitlines()):
            cand = cand.strip()
            if cand.startswith("{"):
                line = cand
                break
        if line is None:
            error = f"measure child {i} produced no JSON (rc={proc.returncode}): " \
                f"{proc.stderr.strip().splitlines()[-1] if proc.stderr.strip() else ''}"[:300]
            continue
        child = json.loads(line)
        if "error" in child:
            error = child["error"]
            results.append(child)
            continue
        results.append(child)
        if i == 0:
            extras = {
                k: v for k, v in child.items()
                if k not in ("fps", "round_ms", "fps_chained")
            }

    fps_vals = sorted(c["fps"] for c in results if "fps" in c)
    if error is not None or not fps_vals:
        print(json.dumps({
            "metric": "vo_pipeline_throughput",
            "value": 0.0,
            "unit": "frames/s",
            "vs_baseline": 0.0,
            "error": error or "no measurements",
        }))
        return 1

    fps = fps_vals[-1]  # best process: noise only ever slows (docstring)
    out = {
        "metric": "vo_pipeline_throughput",
        "value": fps,
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_MEASURED_FPS, 3),
        "fps_per_process": [c.get("fps") for c in results],
        "fps_median_process": fps_vals[len(fps_vals) // 2],
        "fps_min_process": fps_vals[0],
        "process_spread": round(1.0 - fps_vals[0] / fps_vals[-1], 3),
    }
    chained_vals = [c["fps_chained"] for c in results if c.get("fps_chained")]
    if chained_vals:
        # Best process, like the per-call headline: the in-program chained
        # protocol (see _measure) amortizes the fixed per-dispatch cost.
        out["fps_chained"] = max(chained_vals)
    # Physics sanity: a capture that beats the analytic additive stage
    # floor is a broken measurement, not a fast chip.
    try:
        sys.path.insert(0, os.path.dirname(here))
        from visual_odometry_tpu.utils import roofline

        floor_fps = 121 / roofline.pipeline_floor_s(121, 128)
        out["floor_fps"] = round(floor_fps, 1)
        if fps > floor_fps:
            out["suspect"] = True
    except Exception:
        pass
    out.update(extras)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    if "--measure" in sys.argv:
        sys.exit(_measure(full="--full" in sys.argv))
    sys.exit(main())
