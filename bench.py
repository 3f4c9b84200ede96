"""Headline benchmark: full vo_complete pipeline throughput on example_data.

Prints ONE JSON line:
  {"metric": "vo_pipeline_throughput", "value": <frames/s>, "unit":
   "frames/s", "vs_baseline": <ours / reference C++>}

Baseline: the reference implementation (lucanunz/Visual-odometry, C++17 +
Eigen3, -O3, single thread) compiled on THIS host and timed on the same
121-frame example dataset: 0.193 s end-to-end => ~627 frames/s
(build: g++ -O3 -DNDEBUG -std=c++17 with tensorflow's bundled Eigen
headers; timed 2026-08-17, best of runs). The reference publishes no
throughput numbers of its own (SURVEY.md §6), so this measured number is
the baseline of record in BASELINE_MEASURED below.

The benchmark measures steady-state device throughput of the FULL pipeline
(appearance matching + PICP + triangulation + map maintenance for every
frame, including the host fetch of the trajectory), best of 5 after one
warm-up/compile run. Accuracy is asserted against BASELINE.md targets so a
fast-but-wrong kernel can never "win".
"""

import json
import os
import sys
import time

BASELINE_MEASURED_FPS = 627.0  # reference C++ on this host, see docstring

DATA_DIR = os.environ.get("VO_BENCH_DATA", "/root/reference/example_data/data")


def main() -> int:
    import numpy as np

    import visual_odometry_tpu  # noqa: F401  (precision policy)
    from visual_odometry_tpu import apps

    out_dir = "/tmp/vo_bench_out"

    # Warm-up (compiles the whole program; cached afterwards).
    apps.run_vo_complete(DATA_DIR, out_dir, verbose=False)

    best = float("inf")
    for _ in range(5):
        _, _, _, elapsed = apps.run_vo_complete(DATA_DIR, out_dir, verbose=False)
        best = min(best, elapsed)

    n_frames = 121
    fps = n_frames / best

    # Guard: throughput only counts at reference-level accuracy.
    res = apps.run_evaluation(DATA_DIR, out_dir, verbose=False)
    finite = np.isfinite(res.orientation_errors)
    e_theta = float(np.abs(res.orientation_errors[finite]).mean())
    ok = e_theta < 1e-5 and res.rmse_position < 0.16
    if not ok:
        print(
            json.dumps(
                {
                    "metric": "vo_pipeline_throughput",
                    "value": 0.0,
                    "unit": "frames/s",
                    "vs_baseline": 0.0,
                    "error": f"accuracy regression: e_theta={e_theta}, rmse={res.rmse_position}",
                }
            )
        )
        return 1

    print(
        json.dumps(
            {
                "metric": "vo_pipeline_throughput",
                "value": round(fps, 1),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_MEASURED_FPS, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
