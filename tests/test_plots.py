"""Visualization layer: matplotlib renditions of the gnuplot recipes."""

import os

import numpy as np
import pytest

from visual_odometry_tpu.utils import plots


@pytest.fixture
def fake_outputs(tmp_path):
    rng = np.random.default_rng(0)
    d = str(tmp_path)
    np.savetxt(os.path.join(d, "trajectory_gt.txt"), rng.normal(size=(20, 3)))
    np.savetxt(os.path.join(d, "trajectory_est_complete.txt"), rng.normal(size=(20, 3)))
    np.savetxt(os.path.join(d, "world_pruned.txt"), rng.normal(size=(30, 3)))
    np.savetxt(os.path.join(d, "map_corrected.txt"), rng.normal(size=(30, 3)))
    np.savetxt(os.path.join(d, "arrows.txt"), rng.normal(size=(30, 6)))
    perf = rng.normal(size=(19, 2))
    perf[3, 1] = np.inf  # stationary frame: ratio is inf (README.md:113)
    np.savetxt(os.path.join(d, "out_performance.txt"), perf)
    return d


def test_plot_all_renders_three_figures(fake_outputs):
    out = plots.plot_all(fake_outputs)
    assert len(out) == 3
    for p in out:
        assert os.path.exists(p) and os.path.getsize(p) > 1000


def test_plot_all_skips_missing_inputs(tmp_path):
    d = str(tmp_path)
    np.savetxt(os.path.join(d, "out_performance.txt"), np.zeros((5, 2)))
    out = plots.plot_all(d)
    assert len(out) == 1 and out[0].endswith("errors.png")


def test_time_known_written(reference_data_dir, tmp_path):
    from visual_odometry_tpu import apps
    from visual_odometry_tpu.utils.config import VOConfig

    apps.run_vo_da_known(
        reference_data_dir, str(tmp_path),
        config=VOConfig(gn_iterations=20), verbose=False,
    )
    times = np.loadtxt(tmp_path / "time_known.txt")
    assert len(times) == 120  # one DA timing per tracked frame
    assert (times > 0).all()
