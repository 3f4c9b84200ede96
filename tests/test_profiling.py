import numpy as np

from visual_odometry_tpu.utils.profiling import StageTimer, trace


def test_stage_timer_accumulates(tmp_path):
    t = StageTimer()
    for _ in range(3):
        with t.stage("work"):
            sum(range(1000))
    with t.stage("other"):
        pass
    s = t.summary()
    assert s["work"]["count"] == 3
    assert s["other"]["count"] == 1
    assert s["work"]["total_s"] >= 0.0
    assert "work" in t.report()

    out = tmp_path / "time_known.txt"
    t.dump(str(out), "work")
    vals = np.loadtxt(out)
    assert vals.shape == (3,)


def test_trace_noop_safe(tmp_path):
    # Must never raise even if the backend can't trace.
    with trace(str(tmp_path / "prof")):
        sum(range(10))
