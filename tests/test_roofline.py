"""Roofline cost models (utils/roofline): pure-math sanity, no device."""

import numpy as np

from visual_odometry_tpu.utils import roofline


def test_models_scale_linearly():
    m1 = roofline.matcher_model(1024, 1 << 16)
    m2 = roofline.matcher_model(1024, 1 << 17)
    assert m2.mxu_flops == 2 * m1.mxu_flops
    p1 = roofline.picp_model(512, 50)
    p2 = roofline.picp_model(1024, 50)
    assert p2.vpu_ops == 2 * p1.vpu_ops
    f1 = roofline.frame_model(128, 1024, 2, 10)
    f2 = roofline.frame_model(256, 1024, 2, 10)
    assert f2.vpu_ops == 2 * f1.vpu_ops
    assert f2.hbm_bytes == 2 * f1.hbm_bytes


def test_speed_of_light_and_report_fields():
    chip = roofline.V5E
    m = roofline.matcher_model(1024, 131072)
    sol = m.speed_of_light_s(chip)
    assert sol > 0
    # The map-scale matcher is MXU-bound on v5e, not bandwidth-bound.
    assert m.mxu_flops / chip.mxu_f32_flops > m.hbm_bytes / chip.hbm_bw
    rep = m.report(sol * 2, chip)  # pretend we run at half of light
    assert abs(rep["matcher_roofline_fraction"] - 0.5) < 1e-6
    assert 0 < rep["matcher_mfu"] <= 1.0
    for k in ("matcher_time_us", "matcher_gbps", "matcher_mxu_gflops",
              "matcher_vpu_gops"):
        assert k in rep and np.isfinite(rep[k])


def test_gn_model_is_vpu_bound():
    chip = roofline.V5E
    p = roofline.picp_model(1024, 100)
    assert p.vpu_ops / chip.vpu_ops > p.hbm_bytes / chip.hbm_bw
    assert p.mxu_flops == 0.0


def test_chained_timing_helpers():
    """dispatch_overhead_s and the chained amortizer run on any backend and
    the chain really executes its steps (the eps carry threads through)."""
    import jax.numpy as jnp

    t_call = roofline.dispatch_overhead_s(reps=3, rounds=1)
    assert 0.0 < t_call < 10.0

    calls = []

    def step(eps):
        calls.append(1)  # trace-time only: the scan traces the body once
        return jnp.ones((8, 128), jnp.float32) * (1.0 + eps)

    t = roofline._steady_state_chained_s(step, g=4, reps=2, rounds=1)
    assert 0.0 < t < 10.0
    assert len(calls) == 1  # one trace, g executions inside one program
