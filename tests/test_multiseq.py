import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from visual_odometry_tpu.models import pipeline
from visual_odometry_tpu.ops.camera import Camera
from visual_odometry_tpu.parallel import multiseq
from visual_odometry_tpu.parallel.mesh import make_mesh
from visual_odometry_tpu.utils import io
from visual_odometry_tpu.utils.config import VOConfig


@pytest.fixture(scope="module")
def small_batch():
    data_dir = "/root/reference/example_data/data"
    if not os.path.isdir(data_dir):
        pytest.skip("reference example dataset not available")
    params = io.load_camera_params(os.path.join(data_dir, "camera.dat"))
    camera = Camera.create(
        params.camera_matrix, rows=params.height, cols=params.width,
        z_near=params.z_near, z_far=params.z_far,
    )
    seq = io.load_sequence(data_dir, 128)
    # Two "sequences": the first 30 frames, and frames 10..40 (distinct data).
    pts = np.stack([seq.points[:30], seq.points[10:40]])
    apps = np.stack([seq.appearances[:30], seq.appearances[10:40]])
    mask = np.stack([seq.mask[:30], seq.mask[10:40]])
    return camera, pts, apps, mask


def test_batched_equals_sequential(small_batch):
    camera, pts, apps, mask = small_batch
    cfg = VOConfig(gn_iterations=20)
    traj_b, maps_b, outs_b = multiseq.run_sequences_batched(
        camera, cfg, jnp.asarray(pts), jnp.asarray(apps), jnp.asarray(mask)
    )
    for b in range(2):
        traj, _, _ = pipeline.run_sequence(
            camera, cfg, jnp.asarray(pts[b]), jnp.asarray(apps[b]), jnp.asarray(mask[b])
        )
        np.testing.assert_allclose(
            np.asarray(traj_b)[b, :, :3, 3], np.asarray(traj)[:, :3, 3], atol=5e-4
        )


def test_serving_sublane_equals_vmap(small_batch):
    """The sublane serving backend vs the vmap backend on real data.

    Interpret mode re-associates the batched lane reductions (see
    utils/selfcheck.check_frame_serving — compiled on TPU the two are
    bitwise equal), so this asserts the fused-vs-scan style tolerance
    plus exact map structure."""
    camera, pts, apps, mask = small_batch
    cfg = VOConfig(gn_iterations=20, scan_backend="fused_interpret")
    traj_s, maps_s, outs_s = multiseq.run_sequences_batched(
        camera, cfg, jnp.asarray(pts), jnp.asarray(apps), jnp.asarray(mask),
        backend="sublane", inner_batch=2, interpret=True,
    )
    traj_v, maps_v, _ = multiseq.run_sequences_batched(
        camera, cfg, jnp.asarray(pts), jnp.asarray(apps), jnp.asarray(mask),
        backend="vmap",
    )
    np.testing.assert_allclose(
        np.asarray(traj_s)[:, :, :3, 3], np.asarray(traj_v)[:, :, :3, 3],
        atol=2e-3,
    )
    for b in range(2):
        assert int(np.asarray(maps_s.valid)[b].sum()) == int(
            np.asarray(maps_v.valid)[b].sum()
        )
    assert outs_s.pose.shape[0] == 2


def test_serving_sublane_planar_equals_vmap(small_batch):
    """est_SE2 serving: the planar sublane kernel (gn_loop_se2_batched)
    vs the vmapped planar fused path on real data."""
    camera, pts, apps, mask = small_batch
    cfg = VOConfig(
        gn_iterations=20, scan_backend="fused_interpret", planar=True,
    )
    traj_s, maps_s, _ = multiseq.run_sequences_batched(
        camera, cfg, jnp.asarray(pts), jnp.asarray(apps), jnp.asarray(mask),
        backend="sublane", inner_batch=2, interpret=True,
    )
    traj_v, maps_v, _ = multiseq.run_sequences_batched(
        camera, cfg, jnp.asarray(pts), jnp.asarray(apps), jnp.asarray(mask),
        backend="vmap",
    )
    np.testing.assert_allclose(
        np.asarray(traj_s)[:, :, :3, 3], np.asarray(traj_v)[:, :, :3, 3],
        atol=2e-3,
    )
    for b in range(2):
        assert int(np.asarray(maps_s.valid)[b].sum()) == int(
            np.asarray(maps_v.valid)[b].sum()
        )


def test_serving_inner_divisor():
    assert multiseq._serving_inner(32, 8) == 8
    assert multiseq._serving_inner(12, 8) == 6
    assert multiseq._serving_inner(7, 8) == 7
    assert multiseq._serving_inner(5, 4) == 1


def test_serving_sublane_sharded_over_dp_mesh(small_batch):
    """Multi-chip serving: shard_map of the sublane path over dp vs the
    unsharded sublane path (interpret kernels on the virtual CPU mesh)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    camera, pts, apps, mask = small_batch
    cfg = VOConfig(gn_iterations=20, scan_backend="fused_interpret")
    mesh = make_mesh(2, ("dp", "lm"), dp_size=2)
    traj_m, maps_m, _ = multiseq.run_sequences_batched(
        camera, cfg, jnp.asarray(pts), jnp.asarray(apps), jnp.asarray(mask),
        backend="sublane", mesh=mesh, inner_batch=2, interpret=True,
    )
    traj_1, maps_1, _ = multiseq.run_sequences_batched(
        camera, cfg, jnp.asarray(pts), jnp.asarray(apps), jnp.asarray(mask),
        backend="sublane", inner_batch=1, interpret=True,
    )
    # One sequence per device shard vs both in one sublane group: the
    # fused-kernel math is identical per sequence; interpret-mode
    # reduction fusion differs (selfcheck.check_frame_serving).
    np.testing.assert_allclose(
        np.asarray(traj_m)[:, :, :3, 3], np.asarray(traj_1)[:, :, :3, 3],
        atol=2e-3,
    )


def test_sharded_over_dp_mesh(small_batch):
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    camera, pts, apps, mask = small_batch
    cfg = VOConfig(gn_iterations=20)
    mesh = make_mesh(2, ("dp", "lm"), dp_size=2)
    traj_b, _, _ = multiseq.run_sequences_batched(
        camera, cfg, jnp.asarray(pts), jnp.asarray(apps), jnp.asarray(mask), mesh=mesh
    )
    traj_ref, _, _ = multiseq.run_sequences_batched(
        camera, cfg, jnp.asarray(pts), jnp.asarray(apps), jnp.asarray(mask)
    )
    # Sharded and unsharded builds compile to different fusion orders;
    # f32 reduction-order drift through 20 GN rounds lands ~6e-4 on
    # positions of norm ~0.4 (0.15% relative) — identical match sets,
    # not a semantic difference.
    np.testing.assert_allclose(
        np.asarray(traj_b)[:, :, :3, 3], np.asarray(traj_ref)[:, :, :3, 3], atol=2e-3
    )
