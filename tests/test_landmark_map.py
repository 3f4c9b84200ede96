import numpy as np
import jax.numpy as jnp

from visual_odometry_tpu.models import landmark_map
from visual_odometry_tpu.models.landmark_map import LandmarkMap


class OracleMap:
    """Literal port of PointCloudVector::update (PointCloud.h:52-66)."""

    def __init__(self):
        self.points, self.apps = [], []

    def update(self, points, apps):
        for p, a in zip(points, apps):
            for j in range(len(self.apps)):
                if np.array_equal(self.apps[j], a):
                    self.points[j] = p
                    break
            else:
                self.points.append(p)
                self.apps.append(a)


def _apply(m, pts, apps, mask):
    return landmark_map.update(
        m, jnp.asarray(pts), jnp.asarray(apps), jnp.asarray(mask)
    )


def test_merge_matches_oracle(rng):
    m = LandmarkMap.empty(256)
    oracle = OracleMap()
    apps_pool = rng.uniform(-1, 1, (60, 10)).astype(np.float32)
    for _ in range(5):
        n = 32
        pick = rng.integers(0, 60, n)
        # unique appearances within one batch (like one frame's landmarks)
        pick = np.unique(pick)[:n]
        pts = rng.normal(size=(len(pick), 3)).astype(np.float32)
        apps = apps_pool[pick]
        mask = np.ones(len(pick), bool)
        m = _apply(m, pts, apps, mask)
        oracle.update(pts, apps)
    got_pts, got_apps = landmark_map.compact(m)
    assert len(got_pts) == len(oracle.points)
    np.testing.assert_allclose(got_pts, np.array(oracle.points))
    np.testing.assert_array_equal(got_apps, np.array(oracle.apps))


def test_replacement_updates_position():
    m = LandmarkMap.empty(16)
    apps = np.arange(30, dtype=np.float32).reshape(3, 10)
    pts = np.zeros((3, 3), np.float32)
    m = _apply(m, pts, apps, np.ones(3, bool))
    pts2 = np.ones((3, 3), np.float32)
    m = _apply(m, pts2, apps, np.ones(3, bool))
    got_pts, _ = landmark_map.compact(m)
    assert len(got_pts) == 3
    np.testing.assert_allclose(got_pts, 1.0)


def test_masked_entries_ignored():
    m = LandmarkMap.empty(16)
    apps = np.arange(30, dtype=np.float32).reshape(3, 10)
    pts = np.zeros((3, 3), np.float32)
    mask = np.array([True, False, True])
    m = _apply(m, pts, apps, mask)
    assert int(m.count) == 2


def test_capacity_overflow_drops():
    m = LandmarkMap.empty(4)
    apps = np.arange(80, dtype=np.float32).reshape(8, 10)
    pts = np.zeros((8, 3), np.float32)
    m = _apply(m, pts, apps, np.ones(8, bool))
    assert int(m.count) == 4
    got_pts, got_apps = landmark_map.compact(m)
    np.testing.assert_array_equal(got_apps, apps[:4])


def test_transform():
    m = LandmarkMap.empty(8)
    apps = np.arange(20, dtype=np.float32).reshape(2, 10)
    pts = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
    m = _apply(m, pts, apps, np.ones(2, bool))
    pose = jnp.eye(4).at[:3, 3].set(jnp.array([1.0, 2.0, 3.0]))
    m2 = landmark_map.transform(m, pose)
    got, _ = landmark_map.compact(m2)
    np.testing.assert_allclose(got, pts + np.array([1, 2, 3], np.float32))


def test_merge_stream_equals_iterated_update(rng):
    """One batched sort-merge == folding update() frame by frame."""
    import jax.numpy as jnp
    from visual_odometry_tpu.models import landmark_map as lm

    pool_apps = rng.uniform(-1, 1, (60, 10)).astype(np.float32)
    frames = []
    for _ in range(8):
        ids = rng.choice(60, size=20, replace=False)  # unique keys per frame
        pts = rng.normal(size=(20, 3)).astype(np.float32)
        mask = rng.random(20) > 0.2
        frames.append((pts, pool_apps[ids], mask))

    cap = 48
    seq_map = lm.LandmarkMap.empty(cap, 10)
    for pts, apps, mask in frames:
        seq_map = lm.update(seq_map, jnp.asarray(pts), jnp.asarray(apps), jnp.asarray(mask))

    stream_pts = jnp.asarray(np.concatenate([f[0] for f in frames]))
    stream_apps = jnp.asarray(np.concatenate([f[1] for f in frames]))
    stream_mask = jnp.asarray(np.concatenate([f[2] for f in frames]))
    batch_map = lm.merge_stream(stream_pts, stream_apps, stream_mask, cap)

    assert int(batch_map.count) == int(seq_map.count)
    np.testing.assert_array_equal(np.asarray(batch_map.valid), np.asarray(seq_map.valid))
    v = np.asarray(seq_map.valid)
    np.testing.assert_array_equal(
        np.asarray(batch_map.appearances)[v], np.asarray(seq_map.appearances)[v]
    )
    np.testing.assert_allclose(
        np.asarray(batch_map.points)[v], np.asarray(seq_map.points)[v], atol=0
    )


def test_merge_stream_capacity_truncation(rng):
    import jax.numpy as jnp
    from visual_odometry_tpu.models import landmark_map as lm

    apps = rng.uniform(-1, 1, (30, 10)).astype(np.float32)
    pts = rng.normal(size=(30, 3)).astype(np.float32)
    mask = jnp.ones(30, bool)
    m = lm.merge_stream(jnp.asarray(pts), jnp.asarray(apps), mask, capacity=10)
    assert int(m.count) == 10
    # first 10 unique keys survive, in stream order
    np.testing.assert_array_equal(np.asarray(m.appearances)[:10], apps[:10])


def test_merge_stream_intra_frame_duplicate_keeps_last(rng):
    """Reference semantics: a re-observed key REPLACES the position
    (PointCloud.h:56-59) even within one batch — one entry, last position."""
    import jax.numpy as jnp
    from visual_odometry_tpu.models import landmark_map as lm

    app = rng.uniform(-1, 1, (1, 10)).astype(np.float32)
    apps = jnp.asarray(np.repeat(app, 3, axis=0))
    pts = jnp.asarray(np.float32([[1, 0, 0], [2, 0, 0], [3, 0, 0]]))
    m = lm.merge_stream(pts, apps, jnp.ones(3, bool), capacity=8)
    assert int(m.count) == 1
    np.testing.assert_allclose(np.asarray(m.points)[0], [3, 0, 0])


def test_merge_stream_negative_zero_keys():
    import jax.numpy as jnp
    from visual_odometry_tpu.models import landmark_map as lm

    a = np.zeros((2, 10), np.float32)
    a[0, 0] = 0.0
    a[1, 0] = -0.0  # float-equal, bit-different: must merge
    pts = jnp.asarray(np.float32([[1, 1, 1], [2, 2, 2]]))
    m = lm.merge_stream(pts, jnp.asarray(a), jnp.ones(2, bool), capacity=4)
    assert int(m.count) == 1
    np.testing.assert_allclose(np.asarray(m.points)[0], [2, 2, 2])
