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
