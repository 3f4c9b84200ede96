import numpy as np
import jax.numpy as jnp

from visual_odometry_tpu.ops import matching, stats


def test_mean_cov_matches_numpy(rng):
    pts = rng.normal(size=(40, 3)).astype(np.float32)
    mask = np.ones(40, bool)
    mask[30:] = False
    mu, cov = stats.mean_and_covariance(jnp.asarray(pts), jnp.asarray(mask))
    np.testing.assert_allclose(np.array(mu), pts[:30].mean(0), atol=1e-5)
    np.testing.assert_allclose(
        np.array(cov), np.cov(pts[:30].T, ddof=1), atol=1e-4
    )


def test_largest_eigenvector_is_principal_axis(rng):
    # Points stretched along a known direction.
    d = np.array([1.0, 2.0, -1.0], np.float32)
    d /= np.linalg.norm(d)
    pts = (rng.normal(size=(200, 1)).astype(np.float32) * d[None, :] * 5
           + rng.normal(size=(200, 3)).astype(np.float32) * 0.1)
    mu, cov = stats.mean_and_covariance(jnp.asarray(pts), jnp.ones(200, bool))
    v = np.array(stats.largest_eigenvector(cov))
    assert abs(abs(v @ d) - 1.0) < 1e-2


def test_smallest_eigenvector(rng):
    a = rng.normal(size=(5, 5)).astype(np.float32)
    m = a @ a.T + np.eye(5, dtype=np.float32)
    v = np.array(stats.smallest_eigenvector(jnp.asarray(m)))
    w, vecs = np.linalg.eigh(m)
    assert abs(abs(v @ vecs[:, 0]) - 1.0) < 1e-4


def test_radius_search_matches_bruteforce(rng):
    q = rng.uniform(-1, 1, (20, 10)).astype(np.float32)
    db = rng.uniform(-1, 1, (50, 10)).astype(np.float32)
    db[3] = q[0]       # exact duplicate
    db[7] = q[0] + 0.01
    qm = np.ones(20, bool)
    qm[-2:] = False
    dbm = np.ones(50, bool)
    dbm[3] = True
    dbm[10:12] = False
    got = np.array(
        matching.radius_search(
            jnp.asarray(q), jnp.asarray(qm), jnp.asarray(db), jnp.asarray(dbm), 0.1
        )
    )
    d2 = ((q[:, None, :] - db[None, :, :]) ** 2).sum(-1)
    expected = (d2 < 0.01) & qm[:, None] & dbm[None, :]
    np.testing.assert_array_equal(got, expected)
    assert got[0, 3] and got[0, 7]
    assert not got[:, 10:12].any() and not got[-2:].any()
