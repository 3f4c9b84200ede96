import numpy as np
import jax
import jax.numpy as jnp
import pytest

from visual_odometry_tpu.parallel import matcher, mesh as mesh_mod


@pytest.fixture
def lm_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return mesh_mod.single_axis_mesh(8, "lm")


def _oracle(db, db_mask, q, q_mask, radius):
    out = []
    for i in range(len(q)):
        if not q_mask[i]:
            out.append(-1)
            continue
        d = ((db - q[i]) ** 2).sum(1)
        d[~db_mask] = np.inf
        j = int(np.argmin(d))
        out.append(j if d[j] < radius * radius else -1)
    return np.array(out, np.int32)


def test_sharded_matches_oracle(rng, lm_mesh):
    l, q_n = 512, 64
    db = rng.uniform(-1, 1, (l, 10)).astype(np.float32)
    q = db[rng.integers(0, l, q_n)].copy()
    q[:10] = rng.uniform(5, 6, (10, 10))  # unmatched far queries
    db_mask = np.ones(l, bool)
    db_mask[100:120] = False
    q_mask = np.ones(q_n, bool)
    q_mask[-5:] = False

    idx, dist = matcher.sharded_best_match(
        lm_mesh, jnp.asarray(db), jnp.asarray(db_mask), jnp.asarray(q), jnp.asarray(q_mask)
    )
    expected = _oracle(db, db_mask, q, q_mask, 0.1)
    np.testing.assert_array_equal(np.array(idx), expected)


def test_cross_shard_winner(rng, lm_mesh):
    # The best match lives in the last shard; every shard has a decoy.
    l = 64  # 8 per shard
    db = np.full((l, 10), 5.0, np.float32)
    db[7::8] = 1.0           # decoys at distance ~sqrt(10*(0.98)^2)
    db[-1] = 0.02            # true best, last shard
    q = np.zeros((1, 10), np.float32)
    idx, dist = matcher.sharded_best_match(
        lm_mesh,
        jnp.asarray(db),
        jnp.ones(l, bool),
        jnp.asarray(q),
        jnp.ones(1, bool),
        radius=100.0,
    )
    assert int(idx[0]) == l - 1


def test_tie_break_first_shard(lm_mesh):
    # Exact duplicates across shards: the smallest global index must win,
    # matching a serial scan.
    l = 64
    db = np.full((l, 10), 3.0, np.float32)
    db[5] = 0.0
    db[37] = 0.0
    q = np.zeros((1, 10), np.float32)
    idx, _ = matcher.sharded_best_match(
        lm_mesh, jnp.asarray(db), jnp.ones(l, bool), jnp.asarray(q), jnp.ones(1, bool)
    )
    assert int(idx[0]) == 5
