"""Measurement-grade synchronization.

Under the tunneled-TPU harness, ``jax.block_until_ready`` can return
before (or possibly without) the queued executions actually completing —
measured: a 1024-query x 2^20-landmark map query "timed" at 0.074 ms per
call with block_until_ready alone versus 15.5 ms with a real host fetch,
an 8.4 ms MXU physics floor making the former impossible. An actual value
fetch cannot lie: the bytes must exist. Every benchmark in this repo
times with :func:`sync`, and throughput claims derived from
block_until_ready-only timings are treated as invalid.
"""

from __future__ import annotations

import jax
import numpy as np


def sync(tree):
    """Force REAL completion of ``tree``'s computation: fetch one scalar
    of its last leaf to the host. Device launches execute in order *per
    device*, so for sharded outputs one scalar is fetched from EVERY
    addressable shard — a single-leaf-slice fetch would synchronize only
    one device and under-report multi-device wall time. The fetched
    payload is 4 bytes per device regardless of output size (the scalar
    slice runs on device)."""
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        leaf = leaves[-1]
        shards = getattr(leaf, "addressable_shards", None)
        if shards is not None and len(shards) > 1:
            for sh in shards:
                data = sh.data
                if getattr(data, "size", 1):
                    np.asarray(data.reshape(-1)[0])
        else:
            if getattr(leaf, "ndim", 0):
                leaf = leaf.reshape(-1)[0]
            np.asarray(leaf)
    return tree
