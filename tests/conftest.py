"""Test harness config: run on a virtual 8-device CPU mesh (SURVEY.md §4).

Must set the env vars BEFORE jax initializes its backends, hence at conftest
import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon harness's sitecustomize registers the real TPU and overrides
# jax_platforms at interpreter startup; re-assert CPU before any backend
# initializes so tests never touch (or block on) the single real chip.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound the live-executable population of a long suite run.

    A full suite compiles many hundreds of 8-virtual-device XLA:CPU
    programs into one process; ~30 minutes in, the NEXT large compile
    sporadically segfaults inside backend_compile_and_load (observed at
    whatever test happens to compile around the 85% mark — moving the
    suspect test to a subprocess just moved the crash to its neighbour).
    Each live executable holds thunk-runtime/thread resources; dropping
    the jit caches between modules keeps the accumulation bounded.
    Per-module, not per-test: module-scoped fixtures reuse compiled
    programs within a file, and recompiles across files are rare."""
    yield
    jax.clear_caches()


REFERENCE_DATA = "/root/reference/example_data/data"


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def reference_data_dir():
    if not os.path.isdir(REFERENCE_DATA):
        pytest.skip("reference example dataset not available")
    return REFERENCE_DATA
