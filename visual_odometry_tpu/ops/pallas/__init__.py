"""Hand-written TPU kernels for the framework's hot ops.

Each kernel has a pure-JAX reference implementation in ``ops/`` that it is
validated against bit-for-bit-ish in tests (SURVEY.md §7 step 4); the JAX
path remains the fallback on non-TPU backends.
"""

from . import matcher_kernel, picp_kernel  # noqa: F401
