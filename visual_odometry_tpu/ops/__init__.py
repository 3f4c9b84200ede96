"""Geometry and association kernels (JAX/XLA; Pallas variants in ops.pallas)."""

from . import (  # noqa: F401
    camera,
    epipolar,
    linalg6,
    matching,
    picp,
    se3,
    stats,
    triangulation,
)
