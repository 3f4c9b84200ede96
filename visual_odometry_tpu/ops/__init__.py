"""Geometry and association kernels (JAX/XLA; Pallas variants in ops.pallas)."""

from . import camera, epipolar, matching, picp, se3, triangulation  # noqa: F401
