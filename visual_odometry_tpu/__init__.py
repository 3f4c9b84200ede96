"""visual_odometry_tpu — a TPU-native monocular visual-odometry framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
lucanunz/Visual-odometry (C++17/Eigen3, reference mounted at
/root/reference): 8-point epipolar initialization, mid-point triangulation,
projective-ICP pose tracking, appearance-based data association, landmark-map
maintenance, dataset I/O and offline evaluation — plus TPU-only surface the
reference lacks: fully-jitted scan-over-frames pipelines, Pallas kernels for
the hot ops, and sharded multi-chip matching / bundle adjustment.
"""

__version__ = "0.1.0"

from . import models, ops, parallel, utils  # noqa: F401
