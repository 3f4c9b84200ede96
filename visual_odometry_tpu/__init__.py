"""visual_odometry_tpu — a TPU-native monocular visual-odometry framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
lucanunz/Visual-odometry (C++17/Eigen3, reference mounted at
/root/reference): 8-point epipolar initialization, mid-point triangulation,
projective-ICP pose tracking, appearance-based data association, landmark-map
maintenance, dataset I/O and offline evaluation — plus TPU-only surface the
reference lacks: fully-jitted scan-over-frames pipelines, Pallas kernels for
the hot ops, and sharded multi-chip matching / bundle adjustment.
"""

__version__ = "0.4.0"

import jax as _jax

# Framework precision policy: geometry estimation needs true float32
# matmuls. On TPU the MXU default routes f32 through bf16 passes
# (~8 mantissa bits), which destroys epipolar/GN numerics (pixel coords are
# O(600); bf16 rounding alone exceeds the reference's e_theta by orders of
# magnitude — measured: RMSE_pos 44.7 vs 0.14 with full precision).
# Kernels that can tolerate reduced precision opt back in locally via an
# explicit ``precision=`` argument.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the scan-over-frames pipeline is a large
# program (minutes to compile through a remote-compile tunnel) that changes
# rarely; caching makes every fresh process after the first start in
# seconds.
import os as _os  # noqa: E402

_cache_dir = _os.environ.get(
    "VO_TPU_JAX_CACHE", _os.path.expanduser("~/.cache/vo_tpu_jax")
)
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # cache is an optimization, never a requirement
    pass

from . import models, ops, parallel, utils  # noqa: F401,E402
