"""visual_odometry_tpu — a TPU-native monocular visual-odometry framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
lucanunz/Visual-odometry (C++17/Eigen3, reference mounted at
/root/reference): 8-point epipolar initialization, mid-point triangulation,
projective-ICP pose tracking, appearance-based data association, landmark-map
maintenance, dataset I/O and offline evaluation — plus TPU-only surface the
reference lacks: fully-jitted scan-over-frames pipelines, Pallas kernels for
the hot ops, and sharded multi-chip matching / bundle adjustment.
"""

__version__ = "0.5.0"

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
#
# TPU-backed processes ONLY. XLA:CPU executable (de)serialization is not
# reliable across (or even within) hosts: the serialized AOT result bakes
# in the feature set of jaxlib's build-time codegen target, the upstream
# cache key does not include the runtime host's features, and loading an
# entry whose features the host lacks SIGSEGVs inside cache
# deserialization (observed three times across long pytest runs, with
# "+prefer-no-gather is not supported on the host machine" AOT-loader
# warnings preceding the faults; same-host-written entries crashed too).
# Forced-CPU runs (tests, the multichip dryrun — JAX_PLATFORMS=cpu)
# therefore skip the persistent cache entirely; the directory is further
# suffixed with a host key so a host change never reuses incompatible
# entries. Set VO_TPU_JAX_CACHE to force a directory regardless.
import hashlib as _hashlib  # noqa: E402
import os as _os  # noqa: E402
import platform as _platform  # noqa: E402

_cache_dir = _os.environ.get("VO_TPU_JAX_CACHE")
_forced_cpu = _os.environ.get("JAX_PLATFORMS", "").strip().lower().startswith(
    "cpu"
)
if _cache_dir is None and not _forced_cpu:
    try:
        with open("/proc/cpuinfo") as _f:
            _flags = next((l for l in _f if l.startswith("flags")), "")
    except OSError:
        _flags = ""
    _host_key = _hashlib.sha256(
        (_jax.__version__ + _platform.machine() + _flags).encode()
    ).hexdigest()[:10]
    _cache_dir = _os.path.expanduser(f"~/.cache/vo_tpu_jax-{_host_key}")
if _cache_dir is not None:
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization, never a requirement
        pass

from . import models, ops, parallel, utils  # noqa: F401,E402
