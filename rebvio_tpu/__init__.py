"""rebvio_tpu: a TPU-native edge-based visual-inertial odometry framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the REBVO
pipeline (reference: baumlin/rebvio).  See SURVEY.md for the blueprint.
"""

import os as _os

import jax as _jax

# The estimator's linear algebra (JtJ normal equations, SO3 compositions,
# 7-state filters) requires true float32 accumulation; TPU default matmul
# precision is bfloat16, which destroys the filters.  The heavy kernels
# opt into lower precision explicitly where safe.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the deployment environment compiles TPU
# executables through a remote service with multi-minute latency for the
# full pipeline graph; caching compiled executables across processes makes
# repeat runs (tests, bench, CLI) start in seconds.
_cache_dir = _os.environ.get(
    "REBVIO_JAX_CACHE",
    _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), ".jax_cache"),
)
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

__version__ = "0.1.0"
