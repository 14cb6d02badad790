"""rebvio_tpu: a TPU-native edge-based visual-inertial odometry framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the REBVO
pipeline (reference: baumlin/rebvio).  See SURVEY.md for the blueprint.
"""

import jax as _jax

# The estimator's linear algebra (JtJ normal equations, SO3 compositions,
# 7-state filters) requires true float32 accumulation; TPU default matmul
# precision is bfloat16, which destroys the filters.  The heavy kernels
# opt into lower precision explicitly where safe.
_jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"
