"""sdslam_tpu: TPU-native semi-direct SLAM (JAX/XLA/Pallas).

On TPU, float32 `@`/einsum default to bf16 MXU passes (~1e-3 relative
error). Pose chains, Schur reductions, and one-hot gather matmuls need full
f32: a 4x4 pose product loses orthonormality at ~1e-4 per multiply in bf16
and the error compounds across frames. The framework therefore defaults all
f32 matmuls to full precision; the deliberately-bf16 hot kernels (Hamming
popcount, patch sampling, covisibility incidence) opt in explicitly via
`preferred_element_type`/bf16 inputs, which this default does not affect.
"""

import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")
