"""Mixed-precision policy for TPU.

The reference trains depth with AMP '16-mixed' and pose with '32-true'
(``configs/trainer/default.yaml``, ``configs/pose_estimation/
pose_estimation.yaml``). The TPU-native equivalent:

- parameters and optimizer state in f32 (master weights);
- activations / matmuls in bf16 (MXU native), no loss scaling needed —
  bf16 has f32's exponent range;
- losses, metrics, and the metric-depth output head in f32 to avoid
  regression drift (SURVEY.md section 7 'hard parts').
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DtypePolicy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32  # loss/metrics/depth head


POLICY_BF16 = DtypePolicy()
POLICY_F32 = DtypePolicy(compute_dtype=jnp.float32)


def policy_from_precision(precision: str) -> DtypePolicy:
    """Map reference precision strings to TPU policies."""
    if precision in ("16-mixed", "bf16-mixed", "bf16"):
        return POLICY_BF16
    if precision in ("32-true", "32", "fp32"):
        return POLICY_F32
    raise ValueError(f"unknown precision: {precision}")
