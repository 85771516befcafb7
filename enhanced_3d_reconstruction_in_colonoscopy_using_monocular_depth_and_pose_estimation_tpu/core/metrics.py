"""On-device running-metric accumulators.

Replaces torchmetrics ``MeanMetric`` collections
(reference ``lightning_model.py:145-152``) with a pure pytree the train step
threads through ``jit`` — values stay on device; the host only reads them
when logging.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

import jax
import jax.numpy as jnp

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MeanAccumulator:
    """Running mean of scalars, jit-friendly."""
    total: Array
    count: Array

    @staticmethod
    def zero() -> "MeanAccumulator":
        return MeanAccumulator(jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))

    def update(self, value: Array, weight: Array | float = 1.0) -> "MeanAccumulator":
        w = jnp.asarray(weight, jnp.float32)
        return MeanAccumulator(
            self.total + jnp.asarray(value, jnp.float32) * w,
            self.count + w,
        )

    def compute(self) -> Array:
        return self.total / jnp.maximum(self.count, 1e-12)


class MetricBank:
    """Named collection of MeanAccumulators as a plain dict pytree."""

    @staticmethod
    def zeros(names: tuple[str, ...] | list[str]) -> dict[str, MeanAccumulator]:
        return {n: MeanAccumulator.zero() for n in names}

    @staticmethod
    def update(bank: Mapping[str, MeanAccumulator],
               values: Mapping[str, Array],
               weight: Array | float = 1.0) -> dict[str, MeanAccumulator]:
        return {
            n: (acc.update(values[n], weight) if n in values else acc)
            for n, acc in bank.items()
        }

    @staticmethod
    def compute(bank: Mapping[str, MeanAccumulator]) -> dict[str, Array]:
        return {n: acc.compute() for n, acc in bank.items()}
