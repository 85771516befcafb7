"""Debug/observability utilities."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import e3d_tpu  # noqa: F401
from e3d_tpu.core.debug import StepTimer, nan_checks, device_memory_stats
from e3d_tpu.core.metrics import MeanAccumulator, MetricBank


def test_nan_checks_raises():
    with pytest.raises(FloatingPointError):
        with nan_checks(True):
            jnp.log(jnp.asarray(-1.0)).block_until_ready()
    # restored afterwards
    assert not jax.config.jax_debug_nans
    out = jnp.log(jnp.asarray(-1.0))
    assert np.isnan(float(out))


def test_step_timer():
    timer = StepTimer(window=10)
    for _ in range(3):
        with timer.step():
            time.sleep(0.01)
    summary = timer.summary()
    assert summary["step_time_mean_s"] >= 0.01
    assert summary["steps_per_s"] <= 100.0


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert len(stats) == len(jax.devices())


def test_mean_accumulator_and_bank():
    acc = MeanAccumulator.zero()
    for v in (1.0, 2.0, 3.0):
        acc = acc.update(v)
    np.testing.assert_allclose(float(acc.compute()), 2.0)

    bank = MetricBank.zeros(["a", "b"])
    bank = MetricBank.update(bank, {"a": jnp.asarray(4.0)})
    bank = MetricBank.update(bank, {"a": jnp.asarray(2.0),
                                    "b": jnp.asarray(1.0)})
    vals = MetricBank.compute(bank)
    np.testing.assert_allclose(float(vals["a"]), 3.0)
    np.testing.assert_allclose(float(vals["b"]), 1.0)
