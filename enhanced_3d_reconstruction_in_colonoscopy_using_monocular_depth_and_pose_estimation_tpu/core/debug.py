"""Tracing, profiling and numerical-debugging utilities (SURVEY.md sec. 5).

The reference has only a commented-out CUDA memory printer
(``lightning_model_combined.py:304-313``). TPU-native equivalents:

- ``profile_trace``: ``jax.profiler`` trace context (view in
  TensorBoard/XProf);
- ``nan_checks``: ``jax_debug_nans`` toggle — the functional-JAX analog of
  a sanitizer pass (raises at the op that produced the first NaN);
- ``StepTimer``: lightweight per-step wall-clock stats for train loops;
- ``device_memory_stats``: live HBM usage per device.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a device trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def nan_checks(enable: bool = True):
    """Raise at the first NaN-producing op inside the block."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


class StepTimer:
    """Rolling per-step timing: ``with timer.step(): ...`` then
    ``timer.summary()``."""

    def __init__(self, window: int = 100):
        self.window = window
        self.times: list[float] = []

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)
        if len(self.times) > self.window:
            self.times.pop(0)

    def summary(self) -> dict[str, float]:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "step_time_mean_s": float(arr.mean()),
            "step_time_p50_s": float(np.percentile(arr, 50)),
            "step_time_p95_s": float(np.percentile(arr, 95)),
            "steps_per_s": float(1.0 / max(arr.mean(), 1e-12)),
        }


def device_memory_stats() -> dict[str, dict[str, float]]:
    """Per-device HBM usage in GiB (empty where unsupported)."""
    out = {}
    for dev in jax.devices():
        try:
            stats = dev.memory_stats()
            out[str(dev)] = {
                "bytes_in_use_gib": stats.get("bytes_in_use", 0) / 2 ** 30,
                "peak_bytes_gib": stats.get("peak_bytes_in_use", 0) / 2 ** 30,
            }
        except Exception:
            out[str(dev)] = {}
    return out


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache (opt-out: E3D_COMPILE_CACHE=0).

    Compiles through the axon TPU tunnel cost tens of seconds to minutes;
    with the cache, repeat runs of the CLIs (inference, reconstruction)
    skip them. Safe to call multiple times; silently ignored when the
    backend doesn't support serialization.
    """
    import os

    import jax

    if os.environ.get("E3D_COMPILE_CACHE", "1") == "0":
        return
    path = path or os.environ.get(
        "E3D_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "e3d_jax_cache"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax / RO filesystem
        pass
