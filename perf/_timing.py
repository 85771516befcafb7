"""Timing helpers for TPU-over-axon benchmarking.

The axon tunnel's ``block_until_ready`` does not reliably await remote
execution, and host readbacks of large arrays are ~20 s. So every
measurement here runs a device-side ``lax.fori_loop`` whose iterations are
data-dependently chained (no DCE/dedup possible) and reads back ONE scalar,
which forces completion (see bench.py, CLAUDE.md).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def time_fn(fn, *args, iters: int = 20, repeats: int = 3,
            label: str = "fn") -> float:
    """fn(*args) -> scalar-reducible pytree. Returns best seconds/iter.

    ``fn`` must accept a small float perturbation added to its first arg so
    iterations chain; we handle that here: fn is called as fn(acc, *args)
    and must return a f32 scalar.
    """

    def many(*a):
        def body(_, acc):
            return fn(acc, *a)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    many_j = jax.jit(many)
    t0 = time.time()
    float(many_j(*args))
    log(f"[{label}] compile+first: {time.time() - t0:.1f}s")
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        float(many_j(*args))
        best = min(best, time.time() - t0)
    per = best / iters
    log(f"[{label}] {per * 1000:.3f} ms/iter (best of {repeats}x{iters})")
    return per
