"""Probe MXU throughput vs contraction size K for the flash-attention QK
matmul shape: (704, K) @ (K, 1408) bf16 -> f32, 128-way batched (= BH x
q-blocks at the flagship attention shape).

Discriminates the pipeline-fill theory of the d=64 slowdown: if rate rises
~linearly in K toward the half/full-rate ceiling, QK at d=64 is
hardware-floor; if XLA hits full rate at K=64 where Pallas doesn't, the
kernel's tiling is at fault.

MM_MODE=xla|pallas  MM_K=64,128,256,512
"""

from __future__ import annotations

import functools
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from perf._timing import time_fn  # noqa: E402

B, M, N = 128, 704, 1408


BB = int(os.environ.get("MM_BB", "1"))
LOOP = os.environ.get("MM_LOOP", "0") == "1"


def _pallas_mm(a, b):
    """Batched (B, M, K) @ (B, K, N), BB batch elements per program,
    either unrolled (default) or via an in-kernel fori_loop (MM_LOOP=1)."""
    bsz, m, k = a.shape
    n = b.shape[2]

    def kern(a_ref, b_ref, o_ref):
        if LOOP:
            def body(i, acc):
                o_ref[i] = jnp.dot(a_ref[i], b_ref[i],
                                   preferred_element_type=jnp.float32
                                   ).astype(o_ref.dtype)
                return acc
            jax.lax.fori_loop(0, BB, body, 0)
        else:
            for i in range(BB):
                o_ref[i] = jnp.dot(a_ref[i], b_ref[i],
                                   preferred_element_type=jnp.float32
                                   ).astype(o_ref.dtype)

    return pl.pallas_call(
        kern,
        grid=(bsz // BB,),
        in_specs=[
            pl.BlockSpec((BB, m, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, k, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BB, m, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, m, n), jnp.bfloat16),
    )(a, b)


def main() -> None:
    mode = os.environ.get("MM_MODE", "xla")
    ks = [int(v) for v in os.environ.get("MM_K", "64,128,256").split(",")]
    rng = np.random.default_rng(0)
    results = {}
    for k in ks:
        a = jnp.asarray(rng.normal(size=(B, M, k)), jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(B, k, N)), jnp.bfloat16)

        if mode == "xla":
            def run(acc, a, b):
                ai = a + acc.astype(jnp.bfloat16) * 1e-9
                y = jnp.einsum("bmk,bkn->bmn", ai, b,
                               preferred_element_type=jnp.float32)
                return jnp.mean(y) * 1e-6
        else:
            def run(acc, a, b):
                ai = a + acc.astype(jnp.bfloat16) * 1e-9
                y = _pallas_mm(ai, b)
                return jnp.mean(y.astype(jnp.float32)) * 1e-6

        sec = time_fn(run, a, b, iters=30, label=f"{mode}_k{k}")
        fl = 2 * B * M * N * k
        results[f"{mode}_k{k}"] = {"ms": round(sec * 1e3, 3),
                                   "tflops": round(fl / sec / 1e12, 1)}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
