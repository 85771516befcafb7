"""Benchmark one attention implementation/config at the flagship shape.

Run ONE config per process (custom_vjp modules give garbage timings after
importlib.reload — CLAUDE.md). Config via env:

    ATTN_IMPL=pallas|xla|stock   (default pallas)
    ATTN_MODE=fwd|fwdbwd         (default fwd)
    E3D_FLASH_BLOCK_Q, E3D_FLASH_FWD_BUDGET_KB, E3D_FLASH_BWD_BUDGET_KB,
    E3D_FLASH_EXP_BF16           (pallas impl knobs, see ops/flash_attention)

Prints one JSON line with ms/call and achieved TFLOP/s.
"""

from __future__ import annotations

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from perf._timing import log, time_fn  # noqa: E402

B, N, H, D = 8, 1370, 16, 64


def main() -> None:
    impl = os.environ.get("ATTN_IMPL", "pallas")
    mode = os.environ.get("ATTN_MODE", "fwd")
    log(f"backend={jax.default_backend()} impl={impl} mode={mode} "
        f"BQ={os.environ.get('E3D_FLASH_BLOCK_Q')} "
        f"FWD_KB={os.environ.get('E3D_FLASH_FWD_BUDGET_KB')} "
        f"BWD_KB={os.environ.get('E3D_FLASH_BWD_BUDGET_KB')} "
        f"EXPBF16={os.environ.get('E3D_FLASH_EXP_BF16')}")

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.bfloat16)

    if impl == "pallas":
        from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.ops.flash_attention import (  # noqa: E501
            flash_attention as fn,
        )
    elif impl == "xla":
        from enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu.ops.attention import (  # noqa: E501
            mha_xla as fn,
        )
    elif impl == "stock":
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, SegmentIds, flash_attention as stock_fa,
        )
        npad = 1408
        seg = jnp.concatenate([jnp.zeros((B, N), jnp.int32),
                               jnp.ones((B, npad - N), jnp.int32)], axis=1)
        bq = int(os.environ.get("STOCK_BQ", "704"))
        bkm = int(os.environ.get("STOCK_BKM", "704"))
        bk = int(os.environ.get("STOCK_BK", "704"))
        bs = BlockSizes(
            block_q=bq, block_k_major=bkm, block_k=bk, block_b=1,
            block_q_major_dkv=bq, block_k_major_dkv=bkm,
            block_k_dkv=bk, block_q_dkv=bq,
            block_k_major_dq=bkm, block_k_dq=bk, block_q_dq=bq,
        )

        def fn(q, k, v):
            def pad(x):
                x = jnp.swapaxes(x, 1, 2)  # (B, H, N, D)
                return jnp.pad(x, ((0, 0), (0, 0), (0, npad - N), (0, 0)))
            o = stock_fa(pad(q), pad(k), pad(v),
                         segment_ids=SegmentIds(q=seg, kv=seg),
                         causal=False, sm_scale=float(1.0 / D ** 0.5),
                         block_sizes=bs)
            return jnp.swapaxes(o[:, :, :N], 1, 2)
    else:
        raise SystemExit(f"unknown ATTN_IMPL {impl}")

    if mode == "fwd":
        def step(acc, q, k, v):
            o = fn(q + (acc * 1e-9).astype(q.dtype), k, v)
            return jnp.mean(o.astype(jnp.float32))
    else:
        def loss(q, k, v):
            return jnp.mean(fn(q, k, v).astype(jnp.float32))
        grad = jax.grad(loss, argnums=(0, 1, 2))

        def step(acc, q, k, v):
            gq, gk, gv = grad(q + (acc * 1e-9).astype(q.dtype), k, v)
            return (jnp.mean(gq.astype(jnp.float32))
                    + jnp.mean(gk.astype(jnp.float32))
                    + jnp.mean(gv.astype(jnp.float32)))

    # Methodology (perf/attn_trace_analysis.md): ms-scale microbenches need
    # >=300 fori_loop iters or the ~25 ms tunnel sync dominates.
    iters = int(os.environ.get("ATTN_ITERS", "300"))
    per = time_fn(step, q, k, v, iters=iters, repeats=3, label=f"{impl}/{mode}")
    # attention matmul FLOPs (QK^T + PV; x2.5 extra for bwd's 5 matmuls)
    flops = 2 * 2 * B * H * N * N * D * (1.0 if mode == "fwd" else 3.5)
    print(json.dumps({
        "impl": impl, "mode": mode,
        "block_q": os.environ.get("E3D_FLASH_BLOCK_Q", "128"),
        "fwd_kb": os.environ.get("E3D_FLASH_FWD_BUDGET_KB", "3072"),
        "bwd_kb": os.environ.get("E3D_FLASH_BWD_BUDGET_KB", "768"),
        "exp_bf16": os.environ.get("E3D_FLASH_EXP_BF16", "0"),
        "knockouts": [k for k in os.environ
                      if k.startswith("E3D_FLASH_NO_")],
        "ms": round(per * 1000, 3),
        "tflops": round(flops / per / 1e12, 1),
    }))


if __name__ == "__main__":
    main()
