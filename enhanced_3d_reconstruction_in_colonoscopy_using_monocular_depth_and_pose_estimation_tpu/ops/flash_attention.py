"""Pallas TPU fused attention for the ViT encoder (forward + backward).

The encoder's attention at 518 px is 1370 tokens x 64 head-dim — the score
matrix for one (batch, head) is ~1408x1408 f32 = 7.9 MB in HBM per head if
materialized. This kernel keeps K/V and the score block in VMEM and never
writes probabilities to HBM:

- forward: per (batch*head, q-block) program; full K/V for that head sit in
  VMEM (1408 x 64 bf16 = 176 KB each), the q-block's score matrix
  (128 x 1408 f32 = 720 KB) lives in registers/VMEM, softmax is computed in
  f32, output is p @ v. The log-sum-exp is written out for the backward.
- backward: two kernels — dq per q-block, dk/dv per k-block — recompute the
  probabilities from the saved LSE (standard flash-attention backward).

Sequence padding to a multiple of 128 is handled in the wrapper; padded keys
are masked with -inf, padded queries contribute zero gradient.

A ``jax.custom_vjp`` ties it together; ``ops.attention`` dispatches here on
TPU and to plain XLA elsewhere. Set ``interpret=True`` (or run the test
suite, which does) to execute the same kernels on CPU via the Pallas
interpreter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

BLOCK_Q = 128
NEG_INF = -1e30


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


# ------------------------------ forward -------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
                n_valid: int):
    # Keep inputs in their storage dtype (bf16 on the hot path): the MXU
    # runs bf16 x bf16 -> f32 at full rate; upcasting first would quarter it.
    q = q_ref[0]                                           # (BQ, D)
    k = k_ref[0]                                           # (Np, D)
    v = v_ref[0]                                           # (Np, D)

    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # (BQ, Np)
    n_padded = s.shape[1]
    if n_valid < n_padded:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, NEG_INF)

    m = jnp.max(s, axis=1, keepdims=True)                  # (BQ, 1)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v,
                preferred_element_type=jnp.float32) / l
    o_ref[0] = o.astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)  # (BQ, 1)


def _fwd(q3: Array, k3: Array, v3: Array, scale: float, n_valid: int,
         interpret: bool) -> tuple[Array, Array]:
    """q3/k3/v3: (BH, Np, D) padded. Returns (out (BH, Np, D), lse (BH, Np))."""
    bh, np_, d = q3.shape
    grid = (bh, np_ // BLOCK_Q)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, n_valid=n_valid),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK_Q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, np_, d), q3.dtype),
            jax.ShapeDtypeStruct((bh, np_, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q3, k3, v3)
    return out, lse


# ------------------------------ backward ------------------------------------


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   *, scale: float, n_valid: int):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]                                          # (BQ, D)
    lse = lse_ref[0]                                        # (BQ, 1)
    delta = delta_ref[0]                                    # (BQ, 1)

    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    n_padded = s.shape[1]
    if n_valid < n_padded:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, NEG_INF)
    p = jnp.exp(s - lse)                                    # (BQ, Np)
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    dq = jnp.dot(ds.astype(k.dtype), k,
                 preferred_element_type=jnp.float32) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, scale: float, n_valid: int):
    q = q_ref[0]                                            # (Np, D)
    k = k_ref[0]                                            # (BK, D)
    v = v_ref[0]
    do = do_ref[0]                                          # (Np, D)
    lse = lse_ref[0][:, 0][None, :]                         # (1, Np)
    delta = delta_ref[0][:, 0][None, :]                     # (1, Np)

    st = jnp.dot(k, q.T, preferred_element_type=jnp.float32) * scale  # (BK, Np)
    nq = st.shape[1]
    # Padded queries: lse is garbage there; mask explicitly.
    if n_valid < nq:
        col = jax.lax.broadcasted_iota(jnp.int32, st.shape, 1)
        pt = jnp.where(col < n_valid, jnp.exp(st - lse), 0.0)
    else:
        pt = jnp.exp(st - lse)
    dv = jnp.dot(pt.astype(do.dtype), do,
                 preferred_element_type=jnp.float32)
    dpt = jnp.dot(v, do.T, preferred_element_type=jnp.float32)  # (BK, Np)
    dst = pt * (dpt - delta)
    dk = jnp.dot(dst.astype(q.dtype), q,
                 preferred_element_type=jnp.float32) * scale
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd(scale: float, n_valid: int, interpret: bool, residuals, g):
    q3, k3, v3, out, lse = residuals
    bh, np_, d = q3.shape
    do = g.astype(jnp.float32)
    delta = jnp.sum(do * out.astype(jnp.float32), axis=-1,
                    keepdims=True)                          # (BH, Np, 1)

    full = pl.BlockSpec((1, np_, d), lambda b, i: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((1, BLOCK_Q, d), lambda b, i: (b, i, 0),
                       memory_space=pltpu.VMEM)
    vec_full = pl.BlockSpec((1, np_, 1), lambda b, i: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    vec_blk = pl.BlockSpec((1, BLOCK_Q, 1), lambda b, i: (b, i, 0),
                           memory_space=pltpu.VMEM)
    grid = (bh, np_ // BLOCK_Q)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, n_valid=n_valid),
        grid=grid,
        in_specs=[blk, full, full, blk, vec_blk, vec_blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((bh, np_, d), q3.dtype),
        interpret=interpret,
    )(q3, k3, v3, do.astype(q3.dtype), lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, n_valid=n_valid),
        grid=grid,
        in_specs=[full, blk, blk, full, vec_full, vec_full],
        out_specs=[blk, blk],
        out_shape=[
            jax.ShapeDtypeStruct((bh, np_, d), k3.dtype),
            jax.ShapeDtypeStruct((bh, np_, d), v3.dtype),
        ],
        interpret=interpret,
    )(q3, k3, v3, do.astype(q3.dtype), lse, delta)

    return dq, dk, dv


# ------------------------------ public API ----------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_core(q3, k3, v3, scale, n_valid, interpret):
    out, _ = _fwd(q3, k3, v3, scale, n_valid, interpret)
    return out


def _flash_core_fwd(q3, k3, v3, scale, n_valid, interpret):
    out, lse = _fwd(q3, k3, v3, scale, n_valid, interpret)
    return out, (q3, k3, v3, out, lse)


_flash_core.defvjp(_flash_core_fwd, _bwd)


def flash_attention(q: Array, k: Array, v: Array,
                    interpret: bool | None = None) -> Array:
    """Fused attention over (B, N, H, D); returns (B, N, H, D).

    Numerically matches ``ops.attention.mha_xla`` (f32 softmax).
    """
    b, n, h, d = q.shape
    if interpret is None:
        interpret = _use_interpret()
    scale = float(1.0 / (d ** 0.5))
    n_pad = -(-n // BLOCK_Q) * BLOCK_Q

    def to3(x):
        x = jnp.swapaxes(x, 1, 2).reshape(b * h, n, d)
        if n_pad != n:
            x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
        return x

    out = _flash_core(to3(q), to3(k), to3(v), scale, n, interpret)
    out = out[:, :n].reshape(b, h, n, d)
    return jnp.swapaxes(out, 1, 2)
