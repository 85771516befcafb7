"""Pallas TPU fused attention for the ViT encoder (forward + backward).

The encoder's attention at 518 px is 1370 tokens x 64 head-dim. Design
points for v5e:

- K/V for a *block of heads* stay resident in VMEM while all query blocks
  stream past them (the K/V BlockSpec index is constant across the inner
  grid dimension, so Pallas keeps the buffer), and each program computes
  several heads - per-program overhead was the dominant cost with a
  one-(head, q-block)-per-program layout (1408 tiny programs).
- The MXU runs bf16 x bf16 -> f32; softmax statistics are f32.
- The log-sum-exp is saved as (BH, Np, 1) (TPU block-shape friendly) for
  the backward, which recomputes probabilities per block. Default is a
  FUSED single-kernel backward (one pass per k-block produces dk/dv and
  accumulates dq across the key-block grid dim into a revisited output:
  5 score-sized matmuls + 1 prob recompute); E3D_FLASH_BWD_FUSED=0
  restores the split dq-kernel + dkv-kernel layout (7 matmuls + 2).
- Sequence padding to a multiple of 128 happens in the wrapper; padded
  keys are masked to -inf, padded queries contribute zero gradient.

A ``jax.custom_vjp`` ties it together; ``ops.attention`` dispatches here on
TPU and to plain XLA elsewhere. The test suite runs the same kernels on CPU
via the Pallas interpreter.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Tuning knobs (env-overridable for perf sweeps; defaults are the values
# measured fastest on v5e at the flagship (8, 1370, 16, 64) shape — see
# perf/attn_*.jsonl). BLOCK_Q is the max query-block sublane size (multiple
# of 16 for bf16); budgets feed ``_head_block``.
# BQ=688 pads the flagship 1370-token sequence to 1376 instead of 704's
# 1408 and is faster STANDALONE (fwd 2.13 -> 2.07 ms, fwd+bwd 5.04 -> 4.93,
# perf/attn_bq688*.log) but SLOWER in-model (full fwd 107.0 -> 107.5 ms):
# 1376 is not a lane multiple of 128, so the fused projection einsums that
# produce the padded (B,H,D,Np)/(B,H,Np,D) operands pick worse layouts.
BLOCK_Q = int(os.environ.get("E3D_FLASH_BLOCK_Q", "704"))
FWD_BUDGET = int(os.environ.get("E3D_FLASH_FWD_BUDGET_KB", "768")) * 1024
BWD_BUDGET = int(os.environ.get("E3D_FLASH_BWD_BUDGET_KB", "768")) * 1024
# exp/softmax-weights in bf16 (f32 statistics kept): halves VPU exp cost.
EXP_BF16 = os.environ.get("E3D_FLASH_EXP_BF16", "0") == "1"
# KT feeds K pre-transposed (D, Np) so the score matmul is a plain
# (BQ, D) @ (D, Np) with no in-kernel transpose (measured ~6% faster);
# DOTGEN instead contracts the last dims without materializing k.T.
_KT = os.environ.get("E3D_FLASH_KT", "1") == "1"
_DOTGEN = os.environ.get("E3D_FLASH_DOTGEN", "0") == "1"
# Scores in bf16 (halves VMEM score traffic; costs ~1e-3 relative
# precision on the softmax weights).
_S_BF16 = os.environ.get("E3D_FLASH_S_BF16", "0") == "1"
# Mark grid dims parallel so Mosaic can pipeline programs.
_DIMSEM = os.environ.get("E3D_FLASH_DIMSEM", "0") == "1"
# Split the PV matmul's K-reduction into N independent partial dots.
_PV_SPLIT = int(os.environ.get("E3D_FLASH_PV_SPLIT", "1"))
# Head pairing: concat 2 heads on the feature axis and make K/V block
# diagonal, so the score matmul contracts over 128 (full MXU depth) and
# yields both heads' scores side by side. 2x padded FLOPs on an array
# that idles half its depth at d=64 — net win iff d=64 runs below half
# rate. Forward only.
_PAIR = os.environ.get("E3D_FLASH_PAIR", "0") == "1"
# Scoped-VMEM ceiling in MB (0 = compiler default of 16 MB; the chip has
# far more physical VMEM, and a higher ceiling lets Mosaic keep more
# buffers resident / pipeline deeper).
_VMEM_MB = int(os.environ.get("E3D_FLASH_VMEM_MB", "0"))
# Software-pipeline the unrolled heads: issue head h+1's score matmul
# before head h's softmax+PV, exposing an independent MXU chain to the
# Mosaic scheduler during the VPU softmax. Standalone 2.099 vs 2.13 ms at
# the flagship shape with the default hb=2 (perf/attn_pipe.log) but
# NEUTRAL in-model (full fwd 103.50 vs 103.42 ms); larger head-blocks
# blow scoped VMEM (hb=4: 21.5 MB) or compile pathologically. Sweep knob,
# default off.
_PIPE = os.environ.get("E3D_FLASH_PIPE", "0") == "1"
# In-kernel fori_loop over the per-program heads instead of a Python
# unroll: one score buffer is reused across heads, so FWD_BUDGET can admit
# more heads per program without a VMEM blowout. Measured NO faster than
# the unrolled hb=2 at the flagship shape (2.16 vs 2.13 ms) — kept as a
# sweep knob.
_HLOOP = os.environ.get("E3D_FLASH_HLOOP", "0") == "1"
# Scoped-VMEM ceiling for the BACKWARD kernels. The dkv kernel's Mosaic
# stack allocation sits right at the 16 MB default (17.12 MB with the
# kt-layout residuals at batch 6 x 16 heads), so give the backward a
# little headroom; v5e has far more physical VMEM than the 16 MB default
# scoped limit.
_BWD_VMEM_MB = int(os.environ.get("E3D_FLASH_BWD_VMEM_MB", "24"))
# Fused single-kernel backward: one pass over key blocks computes dk/dv
# AND accumulates dq across grid steps (revisited output), recomputing
# the probabilities once instead of once per kernel. 5 score-sized
# matmuls + 1 exp instead of the split kernels' 7 matmuls + 2 exps.
# Measured at the flagship shape (8x1370x16x64, 300-iter methodology):
# fwd+bwd 4.252 -> 3.688 ms (-13%); train step 1097 -> 1077 ms
# (perf/bwd_fused.log). Same math (f32 accumulation), so default ON.
_BWD_FUSED = os.environ.get("E3D_FLASH_BWD_FUSED", "1") == "1"
_BWD_FUSED_BUDGET = int(
    os.environ.get("E3D_FLASH_BWD_FUSED_BUDGET_KB", "768")) * 1024
# dq contribution as an explicit in-kernel transpose (dst.T @ k) instead
# of a first-dim dot_general contraction — sweep knob.
_BWD_FUSED_TR = os.environ.get("E3D_FLASH_BWD_FUSED_TR", "0") == "1"
# Perf-attribution knock-outs (WRONG NUMERICS — sweep diagnostics only).
_NO_EXP = os.environ.get("E3D_FLASH_NO_EXP", "0") == "1"
_NO_MASK = os.environ.get("E3D_FLASH_NO_MASK", "0") == "1"
_NO_SCALE = os.environ.get("E3D_FLASH_NO_SCALE", "0") == "1"
_NO_MAXSUB = os.environ.get("E3D_FLASH_NO_MAXSUB", "0") == "1"
# The pipelined forward (_fwd_scores/_fwd_finish) implements only the
# default numerics; refuse knob combinations it would silently ignore.
if _PIPE:
    assert not (_S_BF16 or EXP_BF16 or _PV_SPLIT > 1 or _NO_EXP or _NO_MASK
                or _NO_SCALE or _NO_MAXSUB), \
        "E3D_FLASH_PIPE=1 is incompatible with the numerics/diagnostic knobs"
NEG_INF = -1e30


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _block_q(n: int) -> int:
    """Query-block size for a sequence of n valid tokens: the tuned
    BLOCK_Q, shrunk for short sequences so padding stays bounded."""
    return min(BLOCK_Q, -(-n // 16) * 16)


def _head_block(n_heads: int, np_: int, d: int, itemsize: int,
                budget: int = 3 * 1024 * 1024) -> int:
    """Heads per program: keep resident K/V (+ double buffering + the f32
    score scratch) comfortably inside the ~16 MB VMEM budget. The backward
    kernels carry several (BLOCK_Q, Np) f32 intermediates per unrolled
    head, so they use a much smaller budget."""
    per_head = 2 * np_ * d * itemsize  # K+V
    hb = max(1, int(budget // max(per_head, 1)))
    hb = min(hb, n_heads)
    while n_heads % hb:
        hb -= 1
    return hb


def _mask_cols(s: Array, n_valid: int) -> Array:
    if n_valid < s.shape[-1]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, s.ndim - 1)
        return jnp.where(col < n_valid, s, NEG_INF)
    return s


# ------------------------------ forward -------------------------------------


def _fwd_pair_kernel(q_ref, kt_ref, v_ref, o_ref, lse_ref, *, scale: float,
                     n_valid: int, np_: int):
    """Paired-head forward: q (2BQ? no — (BQ, 2D)), kt (2D, 2Np) block-diag,
    v (2Np, 2D) block-diag. Scores land as [s_h0 | s_h1]."""
    q2 = q_ref[...]                                      # (BQ, 2D)
    s2 = jnp.dot(q2, kt_ref[...],
                 preferred_element_type=jnp.float32) * scale  # (BQ, 2Np)
    ps = []
    ls = []
    for h in range(2):
        s = s2[:, h * np_:(h + 1) * np_]
        s = _mask_cols(s, n_valid)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        ps.append(p.astype(o_ref.dtype))
        ls.append(l)
        lse_ref[h] = m + jnp.log(l)
    p2 = jnp.concatenate(ps, axis=1)                     # (BQ, 2Np)
    o2 = jnp.dot(p2, v_ref[...],
                 preferred_element_type=jnp.float32)     # (BQ, 2D)
    d = o2.shape[1] // 2
    o_ref[0] = (o2[:, :d] / ls[0]).astype(o_ref.dtype)
    o_ref[1] = (o2[:, d:] / ls[1]).astype(o_ref.dtype)


def _fwd_pair(q3, k3, v3, scale: float, n_valid: int, interpret: bool):
    """Paired-head forward dispatch: (BH, Np, D) with even BH, D=64."""
    bh, np_, d = q3.shape
    bq = _block_q(n_valid)
    # q pairs: (BH/2, Np, 2D); block-diagonal kt (BH/2, 2D, 2Np) and
    # v (BH/2, 2Np, 2D), built XLA-side.
    q2 = jnp.concatenate([q3[0::2], q3[1::2]], axis=2)
    kt = jnp.swapaxes(k3, 1, 2)
    z_k = jnp.zeros((bh // 2, d, np_), k3.dtype)
    kt2 = jnp.concatenate([
        jnp.concatenate([kt[0::2], z_k], axis=2),
        jnp.concatenate([z_k, kt[1::2]], axis=2)], axis=1)
    z_v = jnp.zeros((bh // 2, np_, d), v3.dtype)
    v2 = jnp.concatenate([
        jnp.concatenate([v3[0::2], z_v], axis=2),
        jnp.concatenate([z_v, v3[1::2]], axis=2)], axis=1)

    grid = (bh // 2, np_ // bq)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_pair_kernel, scale=scale, n_valid=n_valid,
                          np_=np_),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, bq, 2 * d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 2 * d, 2 * np_), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 2 * np_, 2 * d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((2, bq, d),
                         lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, bq, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, np_, d), q3.dtype),
            jax.ShapeDtypeStruct((bh, np_, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q2, kt2, v2)
    # Pair b holds heads (2b, 2b+1); the output block (2, bq, d) at index
    # (b, i) covers exactly those rows — already in order.
    return out, lse


def _fwd_scores(q_ref, k_ref, h, *, scale: float, n_valid: int):
    """Score stage of one head: (BQ, Np) f32, scaled and masked."""
    q = q_ref[h]
    k = k_ref[h]
    if _KT:
        s = jnp.dot(q, k, preferred_element_type=jnp.float32)
    elif _DOTGEN:
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    else:
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    return _mask_cols(s * scale, n_valid)


def _fwd_finish(v_ref, o_ref, lse_ref, h, s):
    """Softmax + PV stage of one head, consuming the score block."""
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jnp.dot(p.astype(v_ref.dtype), v_ref[h],
                preferred_element_type=jnp.float32) / l
    o_ref[h] = o.astype(o_ref.dtype)
    lse_ref[h] = m + jnp.log(l)


def _fwd_kernel_pipe(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
                     n_valid: int, hb: int):
    """Software-pipelined head unroll: head h+1's score matmul (MXU) is
    issued before head h's softmax (VPU) + PV, giving the scheduler an
    independent MXU chain to overlap with the VPU work. Two score blocks
    are live at a time."""
    s = _fwd_scores(q_ref, k_ref, 0, scale=scale, n_valid=n_valid)
    for h in range(hb):
        s_next = (_fwd_scores(q_ref, k_ref, h + 1, scale=scale,
                              n_valid=n_valid) if h + 1 < hb else None)
        _fwd_finish(v_ref, o_ref, lse_ref, h, s)
        s = s_next


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
                n_valid: int, hb: int):
    if _PIPE:
        _fwd_kernel_pipe(q_ref, k_ref, v_ref, o_ref, lse_ref, scale=scale,
                         n_valid=n_valid, hb=hb)
        return
    if _HLOOP:
        def body(h, carry):
            _fwd_one_head(q_ref, k_ref, v_ref, o_ref, lse_ref, h,
                          scale=scale, n_valid=n_valid)
            return carry
        jax.lax.fori_loop(0, hb, body, 0)
        return
    for h in range(hb):
        _fwd_one_head(q_ref, k_ref, v_ref, o_ref, lse_ref, h,
                      scale=scale, n_valid=n_valid)


def _fwd_one_head(q_ref, k_ref, v_ref, o_ref, lse_ref, h, *, scale: float,
                  n_valid: int):
    q = q_ref[h]                                        # (BQ, D)
    k = k_ref[h]                                        # (Np, D) or (D, Np)
    v = v_ref[h]
    if _KT:
        s = jnp.dot(q, k, preferred_element_type=jnp.float32)
    elif _DOTGEN:
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    if _S_BF16:
        # bf16 score buffer (MXU still accumulates f32): halves the
        # VMEM traffic of the softmax passes.
        s = s.astype(jnp.bfloat16)
    if not _NO_SCALE:
        s = s * scale
    if not _NO_MASK:
        s = _mask_cols(s, n_valid)
    if _NO_MAXSUB:
        m = jnp.zeros((s.shape[0], 1), jnp.float32)
    else:
        m = jnp.max(s, axis=1, keepdims=True)
    if _NO_EXP:
        p = s - m
        l = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
    elif EXP_BF16:
        # exp on bf16: the softmax weights feed a bf16 matmul anyway;
        # row statistics (m, l) stay f32.
        p = jnp.exp((s - m).astype(jnp.bfloat16))
        l = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
    else:
        p = jnp.exp(s - m)
        l = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
    pb = p.astype(v.dtype)
    if _PV_SPLIT > 1:
        nk = v.shape[0] // _PV_SPLIT
        o = sum(jnp.dot(pb[:, c * nk:(c + 1) * nk],
                        v[c * nk:(c + 1) * nk],
                        preferred_element_type=jnp.float32)
                for c in range(_PV_SPLIT))
    else:
        o = jnp.dot(pb, v, preferred_element_type=jnp.float32)
    o = o / l
    o_ref[h] = o.astype(o_ref.dtype)
    lse_ref[h] = m.astype(jnp.float32) + jnp.log(l)


def _fwd(q3: Array, k3: Array, v3: Array, scale: float, n_valid: int,
         interpret: bool, k_is_t: bool = False) -> tuple[Array, Array]:
    """q3/v3: (BH, Np, D) padded; k3: (BH, Np, D), or (BH, D, Np) when
    ``k_is_t`` (already transposed by the caller, e.g. fused into the K
    projection einsum's output layout). Returns (out, lse (BH, Np, 1))."""
    bh, np_, d = q3.shape
    if _PAIR and bh % 2 == 0:
        if k_is_t:
            k3 = jnp.swapaxes(k3, 1, 2)
        return _fwd_pair(q3, k3, v3, scale, n_valid, interpret)
    hb = _head_block(bh, np_, d, q3.dtype.itemsize, budget=FWD_BUDGET)
    bq = _block_q(n_valid)
    grid = (bh // hb, np_ // bq)
    blk = pl.BlockSpec((hb, bq, d), lambda b, i: (b, i, 0),
                       memory_space=pltpu.VMEM)
    full = pl.BlockSpec((hb, np_, d), lambda b, i: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    vec_blk = pl.BlockSpec((hb, bq, 1), lambda b, i: (b, i, 0),
                           memory_space=pltpu.VMEM)
    kt_spec = pl.BlockSpec((hb, d, np_), lambda b, i: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    if _KT:
        k_in = k3 if k_is_t else jnp.swapaxes(k3, 1, 2)
        k_spec = kt_spec
    else:
        k_in = jnp.swapaxes(k3, 1, 2) if k_is_t else k3
        k_spec = full
    extra = {}
    if not interpret:
        cp = {}
        if _DIMSEM:
            cp["dimension_semantics"] = ("parallel", "parallel")
        if _VMEM_MB:
            cp["vmem_limit_bytes"] = _VMEM_MB * 2 ** 20
        if cp:
            extra["compiler_params"] = pltpu.CompilerParams(**cp)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, n_valid=n_valid, hb=hb),
        grid=grid,
        in_specs=[blk, k_spec, full],
        out_specs=[blk, vec_blk],
        out_shape=[
            jax.ShapeDtypeStruct((bh, np_, d), q3.dtype),
            jax.ShapeDtypeStruct((bh, np_, 1), jnp.float32),
        ],
        interpret=interpret,
        **extra,
    )(q3, k_in, v3)
    return out, lse


# ------------------------------ backward ------------------------------------


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   *, scale: float, n_valid: int, hb: int):
    # NOTE: a pre-transposed-K/V variant (like the forward's _KT) was
    # measured SLOWER here (5.42 vs 5.01 ms fwd+bwd): the extra
    # dot_general last-dim contractions cost more than the in-kernel
    # transposes they remove.
    for h in range(hb):
        q = q_ref[h]
        k = k_ref[h]
        v = v_ref[h]
        do = do_ref[h]
        lse = lse_ref[h]                                    # (BQ, 1)
        delta = delta_ref[h]                                # (BQ, 1)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        s = _mask_cols(s, n_valid)
        p = jnp.exp(s - lse)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dq = jnp.dot(ds.astype(k.dtype), k,
                     preferred_element_type=jnp.float32) * scale
        dq_ref[h] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, scale: float, n_valid: int, hb: int,
                    np_: int):
    # Absolute key-row offset of this block (grid dim 1 walks key blocks).
    k0 = pl.program_id(1) * k_ref.shape[1]
    for h in range(hb):
        q = q_ref[h]                                        # (Np, D)
        k = k_ref[h]                                        # (BK, D)
        v = v_ref[h]
        do = do_ref[h]                                      # (Np, D)
        lse = lse_ref[h][:, 0][None, :]                     # (1, Np)
        delta = delta_ref[h][:, 0][None, :]
        st = jnp.dot(k, q.T, preferred_element_type=jnp.float32) * scale
        nq = st.shape[1]
        if n_valid < nq:  # padded queries: lse is garbage there
            col = jax.lax.broadcasted_iota(jnp.int32, st.shape, 1)
            pt = jnp.where(col < n_valid, jnp.exp(st - lse), 0.0)
        else:
            pt = jnp.exp(st - lse)
        if n_valid < np_:
            # Padded KEY rows: the forward masked their scores to -inf
            # (zero probability), so their dk/dv must be exactly zero.
            # Without this, grads leak into the caller's padded k/v —
            # harmless for the slicing wrapper, WRONG for the fused path
            # whose qkv bias is broadcast over padded rows.
            row = jax.lax.broadcasted_iota(jnp.int32, st.shape, 0) + k0
            pt = jnp.where(row < n_valid, pt, 0.0)
        dv = jnp.dot(pt.astype(do.dtype), do,
                     preferred_element_type=jnp.float32)
        dpt = jnp.dot(v, do.T, preferred_element_type=jnp.float32)
        dst = pt * (dpt - delta)
        dk = jnp.dot(dst.astype(q.dtype), q,
                     preferred_element_type=jnp.float32) * scale
        dk_ref[h] = dk.astype(dk_ref.dtype)
        dv_ref[h] = dv.astype(dv_ref.dtype)


def _bwd_fused_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                      dk_ref, dv_ref, dq_ref, *, scale: float, n_valid: int,
                      hb: int, np_: int):
    """One pass per (head-block, key-block): dk/dv for this key block plus
    this key block's dq contribution, accumulated into the revisited dq
    output across the key-block grid dimension. Recomputes the
    probabilities once (the split dq/dkv kernels each recompute them):
    5 score-sized matmuls + 1 exp per block vs the split layout's 7 + 2.
    """
    i = pl.program_id(1)
    k0 = i * k_ref.shape[1]
    for h in range(hb):
        q = q_ref[h]                                        # (Nq, D)
        k = k_ref[h]                                        # (BK, D)
        v = v_ref[h]
        do = do_ref[h]                                      # (Nq, D)
        lse = lse_ref[h][:, 0][None, :]                     # (1, Nq)
        delta = delta_ref[h][:, 0][None, :]
        st = jnp.dot(k, q.T, preferred_element_type=jnp.float32) * scale
        nq = st.shape[1]
        if n_valid < nq:  # padded queries: lse is garbage there
            col = jax.lax.broadcasted_iota(jnp.int32, st.shape, 1)
            pt = jnp.where(col < n_valid, jnp.exp(st - lse), 0.0)
        else:
            pt = jnp.exp(st - lse)
        if n_valid < np_:
            # Padded KEY rows contribute zero grad (see _bwd_dkv_kernel).
            row = jax.lax.broadcasted_iota(jnp.int32, st.shape, 0) + k0
            pt = jnp.where(row < n_valid, pt, 0.0)
        dv = jnp.dot(pt.astype(do.dtype), do,
                     preferred_element_type=jnp.float32)
        dpt = jnp.dot(v, do.T, preferred_element_type=jnp.float32)
        dst = pt * (dpt - delta)
        dk = jnp.dot(dst.astype(q.dtype), q,
                     preferred_element_type=jnp.float32) * scale
        dk_ref[h] = dk.astype(dk_ref.dtype)
        dv_ref[h] = dv.astype(dv_ref.dtype)
        # dq contribution: ds^T @ k contracted over this key block. The
        # masked pt zeroes padded-query columns, so padded dq rows are
        # exactly zero (the split dq kernel leaves them garbage).
        if _BWD_FUSED_TR:
            dqc = jnp.dot(dst.T.astype(k.dtype), k,
                          preferred_element_type=jnp.float32) * scale
        else:
            dqc = jax.lax.dot_general(
                dst.astype(k.dtype), k, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (Nq, D)

        @pl.when(i == 0)
        def _init():
            dq_ref[h] = dqc

        @pl.when(i != 0)
        def _accum():
            dq_ref[h] = dq_ref[h] + dqc


def _bwd_fused(scale: float, n_valid: int, interpret: bool, residuals, g):
    q3, k3, v3, out, lse = residuals
    bh, np_, d = q3.shape
    hb = _head_block(bh, np_, d, q3.dtype.itemsize,
                     budget=_BWD_FUSED_BUDGET)
    do = g.astype(q3.dtype)
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True)                 # (BH, Np, 1)

    bq = _block_q(n_valid)
    blk = pl.BlockSpec((hb, bq, d), lambda b, i: (b, i, 0),
                       memory_space=pltpu.VMEM)
    full = pl.BlockSpec((hb, np_, d), lambda b, i: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    vec_full = pl.BlockSpec((hb, np_, 1), lambda b, i: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    grid = (bh // hb, np_ // bq)
    extra = {}
    if not interpret and _BWD_VMEM_MB:
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_BWD_VMEM_MB * 2 ** 20)

    dk, dv, dq = pl.pallas_call(
        functools.partial(_bwd_fused_kernel, scale=scale, n_valid=n_valid,
                          hb=hb, np_=np_),
        grid=grid,
        in_specs=[full, blk, blk, full, vec_full, vec_full],
        # dq's index map ignores the key-block dim, so the buffer is
        # revisited (accumulated in VMEM) across it and written back once.
        out_specs=[blk, blk, full],
        out_shape=[
            jax.ShapeDtypeStruct((bh, np_, d), k3.dtype),
            jax.ShapeDtypeStruct((bh, np_, d), v3.dtype),
            jax.ShapeDtypeStruct((bh, np_, d), jnp.float32),
        ],
        interpret=interpret,
        **extra,
    )(q3, k3, v3, do, lse, delta)
    return dq.astype(q3.dtype), dk, dv


def _bwd(scale: float, n_valid: int, interpret: bool, residuals, g):
    if _BWD_FUSED:
        return _bwd_fused(scale, n_valid, interpret, residuals, g)
    q3, k3, v3, out, lse = residuals
    bh, np_, d = q3.shape
    hb = _head_block(bh, np_, d, q3.dtype.itemsize, budget=BWD_BUDGET)
    do = g.astype(q3.dtype)
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True)                 # (BH, Np, 1)

    bq = _block_q(n_valid)
    blk = pl.BlockSpec((hb, bq, d), lambda b, i: (b, i, 0),
                       memory_space=pltpu.VMEM)
    full = pl.BlockSpec((hb, np_, d), lambda b, i: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    vec_blk = pl.BlockSpec((hb, bq, 1), lambda b, i: (b, i, 0),
                           memory_space=pltpu.VMEM)
    vec_full = pl.BlockSpec((hb, np_, 1), lambda b, i: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    grid = (bh // hb, np_ // bq)
    extra = {}
    if not interpret and _BWD_VMEM_MB:
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_BWD_VMEM_MB * 2 ** 20)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, n_valid=n_valid,
                          hb=hb),
        grid=grid,
        in_specs=[blk, full, full, blk, vec_blk, vec_blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((bh, np_, d), q3.dtype),
        interpret=interpret,
        **extra,
    )(q3, k3, v3, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, n_valid=n_valid,
                          hb=hb, np_=np_),
        grid=grid,
        in_specs=[full, blk, blk, full, vec_full, vec_full],
        out_specs=[blk, blk],
        out_shape=[
            jax.ShapeDtypeStruct((bh, np_, d), k3.dtype),
            jax.ShapeDtypeStruct((bh, np_, d), v3.dtype),
        ],
        interpret=interpret,
        **extra,
    )(q3, k3, v3, do, lse, delta)

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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_core_kt(q3, kt3, v3, scale, n_valid, interpret):
    out, _ = _fwd(q3, kt3, v3, scale, n_valid, interpret, k_is_t=True)
    return out


def _flash_core_kt_fwd(q3, kt3, v3, scale, n_valid, interpret):
    out, lse = _fwd(q3, kt3, v3, scale, n_valid, interpret, k_is_t=True)
    return out, (q3, kt3, v3, out, lse)


def _flash_core_kt_bwd(scale, n_valid, interpret, residuals, g):
    q3, kt3, v3, out, lse = residuals
    k3 = jnp.swapaxes(kt3, 1, 2)
    dq, dk, dv = _bwd(scale, n_valid, interpret, (q3, k3, v3, out, lse), g)
    return dq, jnp.swapaxes(dk, 1, 2), dv


_flash_core_kt.defvjp(_flash_core_kt_fwd, _flash_core_kt_bwd)


def padded_len(n: int) -> int:
    """Sequence length the kernel runs at for n valid tokens."""
    bq = _block_q(n)
    return -(-n // bq) * bq


def flash_attention_fused(q4: Array, kt4: Array, v4: Array, n_valid: int,
                          interpret: bool | None = None) -> Array:
    """Fused-layout attention: q4/v4 (B, H, Np, D), kt4 (B, H, D, Np),
    all already padded to Np = padded_len(n_valid).

    The caller produces these layouts directly from the QKV projection
    einsums (the transposes ride the matmul epilogues), so no standalone
    XLA transpose/pad copies happen between the projection and the kernel
    — the wrapper-side layout traffic of ``flash_attention`` (~5 tensor
    copies per layer) disappears. Returns (B, H, Np, D); rows >= n_valid
    are garbage and must be sliced off by the caller.
    """
    b, h, np_, d = q4.shape
    if interpret is None:
        interpret = _use_interpret()
    scale = float(1.0 / (d ** 0.5))
    out = _flash_core_kt(q4.reshape(b * h, np_, d),
                         kt4.reshape(b * h, d, np_),
                         v4.reshape(b * h, np_, d),
                         scale, n_valid, interpret)
    return out.reshape(b, h, np_, d)


def flash_attention(q: Array, k: Array, v: Array,
                    interpret: bool | None = None) -> Array:
    """Fused attention over (B, N, H, D); returns (B, N, H, D).

    Numerically matches ``ops.attention.mha_xla`` (f32 softmax).
    """
    b, n, h, d = q.shape
    if interpret is None:
        interpret = _use_interpret()
    scale = float(1.0 / (d ** 0.5))
    bq = _block_q(n)
    n_pad = -(-n // bq) * bq

    def to3(x):
        x = jnp.swapaxes(x, 1, 2).reshape(b * h, n, d)
        if n_pad != n:
            x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
        return x

    out = _flash_core(to3(q), to3(k), to3(v), scale, n, interpret)
    out = out[:, :n].reshape(b, h, n, d)
    return jnp.swapaxes(out, 1, 2)
