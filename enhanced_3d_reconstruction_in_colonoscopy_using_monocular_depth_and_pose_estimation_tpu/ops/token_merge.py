"""ToMe-style token merging for the ViT encoder (opt-in speed mode).

One-shot bipartite soft matching (Bolya et al., "Token Merging: Your ViT
But Faster", ICLR 2023 — public method): after the first DPT tap, merge
the ``ratio`` most-similar patch tokens into their nearest partners and
run the remaining encoder blocks on the shorter sequence. A per-sample
slot map lets later taps reconstruct the FULL token grid (merged
positions share one computed feature), so the DPT decoder is unchanged —
this is the dense-prediction variant (merge + tracked unmerge), not the
classification-only original.

No reference counterpart (``/root/reference`` always runs the full 1369
tokens); this is an off-by-default speed/accuracy dial. All shapes are
static (merge count fixed by ``ratio``), so the whole thing jits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def merge_count(n_patches: int, ratio: float) -> int:
    """Number of merged tokens for a patch count (capped below half of
    the A partition so the bipartite match stays well-defined)."""
    na = (n_patches + 1) // 2
    return max(0, min(int(n_patches * ratio), na - 1))


def bipartite_merge(tokens: Array, ratio: float
                    ) -> tuple[Array, Array]:
    """Merge the ``ratio`` most similar patch tokens (cls protected).

    tokens: (B, 1+n, C) with cls at index 0. Returns
    ``(merged (B, 1+n-r, C), slot_map (B, 1+n) int32)`` where
    ``take_along_axis(merged, slot_map)`` reconstructs a full-length
    sequence (merged originals point at their shared slot).

    Alternating split: A = patches at even positions, B = odd. Each A
    token's best cosine match in B is its merge candidate; the r
    highest-similarity A tokens are averaged into their partners, the
    rest are kept. Static output length = 1 + n - r.
    """
    b, n1, c = tokens.shape
    n = n1 - 1
    r = merge_count(n, ratio)
    if r == 0:
        return tokens, jnp.broadcast_to(jnp.arange(n1, dtype=jnp.int32),
                                        (b, n1))
    patches = tokens[:, 1:]
    a = patches[:, 0::2]                                   # (B, na, C)
    bb = patches[:, 1::2]                                  # (B, nb, C)
    na, nb = a.shape[1], bb.shape[1]

    f32 = jnp.float32
    an = a.astype(f32)
    an = an / jnp.maximum(jnp.linalg.norm(an, axis=-1, keepdims=True), 1e-6)
    bn = bb.astype(f32)
    bn = bn / jnp.maximum(jnp.linalg.norm(bn, axis=-1, keepdims=True), 1e-6)
    scores = jnp.einsum("bac,bdc->bad", an, bn)            # (B, na, nb)
    partner = jnp.argmax(scores, axis=-1).astype(jnp.int32)  # (B, na)
    best = jnp.max(scores, axis=-1)                        # (B, na)

    order = jnp.argsort(-best, axis=-1).astype(jnp.int32)  # (B, na)
    rank = jnp.argsort(order, axis=-1).astype(jnp.int32)   # rank of each A
    merged_mask = rank < r                                 # (B, na)

    # Scatter merged A tokens onto their partners (mean of 1 + count).
    def one(bb_i, a_i, partner_i, mask_i):
        wsum = jnp.zeros((nb,), f32).at[partner_i].add(
            mask_i.astype(f32))
        fsum = jnp.zeros((nb, c), f32).at[partner_i].add(
            a_i.astype(f32) * mask_i[:, None])
        return ((bb_i.astype(f32) + fsum)
                / (1.0 + wsum)[:, None]).astype(bb_i.dtype)

    bb_new = jax.vmap(one)(bb, a, partner, merged_mask)

    # Kept A tokens, ordered by rank (ranks r..na-1).
    a_sorted = jnp.take_along_axis(a, order[:, :, None], axis=1)
    a_kept = a_sorted[:, r:]                               # (B, na-r, C)

    merged = jnp.concatenate([tokens[:, :1], bb_new, a_kept], axis=1)

    # Slot map over ORIGINAL positions: cls -> 0; B token j -> 1 + j;
    # A token i -> partner slot if merged else its kept slot.
    slot_a = jnp.where(merged_mask, 1 + partner,
                       1 + nb + (rank - r)).astype(jnp.int32)
    slot_b = jnp.broadcast_to(1 + jnp.arange(nb, dtype=jnp.int32), (b, nb))
    slot_patches = jnp.zeros((b, n), jnp.int32)
    slot_patches = slot_patches.at[:, 0::2].set(slot_a)
    slot_patches = slot_patches.at[:, 1::2].set(slot_b)
    slot_map = jnp.concatenate(
        [jnp.zeros((b, 1), jnp.int32), slot_patches], axis=1)
    return merged, slot_map


def unmerge(tokens: Array, slot_map: Array) -> Array:
    """(B, 1+n-r, C) + (B, 1+n) -> (B, 1+n, C) full-length sequence."""
    return jnp.take_along_axis(
        tokens, slot_map[:, :, None].astype(jnp.int32), axis=1)
