"""ToMe-style token merging (ops/token_merge.py): correctness + model
wiring. Off-by-default speed mode; no reference counterpart."""

import jax
import jax.numpy as jnp
import numpy as np

import e3d_tpu  # noqa: F401
from e3d_tpu.ops.token_merge import bipartite_merge, merge_count, unmerge


def test_ratio_zero_is_identity(rng):
    x = jnp.asarray(rng.normal(size=(2, 17, 8)).astype(np.float32))
    merged, slot = bipartite_merge(x, 0.0)
    np.testing.assert_array_equal(np.asarray(merged), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(unmerge(merged, slot)),
                                  np.asarray(x))


def test_merge_duplicates_is_lossless(rng):
    """If the merged tokens are exact duplicates of their partners, the
    merge + unmerge round trip reproduces the input exactly."""
    b, n, c = 2, 16, 8
    base = rng.normal(size=(b, 1 + n, c)).astype(np.float32)
    # Make every even patch a copy of the following odd patch: A tokens
    # exactly duplicate their best B match (cosine similarity 1).
    base[:, 1 + 0::2] = base[:, 1 + 1::2]
    x = jnp.asarray(base)
    ratio = 0.25
    r = merge_count(n, ratio)
    merged, slot = bipartite_merge(x, ratio)
    assert merged.shape == (b, 1 + n - r, c)
    np.testing.assert_allclose(np.asarray(unmerge(merged, slot)),
                               base, rtol=1e-6, atol=1e-6)


def test_slot_map_covers_all_slots(rng):
    x = jnp.asarray(rng.normal(size=(1, 1 + 36, 8)).astype(np.float32))
    merged, slot = bipartite_merge(x, 0.3)
    slot = np.asarray(slot)[0]
    n_slots = merged.shape[1]
    assert slot.min() == 0 and slot.max() == n_slots - 1
    # cls maps to itself; every merged slot is referenced at least once
    assert slot[0] == 0
    assert set(range(n_slots)) <= set(slot.tolist())
    # kept tokens are referenced exactly once; merged ones >= twice
    counts = np.bincount(slot, minlength=n_slots)
    assert (counts >= 1).all()
    # r merged originals point at shared slots (several A tokens may
    # share one B partner): total references exceed slots by exactly r.
    assert counts.sum() - n_slots == merge_count(36, 0.3)


def test_unmerged_tokens_preserved(rng):
    """Tokens that are not merged keep their exact values through the
    merge+unmerge round trip."""
    b, n, c = 1, 20, 6
    x = jnp.asarray(rng.normal(size=(b, 1 + n, c)).astype(np.float32))
    merged, slot = bipartite_merge(x, 0.2)
    full = np.asarray(unmerge(merged, slot))
    orig = np.asarray(x)
    exact = np.all(np.isclose(full, orig, atol=1e-6), axis=-1)[0]
    r = merge_count(n, 0.2)
    # cls + all B tokens + kept A tokens are exact: only r merged A
    # tokens (and their r partners) may differ.
    assert exact.sum() >= 1 + n - 2 * r


def test_model_runs_with_token_merge_and_bounded_delta(rng):
    """vitt forward with token_merge=0.25: correct output shape and a
    bounded deviation from the unmerged forward (the merged model shares
    features across similar tokens, it does not produce garbage)."""
    from e3d_tpu.models import build_depth_model

    image = jnp.asarray(rng.normal(size=(1, 56, 56, 3)).astype(np.float32))
    m0 = build_depth_model("vitt", max_depth=20.0, dtype=jnp.float32)
    m1 = build_depth_model("vitt", max_depth=20.0, dtype=jnp.float32,
                           token_merge=0.25)
    params = m0.init(jax.random.PRNGKey(0), image)["params"]
    d0 = np.asarray(m0.apply({"params": params}, image))
    d1 = np.asarray(m1.apply({"params": params}, image))  # same params!
    assert d1.shape == d0.shape
    assert np.isfinite(d1).all()
    rel = np.abs(d1 - d0).mean() / max(np.abs(d0).mean(), 1e-6)
    assert rel < 0.5, rel  # same ballpark, not identical
    assert rel > 0.0  # merging actually engaged
