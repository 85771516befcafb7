"""Positional-embedding interpolation: non-native input sizes run and
interpolation matches direct bicubic resize of the grid."""

import jax
import jax.numpy as jnp
import numpy as np

import e3d_tpu  # noqa: F401
from e3d_tpu.models import build_depth_model
from e3d_tpu.models.dinov2 import interpolate_pos_embed


def test_interpolate_identity():
    pe = jnp.asarray(np.random.default_rng(0)
                     .normal(size=(1, 1 + 37 * 37, 8)).astype(np.float32))
    out = interpolate_pos_embed(pe, 37, 37)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(pe))


def test_interpolate_changes_grid():
    pe = jnp.asarray(np.random.default_rng(0)
                     .normal(size=(1, 1 + 4 * 4, 8)).astype(np.float32))
    out = interpolate_pos_embed(pe, 6, 5)
    assert out.shape == (1, 1 + 30, 8)
    # cls slot untouched
    np.testing.assert_array_equal(np.asarray(out[:, 0]), np.asarray(pe[:, 0]))


def test_model_runs_at_non_native_resolution():
    """vitt stores a 4x4 pos grid; run at 84 px (6x6 grid) and 42 px."""
    model = build_depth_model("vitt", max_depth=20.0, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 56, 56, 3)))["params"]
    for hw in (84, 42):
        y = model.apply({"params": params}, jnp.zeros((1, hw, hw, 3)))
        assert y.shape == (1, hw, hw)
        assert np.isfinite(np.asarray(y)).all()
