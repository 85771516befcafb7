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


def test_interpolate_matches_torch_reference_chain():
    """Exact parity with the reference chain's pos-embed interpolation
    (DAv2 vendored DINOv2 ``interpolate_pos_encoding``): torch bicubic
    A=-0.75, antialias=False, interpolate_offset=0.1 scale-factor
    semantics. jax.image.resize (Keys A=-0.5 + antialias) deviates
    systematically at every non-square resolution — this pins the
    torch-parity path."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    m, dim = 37, 16
    pe = rng.normal(size=(1, 1 + m * m, dim)).astype(np.float32)

    for gh, gw in ((38, 46), (19, 27), (37, 40)):
        ours = np.asarray(interpolate_pos_embed(jnp.asarray(pe), gh, gw))

        grid = torch.from_numpy(pe[:, 1:].reshape(1, m, m, dim)
                                .transpose(0, 3, 1, 2))
        sx = float(gh + 0.1) / m
        sy = float(gw + 0.1) / m
        ref = F.interpolate(grid, mode="bicubic", antialias=False,
                            scale_factor=(sx, sy))
        assert tuple(ref.shape[-2:]) == (gh, gw)
        ref = ref.permute(0, 2, 3, 1).reshape(1, gh * gw, dim).numpy()

        np.testing.assert_array_equal(ours[:, 0], pe[:, 0])
        np.testing.assert_allclose(ours[:, 1:], ref, rtol=2e-5, atol=2e-5)


def test_model_runs_at_non_native_resolution():
    """vitt stores a 4x4 pos grid; run at 84 px (6x6 grid) and 42 px."""
    model = build_depth_model("vitt", max_depth=20.0, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 56, 56, 3)))["params"]
    for hw in (84, 42):
        y = model.apply({"params": params}, jnp.zeros((1, hw, hw, 3)))
        assert y.shape == (1, hw, hw)
        assert np.isfinite(np.asarray(y)).all()
