"""infer_image resize sizing: DAv2 lower-bound multiple-of-14 semantics."""

import numpy as np
import jax.numpy as jnp

import e3d_tpu  # noqa: F401
from e3d_tpu.models.depth_anything import _lower_bound_hw


def test_square_native():
    assert _lower_bound_hw(475, 475, 518) == (518, 518)


def test_wide_frame():
    h, w = _lower_bound_hw(475, 1000, 518)
    assert h == 518  # min side hits the target
    assert w % 14 == 0
    assert w >= round(1000 * 518 / 475) - 14


def test_small_input_scales_up():
    h, w = _lower_bound_hw(100, 100, 518)
    assert h == w == 518


def test_already_large_keeps_aspect():
    h, w = _lower_bound_hw(1080, 1350, 518)
    assert min(h, w) >= 518
    assert h % 14 == 0 and w % 14 == 0
    assert abs((w / h) - (1350 / 1080)) < 0.05


def test_infer_images_batched_data_parallel_matches_single():
    """DP-sharded batched inference == single-device path (8-dev mesh)."""
    import jax

    from e3d_tpu.models import build_depth_model
    from e3d_tpu.models.depth_anything import infer_images_batched

    model = build_depth_model("vitt", max_depth=20.0, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 56, 56, 3)))["params"]
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
              for _ in range(10)]
    out_dp = infer_images_batched(model, params, frames, input_size=56,
                                  batch_size=8, data_parallel=True)
    out_sd = infer_images_batched(model, params, frames, input_size=56,
                                  batch_size=8, data_parallel=False)
    assert len(out_dp) == len(out_sd) == 10
    for a, b in zip(out_dp, out_sd):
        np.testing.assert_allclose(a, b, atol=1e-5)
