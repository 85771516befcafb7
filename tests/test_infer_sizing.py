"""infer_image resize sizing: DAv2 lower-bound multiple-of-14 semantics."""

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
