"""Resize ops vs PIL (antialias bicubic) and torch (align_corners bilinear)."""

import numpy as np
import torch
import torch.nn.functional as F
from PIL import Image

import e3d_tpu  # noqa: F401
from e3d_tpu.ops import resize_antialias, resize_align_corners, resize_nearest
import jax.numpy as jnp


def test_bicubic_antialias_downscale_matches_pil(rng):
    img = (rng.uniform(0, 1, size=(128, 96)) * 255).astype(np.uint8)
    pil = Image.fromarray(img).resize((48, 64), Image.BICUBIC)  # (W,H)
    expected = np.asarray(pil).astype(np.float32)
    ours = np.asarray(resize_antialias(jnp.asarray(img, jnp.float32), (64, 48)))
    # PIL quantizes to uint8; allow ~1 LSB.
    np.testing.assert_allclose(ours, expected, atol=1.0)


def test_bicubic_antialias_matches_torch_float(rng):
    """Float-tensor path (what the reference's torchvision pipeline uses)."""
    for in_hw, out_hw in [((32, 32), (96, 96)), ((64, 48), (36, 50))]:
        img = rng.uniform(0, 1, size=in_hw).astype(np.float32)
        t = torch.tensor(img)[None, None]
        expected = F.interpolate(t, size=out_hw, mode="bicubic",
                                 antialias=True)[0, 0].numpy()
        ours = np.asarray(resize_antialias(jnp.asarray(img), out_hw))
        np.testing.assert_allclose(ours, expected, atol=1e-4)


def test_bilinear_align_corners_matches_torch(rng):
    x = rng.normal(size=(2, 16, 24, 3)).astype(np.float32)
    ours = np.asarray(resize_align_corners(jnp.asarray(x), (37, 52)))
    xt = torch.tensor(x).permute(0, 3, 1, 2)
    expected = F.interpolate(xt, size=(37, 52), mode="bilinear",
                             align_corners=True).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, expected, atol=1e-5)


def test_bilinear_align_corners_upscale_2x(rng):
    x = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    ours = np.asarray(resize_align_corners(jnp.asarray(x), (16, 16)))
    xt = torch.tensor(x).permute(0, 3, 1, 2)
    expected = F.interpolate(xt, scale_factor=2, mode="bilinear",
                             align_corners=True).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, expected, atol=1e-5)


def test_nearest_matches_cv2(rng):
    import cv2
    img = rng.uniform(0, 65535, size=(30, 40)).astype(np.uint16)
    expected = cv2.resize(img, (80, 60), interpolation=cv2.INTER_NEAREST)
    ours = np.asarray(resize_nearest(jnp.asarray(img.astype(np.int32)), (60, 80)))
    np.testing.assert_array_equal(ours, expected.astype(np.int32))


def test_pallas_lerp_matches_matmul_resize():
    """The Pallas 2-tap lerp path == the dense-matmul align-corners path
    (DPT decoder shapes + a downsample), via the interpreter on CPU."""
    from e3d_tpu.ops import resize as rz

    rng = np.random.default_rng(0)
    for (h, w, c, h2, w2) in [(19, 19, 256, 37, 37),
                              (148, 148, 128, 296, 296),
                              (37, 41, 128, 20, 25)]:
        x = jnp.asarray(rng.normal(size=(2, h, w, c)).astype(np.float32))
        want = rz._apply_separable(
            x, rz._align_corners_matrix(h, h2, "bilinear"),
            rz._align_corners_matrix(w, w2, "bilinear"))
        got = rz._lerp_resize_pallas(x, (h2, w2), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)


def test_pallas_lerp_bf16_close_to_f32():
    from e3d_tpu.ops import resize as rz

    rng = np.random.default_rng(1)
    x32 = rng.normal(size=(1, 37, 37, 128)).astype(np.float32)
    got = rz._lerp_resize_pallas(jnp.asarray(x32, jnp.bfloat16), (74, 74),
                                 interpret=True)
    want = rz._lerp_resize_pallas(jnp.asarray(x32), (74, 74), interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), atol=4e-2)
