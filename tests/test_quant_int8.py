"""Dynamic-int8 (W8A8) inference mode (ops/quant.py): kernel-level
correctness + model wiring. Off-by-default speed mode; no reference
counterpart (the reference runs fp16 CUDA)."""

import jax
import jax.numpy as jnp
import numpy as np

import e3d_tpu  # noqa: F401
from e3d_tpu.ops.quant import int8_dense, quantize_cols, quantize_rows


def test_quantize_rows_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    q, s = quantize_rows(x)
    assert q.dtype == jnp.int8 and s.shape == (4, 1)
    back = np.asarray(q, np.float32) * np.asarray(s)
    # symmetric per-row quant: error bounded by half a step
    step = np.asarray(s)
    assert (np.abs(back - np.asarray(x)) <= 0.5 * step + 1e-7).all()
    # extremes hit +/-127 exactly
    rows = np.asarray(x)
    assert (np.abs(np.asarray(q)).max(axis=1) == 127).all()
    assert np.allclose(np.abs(rows).max(axis=1) / 127.0,
                       np.asarray(s)[:, 0], rtol=1e-6)


def test_quantize_cols_per_channel(rng):
    w = np.asarray(rng.normal(size=(32, 8)).astype(np.float32))
    w[:, 3] *= 100.0  # one hot column must not poison the others
    q, s = quantize_cols(jnp.asarray(w))
    assert s.shape == (8,)
    back = np.asarray(q, np.float32) * np.asarray(s)
    assert (np.abs(back - w) <= 0.5 * np.asarray(s) + 1e-7).all()


def test_int8_dense_close_to_float(rng):
    x = jnp.asarray(rng.normal(size=(6, 128)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(128, 32)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(32,)).astype(np.float32))
    ref = np.asarray(x @ w + b)
    out = np.asarray(int8_dense(x, w, b, out_dtype=jnp.float32))
    rel = np.abs(out - ref).mean() / np.abs(ref).mean()
    assert rel < 0.02, rel


def test_int8_conv_close_to_float(rng):
    from e3d_tpu.ops.quant import int8_conv

    x = jnp.asarray(rng.normal(size=(2, 12, 12, 128)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(3, 3, 128, 128)) * 0.05)
                    .astype(np.float32))
    b = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    out = int8_conv(x, w, b, (1, 1), ((1, 1), (1, 1)),
                    out_dtype=jnp.float32)
    rel = np.abs(np.asarray(out) - np.asarray(ref)).mean() / \
        np.abs(np.asarray(ref)).mean()
    assert rel < 0.03, rel


def test_qconv_matches_nn_conv_unquantized(rng):
    """QConv (models/dpt.py) without quant is numerically identical to
    nn.Conv with the same params (checkpoints drop in)."""
    import flax.linen as nn

    from e3d_tpu.models.dpt import QConv

    x = jnp.asarray(rng.normal(size=(1, 8, 8, 16)).astype(np.float32))
    q = QConv(24, (3, 3), dtype=jnp.float32)
    ref = nn.Conv(24, (3, 3), padding=1, dtype=jnp.float32,
                  param_dtype=jnp.float32)
    params = q.init(jax.random.PRNGKey(0), x)["params"]
    out_q = q.apply({"params": params}, x)
    out_r = ref.apply({"params": params}, x)  # same {kernel, bias} tree
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_r),
                               rtol=1e-6, atol=1e-6)


def test_model_quant_bounded_delta(rng):
    """vitt forward with quant_int8: same shape, bounded deviation from
    the float forward with the SAME params (checkpoints drop in)."""
    from e3d_tpu.models import build_depth_model

    image = jnp.asarray(rng.normal(size=(2, 56, 56, 3)).astype(np.float32))
    m0 = build_depth_model("vitt", max_depth=20.0, dtype=jnp.float32)
    mq = build_depth_model("vitt", max_depth=20.0, dtype=jnp.float32,
                           quant_int8=True)
    params = m0.init(jax.random.PRNGKey(0), image)["params"]
    d0 = np.asarray(m0.apply({"params": params}, image))
    dq = np.asarray(mq.apply({"params": params}, image))
    assert dq.shape == d0.shape and np.isfinite(dq).all()
    rel = np.abs(dq - d0).mean() / max(np.abs(d0).mean(), 1e-6)
    assert 0.0 < rel < 0.1, rel


def test_quant_fused_path_matches_xla_branch(rng):
    """The fused-layout projection path (the graph executed on TPU,
    ops/attention.py qkv_self_attention quant=True, Pallas kernel in
    interpret mode) agrees with the XLA branch under quantization."""
    from e3d_tpu.models import build_depth_model
    from e3d_tpu.ops import attention as attn_ops

    image = jnp.asarray(rng.normal(size=(1, 56, 56, 3)).astype(np.float32))
    mq = build_depth_model("vitt", max_depth=20.0, dtype=jnp.float32,
                           quant_int8=True)
    params = mq.init(jax.random.PRNGKey(0), image)["params"]
    d_xla = np.asarray(mq.apply({"params": params}, image))
    attn_ops.set_force_fused(True)
    try:
        d_fused = np.asarray(mq.apply({"params": params}, image))
    finally:
        attn_ops.set_force_fused(False)
    rel = np.abs(d_fused - d_xla).mean() / max(np.abs(d_xla).mean(), 1e-6)
    # Same quantization grid; differences come from the flash-attention
    # kernel's bf16 internals and the per-(b,n) proj re-quantization.
    assert rel < 0.05, rel
    assert np.isfinite(d_fused).all()


def test_int8_composes_with_token_merge(rng):
    """Both opt-in speed modes together: finite, bounded deviation."""
    from e3d_tpu.models import build_depth_model

    image = jnp.asarray(rng.normal(size=(1, 56, 56, 3)).astype(np.float32))
    m0 = build_depth_model("vitt", max_depth=20.0, dtype=jnp.float32)
    params = m0.init(jax.random.PRNGKey(0), image)["params"]
    d0 = np.asarray(m0.apply({"params": params}, image))
    mb = build_depth_model("vitt", max_depth=20.0, dtype=jnp.float32,
                           quant_int8=True, token_merge=0.25)
    db = np.asarray(mb.apply({"params": params}, image))
    assert np.isfinite(db).all()
    rel = np.abs(db - d0).mean() / max(np.abs(d0).mean(), 1e-6)
    assert 0.0 < rel < 0.5, rel


def test_infer_cli_int8_flag(tmp_path, monkeypatch, rng):
    """--int8 end-to-end through the infer CLI."""
    import cv2

    from e3d_tpu.cli import infer

    img = (rng.uniform(0, 255, (64, 64, 3))).astype(np.uint8)
    path = str(tmp_path / "x.png")
    cv2.imwrite(path, img)
    monkeypatch.chdir(tmp_path)
    infer.main(["--encoder", "vitt", "-i", path, "-o", str(tmp_path / "out"),
                "--input-size", "56", "--save-numpy", "--int8"])
    d = np.load(tmp_path / "out" / "x.npy")
    assert d.shape == (64, 64) and np.isfinite(d).all()
    assert (d >= 0).all() and (d <= 20.0).all()


def test_static_calibration_roundtrip(rng):
    """One-shot static calibration (VERDICT r3 #3): calibrate activation
    scales on K batches, freeze them, and run the static forward — the
    tape is deterministic, the frozen forward is finite with bounded
    deviation from the float forward (per-tensor scales are coarser than
    dynamic per-row, so the bound is looser than the dynamic test's)."""
    from e3d_tpu.models import build_depth_model
    from e3d_tpu.ops.quant import calibrate_scales, with_frozen_scales

    m0 = build_depth_model("vitt", max_depth=20.0, dtype=jnp.float32)
    mq = build_depth_model("vitt", max_depth=20.0, dtype=jnp.float32,
                           quant_int8=True)
    image = jnp.asarray(rng.normal(size=(2, 56, 56, 3)).astype(np.float32))
    params = m0.init(jax.random.PRNGKey(0), image)["params"]
    batches = [jnp.asarray(rng.normal(size=(2, 56, 56, 3))
                           .astype(np.float32)) for _ in range(3)]

    # params as a jit ARG (closure capture would constant-fold the
    # weight quantization — calibrate_scales docstring).
    fwd = lambda x, p: mq.apply({"params": p}, x)  # noqa: E731
    amax = calibrate_scales(fwd, batches, params)
    assert amax.ndim == 1 and amax.shape[0] > 0 and (amax > 0).all()
    amax2 = calibrate_scales(fwd, batches, params)
    np.testing.assert_array_equal(np.asarray(amax), np.asarray(amax2))

    static_fwd = jax.jit(with_frozen_scales(fwd, amax))
    d_static = np.asarray(static_fwd(image, params))
    d_float = np.asarray(m0.apply({"params": params}, image))
    assert np.isfinite(d_static).all()
    rel = np.abs(d_static - d_float).mean() / max(np.abs(d_float).mean(),
                                                  1e-6)
    assert 0.0 < rel < 0.2, rel


def test_calib_auto_dp_falls_back_single_chip(rng):
    """Auto data-parallel (8 devices, divisible batch) + calibration:
    falls back to single-chip with a warning instead of raising an
    unreachable 'pass data_parallel=False' remedy (advisor r4 low);
    explicit data_parallel=True still hard-errors."""
    import warnings

    import pytest

    from e3d_tpu.models import build_depth_model
    from e3d_tpu.models.depth_anything import BatchedRunner

    mq = build_depth_model("vitt", max_depth=20.0, dtype=jnp.float32,
                           quant_int8=True)
    params = mq.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 56, 56, 3)))["params"]
    frames = [np.full((64, 64, 3), 128, np.uint8) for _ in range(8)]

    with warnings.catch_warnings(record=True) as captured:
        warnings.simplefilter("always")
        runner = BatchedRunner(mq, params, (64, 64), input_size=56,
                               batch_size=8, data_parallel=None,
                               calib_frames=frames, calib_batches=1)
    assert any("single-chip" in str(w.message) for w in captured)
    depths = runner(frames)
    assert len(depths) == 8 and np.isfinite(depths[0]).all()

    with pytest.raises(ValueError, match="multi-device"):
        BatchedRunner(mq, params, (64, 64), input_size=56, batch_size=8,
                      data_parallel=True, calib_frames=frames,
                      calib_batches=1)


def test_frozen_scales_site_mismatch_raises(rng):
    """A frozen-scale vector from a different site count fails loudly at
    trace time instead of misassigning scales to sites."""
    import pytest

    from e3d_tpu.models import build_depth_model
    from e3d_tpu.ops.quant import with_frozen_scales

    mq = build_depth_model("vitt", max_depth=20.0, dtype=jnp.float32,
                           quant_int8=True)
    image = jnp.asarray(rng.normal(size=(1, 56, 56, 3)).astype(np.float32))
    params = mq.init(jax.random.PRNGKey(0), image)["params"]
    fwd = lambda x, p: mq.apply({"params": p}, x)  # noqa: E731
    with pytest.raises(ValueError, match="quant sites"):
        jax.jit(with_frozen_scales(fwd, np.ones(2, np.float32)))(image,
                                                                 params)


def test_infer_cli_int8_static_calib(tmp_path, monkeypatch, rng):
    """--int8 --int8-calib K end-to-end: calibrates on the first K device
    batches, then serves everything through the frozen-scale program."""
    import cv2

    from e3d_tpu.cli import infer

    paths = []
    for i in range(5):
        img = (rng.uniform(0, 255, (64, 64, 3))).astype(np.uint8)
        path = str(tmp_path / f"f{i}.png")
        cv2.imwrite(path, img)
        paths.append(path)
    filelist = tmp_path / "files.txt"
    filelist.write_text("\n".join(paths) + "\n")
    monkeypatch.chdir(tmp_path)
    # The 5 files stream as 3 chunks at batch-size 2; the CLI must
    # calibrate ONCE (on the first K=1 device batches) and reuse the
    # frozen-scale program for the rest (advisor r4 high: per-chunk
    # re-calibration both broke the contract and re-compiled per chunk).
    from e3d_tpu.ops import quant as quant_mod

    calls = {"n": 0}
    real_calibrate = quant_mod.calibrate_scales

    def counting_calibrate(*a, **k):
        calls["n"] += 1
        return real_calibrate(*a, **k)

    monkeypatch.setattr(quant_mod, "calibrate_scales", counting_calibrate)
    infer.main(["--encoder", "vitt", "-i", str(filelist),
                "-o", str(tmp_path / "out"), "--input-size", "56",
                "--save-numpy", "--int8", "--batch-size", "2",
                "--int8-calib", "1"])
    assert calls["n"] == 1, f"calibrated {calls['n']} times, expected once"
    for i in range(5):
        d = np.load(tmp_path / "out" / f"f{i}.npy")
        assert d.shape == (64, 64) and np.isfinite(d).all()
        assert (d >= 0).all() and (d <= 20.0).all()

    import pytest
    with pytest.raises(SystemExit, match="int8-calib"):
        infer.main(["--encoder", "vitt", "-i", str(filelist),
                    "-o", str(tmp_path / "o2"), "--input-size", "56",
                    "--int8-calib", "1"])
