"""Streaming serving engine: batching, mixed resolutions, error paths,
consistency with the single-frame path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import e3d_tpu  # noqa: F401
from e3d_tpu.models import build_depth_model
from e3d_tpu.models.depth_anything import infer_image
from e3d_tpu.serving import DepthServingEngine


@pytest.fixture(scope="module")
def model_and_params():
    model = build_depth_model("vitt", max_depth=20.0, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 56, 56, 3)))["params"]
    return model, params


def test_serving_matches_single_frame(model_and_params, rng):
    model, params = model_and_params
    frames = [rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
              for _ in range(5)]
    with DepthServingEngine(model, params, input_size=56,
                            batch_size=4) as engine:
        futures = engine.submit_many(frames)
        results = [f.result(timeout=120) for f in futures]
    for frame, depth in zip(frames, results):
        assert depth.shape == (64, 64)
        expected = infer_image(model, params, frame, input_size=56)
        np.testing.assert_allclose(depth, expected, atol=1e-4)


def test_serving_mixed_resolutions(model_and_params, rng):
    model, params = model_and_params
    small = rng.integers(0, 255, size=(48, 48, 3), dtype=np.uint8)
    large = rng.integers(0, 255, size=(64, 80, 3), dtype=np.uint8)
    with DepthServingEngine(model, params, input_size=56,
                            batch_size=4, max_delay_s=0.01) as engine:
        f1 = engine.submit(small)
        f2 = engine.submit(large)
        f3 = engine.submit(small)
        assert f1.result(timeout=120).shape == (48, 48)
        assert f2.result(timeout=120).shape == (64, 80)
        assert f3.result(timeout=120).shape == (48, 48)


def test_serving_mixed_resolution_then_close(model_and_params, rng):
    """A deferred other-resolution frame must still resolve when close()
    follows immediately (regression: tail re-queue dropped it behind the
    shutdown sentinel)."""
    model, params = model_and_params
    a = rng.integers(0, 255, size=(48, 48, 3), dtype=np.uint8)
    b = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
    engine = DepthServingEngine(model, params, input_size=56, batch_size=4,
                                max_delay_s=0.5)
    fa = engine.submit(a)
    fb = engine.submit(b)
    engine.close()
    assert fa.result(timeout=120).shape == (48, 48)
    assert fb.result(timeout=120).shape == (64, 64)


def test_serving_error_propagates(model_and_params):
    model, params = model_and_params
    with DepthServingEngine(model, params, input_size=56,
                            batch_size=2) as engine:
        fut = engine.submit(np.zeros((8,), np.uint8))  # malformed frame
        with pytest.raises(Exception):
            fut.result(timeout=60)


def test_serving_closed_rejects(model_and_params):
    model, params = model_and_params
    engine = DepthServingEngine(model, params, input_size=56)
    engine.close()
    with pytest.raises(RuntimeError):
        engine.submit(np.zeros((56, 56, 3), np.uint8))


def test_serving_stats(model_and_params, rng):
    """stats(): counters add up, batching is visible in mean fill, and
    the end-to-end latency quantiles are sane and ordered."""
    model, params = model_and_params
    frames = [rng.integers(0, 255, size=(48, 48, 3), dtype=np.uint8)
              for _ in range(8)]
    with DepthServingEngine(model, params, input_size=56,
                            batch_size=4) as engine:
        for f in engine.submit_many(frames):
            f.result(timeout=120)
        stats = engine.stats()
    assert stats["submitted"] == 8 and stats["completed"] == 8
    assert stats["failed"] == 0
    assert stats["batches"] >= 2  # 8 frames / batch_size 4
    assert 1.0 <= stats["mean_batch_fill"] <= 4.0
    assert 0 < stats["latency_p50_ms"] <= stats["latency_p95_ms"]
    assert stats["latency_p95_ms"] <= stats["latency_p99_ms"]
    assert stats["latency_p99_ms"] <= stats["latency_max_ms"]


def test_serving_stats_counts_failures(model_and_params):
    model, params = model_and_params
    with DepthServingEngine(model, params, input_size=56,
                            batch_size=2) as engine:
        fut = engine.submit(np.zeros((7, 5), np.uint8))  # not HxWx3
        with pytest.raises(Exception):
            fut.result(timeout=120)
        stats = engine.stats()
    assert stats["failed"] == 1 and stats["completed"] == 0


@pytest.fixture(scope="module")
def quant_model_and_params():
    model = build_depth_model("vitt", max_depth=20.0, dtype=jnp.float32,
                              quant_int8=True)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 56, 56, 3)))["params"]
    return model, params


def test_serving_calib_partial_batch_low_load(quant_model_and_params, rng):
    """calib_batches with fewer frames than one full batch: the timeout-
    flushed PARTIAL batch triggers early calibration (with a warning)
    instead of holding the futures until more traffic arrives."""
    import warnings as warnings_mod

    model, params = quant_model_and_params
    frames = [rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
              for _ in range(2)]  # < batch_size
    with DepthServingEngine(model, params, input_size=56, batch_size=4,
                            max_delay_s=0.05, calib_batches=2) as engine:
        futures = engine.submit_many(frames)
        # Futures must resolve WITHOUT more submissions or close().
        results = [f.result(timeout=180) for f in futures]
    for d in results:
        assert d.shape == (64, 64) and np.isfinite(d).all()
    assert engine.stats()["completed"] == 2


def test_serving_calib_close_flushes_backlog(quant_model_and_params, rng):
    """A held calibration backlog is calibrated-and-served on close():
    no future is ever dropped by shutdown."""
    model, params = quant_model_and_params
    frames = [rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
              for _ in range(4)]  # exactly one full batch, K=2 wants 8
    engine = DepthServingEngine(model, params, input_size=56, batch_size=4,
                                max_delay_s=30.0, calib_batches=2)
    try:
        futures = engine.submit_many(frames)
    finally:
        engine.close()  # sentinel -> final drain calibrates the backlog
    results = [f.result(timeout=180) for f in futures]
    for d in results:
        assert d.shape == (64, 64) and np.isfinite(d).all()


def test_serving_calib_requires_quant_model(model_and_params):
    model, params = model_and_params
    with pytest.raises(ValueError, match="quant_int8"):
        DepthServingEngine(model, params, input_size=56, batch_size=4,
                           calib_batches=1)


def test_serving_readback_f16_knob(model_and_params, rng, monkeypatch):
    """E3D_SERVE_READBACK=f16 halves the depth readback: outputs come
    back float16 within f16 quantization of the f32 path (~0.01 absolute
    at the 20 m range cap; perf/serve_ingest_notes.md). The knob is
    resolved at runner construction and passed as a STATIC jit arg, so
    a flipped knob can never be served by a stale cached program."""
    from e3d_tpu.models.depth_anything import infer_images_batched

    model, params = model_and_params
    frames = [rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
              for _ in range(3)]
    d32 = infer_images_batched(model, params, frames, input_size=56,
                               batch_size=4, data_parallel=False)
    monkeypatch.setenv("E3D_SERVE_READBACK", "f16")
    d16 = infer_images_batched(model, params, frames, input_size=56,
                               batch_size=4, data_parallel=False)
    assert d32[0].dtype == np.float32 and d16[0].dtype == np.float16
    for a, b in zip(d16, d32):
        np.testing.assert_allclose(a.astype(np.float32), b, atol=0.02)


def test_serving_reset_stats_excludes_warmup(model_and_params, rng):
    """reset_stats() zeroes the reservoir so a warmup batch's compile
    latency does not sit in a later SLO window's p99/max."""
    model, params = model_and_params
    frames = [rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
              for _ in range(4)]
    with DepthServingEngine(model, params, input_size=56,
                            batch_size=4) as engine:
        [f.result(timeout=120) for f in engine.submit_many(frames)]
        assert engine.stats()["completed"] == 4
        engine.reset_stats()
        s = engine.stats()
        assert s["completed"] == 0 and s["batches"] == 0
        assert "latency_p50_ms" not in s  # empty reservoir
        [f.result(timeout=120) for f in engine.submit_many(frames[:2])]
        s2 = engine.stats()
        assert s2["completed"] == 2 and s2["submitted"] == 2
        # post-reset latencies are steady-state, not compile-scale
        assert s2["latency_max_ms"] < 60_000
