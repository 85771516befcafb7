"""Ahead-of-time model export (StableHLO) for serving.

TPU-native deployment: the COMPLETE inference program — bicubic resize to
the network size, ImageNet normalization, forward pass, align-corners
resize back to the camera resolution (the reference's ``run.py:234``
semantics, same code path as ``infer_images_batched``) — is traced once
at a fixed (batch, H, W) and serialized as a portable StableHLO artifact
via ``jax.export``. A serving process replays it with
``deserialize(...).call``: no Flax model code, no Python re-tracing, and
the program that runs is byte-identical to the one that was benchmarked.

Parameters stay OUT of the artifact (they are call-time inputs), so the
Orbax checkpoint remains the single source of weights and the artifact
stays small (~100 KB vs ~1.3 GB with vitl weights baked in).

Artifact layout: ``<path>`` holds the serialized program; ``<path>.json``
records the model config, shapes and export platforms, and the param-tree
manifest used to re-order a restored checkpoint into call order.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np


def _program(model, net_hw: tuple[int, int], out_hw: tuple[int, int]):
    """(params, rgb01 (B,H,W,3) f32 in [0,1]) -> (B,H,W) f32 depth —
    the exact ``_run_batched`` serving program."""
    from ..models.depth_anything import _ModelThunk, _run_batched

    thunk = _ModelThunk(model)

    def fn(params, rgb01):
        return _run_batched.__wrapped__(params, rgb01, net_hw, out_hw,
                                        thunk)

    return fn


def export_depth_program(model, params, path: str,
                         frame_hw: tuple[int, int],
                         batch_size: int = 8,
                         input_size: int = 518,
                         calib_frames=None,
                         calib_batches: int = 0) -> dict:
    """Serialize the batched inference program for ``model`` at a fixed
    camera resolution. Returns the metadata dict (also written to
    ``<path>.json``).

    ``calib_batches > 0`` (requires ``model.quant_int8`` and
    ``calib_frames``: BGR uint8 frames at ``frame_hw``): one-shot static
    int8 calibration at EXPORT time — the per-site activation abs-max
    vector is measured on the first K device batches, baked into the
    exported program as constants, and recorded in the sidecar
    (``int8_calib_amax``) so deploys can audit the dial. The artifact
    then serves with frozen scales everywhere; no per-serve
    recalibration (the deployment contract static calibration exists
    for)."""
    import jax
    from jax import export as jexport

    from ..models.depth_anything import _lower_bound_hw

    h, w = int(frame_hw[0]), int(frame_hw[1])
    net_hw = _lower_bound_hw(h, w, input_size)
    fn = _program(model, net_hw, (h, w))

    amax = None
    if calib_batches > 0:
        import jax.numpy as jnp

        from ..models.depth_anything import chunk_rgb01
        from ..ops.quant import calibrate_scales, with_frozen_scales

        if not model.quant_int8:
            raise ValueError("calib_batches requires quant_int8=True")
        if not calib_frames:
            raise ValueError("calib_batches > 0 requires calib_frames")
        for fr in calib_frames:
            if tuple(np.shape(fr)[:2]) != (h, w):
                raise ValueError(
                    f"calibration frames must match frame_hw ({h}, {w}); "
                    f"got {np.shape(fr)[:2]}")
        calib = [jnp.asarray(arr) for arr, _ in chunk_rgb01(
            list(calib_frames)[:calib_batches * batch_size], batch_size)]
        amax = calibrate_scales(lambda x, p: fn(p, x), calib, params)
        fn = with_frozen_scales(fn, amax)

    param_specs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), a.dtype), params)
    img_spec = jax.ShapeDtypeStruct((int(batch_size), h, w, 3),
                                    np.float32)
    exp = jexport.export(jax.jit(fn))(param_specs, img_spec)
    data = exp.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    # Param-tree manifest: flattened key paths + shape/dtype, so a deploy
    # that restores a checkpoint with a drifted tree gets a diffable
    # record instead of an opaque in_tree/avals mismatch from jax.export.
    manifest = {
        "/".join(_kp_str(k) for k in kp): [list(np.shape(a)),
                                           np.dtype(a.dtype).name]
        for kp, a in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    meta = {
        "format": "jax.export/stablehlo",
        "encoder": model.encoder,
        "max_depth": float(model.max_depth),
        "frame_hw": [h, w],
        "net_hw": list(net_hw),
        "batch_size": int(batch_size),
        "input_size": int(input_size),
        "platforms": list(exp.platforms),
        # Every model field that changes the traced graph (the
        # _ModelThunk cache-key rule applies to the deploy manifest too).
        "dtype": str(np.dtype(model.dtype).name if model.dtype is not None
                     else "bfloat16"),
        "quant_int8": bool(model.quant_int8),
        "quant_scope": str(model.quant_scope),
        "quant_dpt": bool(model.quant_dpt),
        "token_merge": float(model.token_merge),
        "int8_calib_batches": int(calib_batches),
        "int8_calib_amax": ([float(v) for v in np.asarray(amax)]
                            if amax is not None else None),
        "artifact_bytes": len(data),
        "param_manifest": manifest,
    }
    # Both files atomically, artifact first then sidecar: a crash between
    # the two leaves the OLD sidecar, whose frame/batch guards still
    # match an artifact exported from the same checkpoint or fail loudly
    # in deserialize — never a truncated binary.
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    tmp = path + ".json.tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, path + ".json")
    return meta


def export_train_step(task, state, path: str,
                      microbatch: int, image_hw: tuple[int, int],
                      with_max_depth: bool = False,
                      with_weight: bool = False) -> dict:
    """Serialize the depth TRAIN step as a StableHLO artifact.

    A restarted fine-tune replays ``(state, batch) -> (state, metrics)``
    without paying the trace+compile cost again (measured 218 s at the
    flagship vitl-518 bs8x3 shape on v5e, BENCH_r03). The artifact is
    traced with the task's full-window grad-accum layout
    ``(grad_accum, microbatch, H, W, C)`` and replicated shardings (the
    single-chip restart case jax.export can replay anywhere; multi-chip
    meshes re-jit as before). State (params + optimizer moments + step)
    stays a call-time input, so the Orbax checkpoint remains the single
    source of truth.

    Returns the metadata dict (also written to ``<path>.json``).
    """
    import jax
    from jax import export as jexport

    step_fn, _ = task._build_train_step()
    h, w = int(image_hw[0]), int(image_hw[1])
    a, mb = int(task.grad_accum), int(microbatch)
    batch_specs = {
        "image": jax.ShapeDtypeStruct((a, mb, h, w, 3), np.float32),
        "depth": jax.ShapeDtypeStruct((a, mb, h, w, 1), np.float32),
    }
    if with_max_depth:
        batch_specs["max_depth"] = jax.ShapeDtypeStruct((a, mb), np.float32)
    if with_weight:
        batch_specs["weight"] = jax.ShapeDtypeStruct((a,), np.float32)
    state_specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), state)
    # jax.export can only serialize builtin pytree containers; the state
    # tree holds optax namedtuples/dataclasses (EmptyState, AdamState,
    # DepthTrainState). Flatten at the export boundary: the artifact's
    # calling convention is (leaf list, batch dict) -> (leaf list,
    # metrics dict), and ExportedTrainStep re-folds with the caller's
    # treedef (Orbax restores the same structure).
    leaf_specs, treedef = jax.tree_util.tree_flatten(state_specs)

    def flat_fn(leaves, batch):
        st = jax.tree_util.tree_unflatten(treedef, leaves)
        new_state, metrics = step_fn(st, batch)
        return jax.tree_util.tree_leaves(new_state), metrics

    exp = jexport.export(jax.jit(flat_fn))(leaf_specs, batch_specs)
    data = exp.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".",
                exist_ok=True)
    meta = {
        "format": "jax.export/stablehlo",
        "kind": "depth_train_step",
        "encoder": task.encoder,
        "max_depth": float(task.max_depth),
        "grad_accum": a,
        "microbatch": mb,
        "image_hw": [h, w],
        "with_max_depth": bool(with_max_depth),
        "with_weight": bool(with_weight),
        "platforms": list(exp.platforms),
        "artifact_bytes": len(data),
        "state_manifest": {
            "/".join(_kp_str(k) for k in kp): [list(np.shape(x)),
                                               np.dtype(x.dtype).name]
            for kp, x in jax.tree_util.tree_flatten_with_path(state)[0]
        },
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    tmp = path + ".json.tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, path + ".json")
    return meta


class ExportedTrainStep:
    """A deserialized train-step export: ``(state, batch) -> (state,
    metrics)`` with shape checks against the sidecar metadata."""

    def __init__(self, path: str):
        from jax import export as jexport

        with open(path, "rb") as f:
            self._exp = jexport.deserialize(f.read())
        with open(path + ".json", encoding="utf-8") as f:
            self.meta = json.load(f)
        if self.meta.get("kind") != "depth_train_step":
            raise ValueError(f"{path} is not a train-step export "
                             f"(kind={self.meta.get('kind')!r})")

    def __call__(self, state: Any, batch: dict):
        import jax

        m = self.meta
        want = (m["grad_accum"], m["microbatch"], *m["image_hw"], 3)
        got = tuple(np.shape(batch["image"]))
        if got != want:
            raise ValueError(
                f"exported train step is fixed-shape image={want}; "
                f"got {got}")
        leaves, treedef = jax.tree_util.tree_flatten(state)
        out_leaves, metrics = self._exp.call(leaves, batch)
        return jax.tree_util.tree_unflatten(treedef, list(out_leaves)), \
            metrics


def load_exported_train_step(path: str) -> ExportedTrainStep:
    return ExportedTrainStep(path)


def _kp_str(k) -> str:
    if hasattr(k, "key"):
        return str(k.key)
    if hasattr(k, "idx"):
        return str(k.idx)
    return str(k)


class ExportedDepthProgram:
    """A deserialized export: ``run(params, frames)`` with shape checks."""

    def __init__(self, path: str):
        from jax import export as jexport

        with open(path, "rb") as f:
            self._exp = jexport.deserialize(f.read())
        with open(path + ".json", encoding="utf-8") as f:
            self.meta = json.load(f)

    def __call__(self, params: Any, rgb01: np.ndarray):
        """params: the checkpoint tree the program was exported against;
        rgb01: (batch_size, H, W, 3) f32 in [0, 1]. Returns (B, H, W)
        f32 metric depth."""
        b, h, w = (self.meta["batch_size"], *self.meta["frame_hw"])
        if tuple(np.shape(rgb01)) != (b, h, w, 3):
            raise ValueError(
                f"exported program is fixed-shape ({b}, {h}, {w}, 3); "
                f"got {np.shape(rgb01)}")
        return self._exp.call(params, rgb01)


def load_exported(path: str) -> ExportedDepthProgram:
    return ExportedDepthProgram(path)


def exported_runner(prog: ExportedDepthProgram, params: Any):
    """Adapt an exported program to the ``DepthServingEngine`` runner
    contract (``list[BGR uint8] -> list[(H, W) f32 depth]``), padding
    ragged tails to the exported batch size so the artifact's one
    compiled shape serves any request count."""
    b = int(prog.meta["batch_size"])
    h, w = prog.meta["frame_hw"]

    def run(frames):
        from ..models.depth_anything import chunk_rgb01

        for f in frames:
            if tuple(np.shape(f)) != (h, w, 3):
                raise ValueError(
                    f"exported program serves ({h}, {w}, 3) frames; "
                    f"got {np.shape(f)}")
        out: list[np.ndarray] = []
        for arr, n in chunk_rgb01(frames, b):
            out.extend(np.asarray(prog(params, arr))[:n])
        return out

    return run
