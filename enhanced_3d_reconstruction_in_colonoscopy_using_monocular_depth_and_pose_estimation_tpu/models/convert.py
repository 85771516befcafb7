"""PyTorch -> JAX weight conversion for DAv2 and pose checkpoints.

Handles the reference's checkpoint conventions:

- Lightning ``.ckpt`` files: state dict under ``"state_dict"`` with a
  ``"model."`` prefix to strip (``/root/reference/run.py:127-147``,
  ``test_lightning.py:114-133``);
- raw DAv2 ``.pth`` files: flat state dict;
- encoder-only bootstrap: keep only keys containing ``"pretrained"``
  (``lightning_model.py:130-140``).

Layout rules (torch -> flax/NHWC):
- Conv2d ``(O, I, kh, kw)`` -> ``(kh, kw, I, O)``
- ConvTranspose2d ``(I, O, kh, kw)`` -> PixelExpand ``(kh, kw, I, O)``
- Linear ``(O, I)`` -> Dense ``(I, O)``
- LayerNorm/BatchNorm ``weight/bias`` -> ``scale/bias``; BN running stats ->
  ``batch_stats`` collection.

``vitg`` builds the fused-SwiGLU FFN (upstream vit_giant2 semantics;
``mlp.w12``/``mlp.w3`` keys map one-to-one). Both FFN key families are
mapped, so a hypothetical MLP-FFN giant would convert too — but its tree
would fail the model's shape/param checks loudly rather than load wrong
(select ``DinoViT(ffn="mlp")`` for such a checkpoint). No reference
experiment uses vitg.
"""

from __future__ import annotations

import os
from typing import Mapping

import numpy as np

from .dinov2 import VIT_ARCHS
from .depth_anything import MODEL_CONFIGS


def load_or_init_depth_params(encoder: str, max_depth: float,
                              load_from: str | None,
                              token_merge: float = 0.0,
                              quant_int8: bool = False):
    """Build the depth model and either convert a torch checkpoint or fall
    back to a random init (shared by the infer / pointcloud / serve CLIs).
    ``token_merge``: opt-in ToMe speed mode; ``quant_int8``: opt-in
    dynamic-int8 encoder matmuls (both parameter-free — the same
    checkpoints load unchanged)."""
    import jax

    from .depth_anything import build_depth_model

    model = build_depth_model(encoder, max_depth=max_depth,
                              token_merge=token_merge,
                              quant_int8=quant_int8)
    if load_from and os.path.isdir(load_from):
        # Orbax checkpoint dir — our own training output (core.checkpoint).
        from ..core.checkpoint import CheckpointManager

        # Best-val weights (latest fallback) — matching test_depth and the
        # reference's best-checkpoint test/serve flow.
        restored = CheckpointManager(load_from).restore_best_untyped()
        if restored is None:
            raise FileNotFoundError(f"no checkpoints in {load_from}")
        params = (restored["params"] if isinstance(restored, dict)
                  else restored.params)
    elif load_from:
        params = convert_dav2(load_torch_state_dict(load_from), encoder)
    else:
        print(f"[{encoder}] no checkpoint given; random init (smoke mode)")
        params = model.init(jax.random.PRNGKey(0),
                            np.zeros((1, 518, 518, 3), np.float32))["params"]
    return model, jax.device_put(params)


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a torch checkpoint to numpy, applying reference prefix fixups."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    out = {}
    for key, value in state.items():
        if key.startswith("model."):
            key = key[len("model."):]
        out[key] = np.asarray(value.detach().cpu().numpy())
    return out


def _conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _convT(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 0, 1))


def _dense(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value.astype(np.float32)


def convert_dav2(state: Mapping[str, np.ndarray], encoder: str,
                 encoder_only: bool = False) -> dict:
    """Convert a DAv2(-metric) torch state dict to our flax params tree."""
    depth = VIT_ARCHS[encoder]["depth"]
    params: dict = {}

    def enc(path: tuple[str, ...], key: str, fn=None) -> bool:
        if key not in state:
            return False
        v = state[key]
        _set(params, ("pretrained",) + path, fn(v) if fn else v)
        return True

    enc(("cls_token",), "pretrained.cls_token")
    enc(("pos_embed",), "pretrained.pos_embed")
    enc(("mask_token",), "pretrained.mask_token")
    enc(("patch_embed", "kernel"), "pretrained.patch_embed.proj.weight", _conv)
    enc(("patch_embed", "bias"), "pretrained.patch_embed.proj.bias")
    for i in range(depth):
        b = f"pretrained.blocks.{i}"
        p = (f"blocks_{i}",)
        enc(p + ("norm1", "scale"), f"{b}.norm1.weight")
        enc(p + ("norm1", "bias"), f"{b}.norm1.bias")
        enc(p + ("attn", "qkv", "kernel"), f"{b}.attn.qkv.weight", _dense)
        enc(p + ("attn", "qkv", "bias"), f"{b}.attn.qkv.bias")
        enc(p + ("attn", "proj", "kernel"), f"{b}.attn.proj.weight", _dense)
        enc(p + ("attn", "proj", "bias"), f"{b}.attn.proj.bias")
        enc(p + ("ls1", "gamma"), f"{b}.ls1.gamma")
        enc(p + ("ls2", "gamma"), f"{b}.ls2.gamma")
        enc(p + ("norm2", "scale"), f"{b}.norm2.weight")
        enc(p + ("norm2", "bias"), f"{b}.norm2.bias")
        enc(p + ("mlp", "fc1", "kernel"), f"{b}.mlp.fc1.weight", _dense)
        enc(p + ("mlp", "fc1", "bias"), f"{b}.mlp.fc1.bias")
        enc(p + ("mlp", "fc2", "kernel"), f"{b}.mlp.fc2.weight", _dense)
        enc(p + ("mlp", "fc2", "bias"), f"{b}.mlp.fc2.bias")
        # Fused-SwiGLU FFN (vit_giant2): w12 packs gate+value, w3 back.
        enc(p + ("mlp", "w12", "kernel"), f"{b}.mlp.w12.weight", _dense)
        enc(p + ("mlp", "w12", "bias"), f"{b}.mlp.w12.bias")
        enc(p + ("mlp", "w3", "kernel"), f"{b}.mlp.w3.weight", _dense)
        enc(p + ("mlp", "w3", "bias"), f"{b}.mlp.w3.bias")
    enc(("norm", "scale"), "pretrained.norm.weight")
    enc(("norm", "bias"), "pretrained.norm.bias")

    if encoder_only:
        return params

    def head(path: tuple[str, ...], key: str, fn=None) -> bool:
        if key not in state:
            return False
        v = state[key]
        _set(params, ("depth_head",) + path, fn(v) if fn else v)
        return True

    for i in range(4):
        head((f"project_{i}", "kernel"), f"depth_head.projects.{i}.weight",
             _conv)
        head((f"project_{i}", "bias"), f"depth_head.projects.{i}.bias")
    head(("resize_0", "kernel"), "depth_head.resize_layers.0.weight", _convT)
    head(("resize_0", "bias"), "depth_head.resize_layers.0.bias")
    head(("resize_1", "kernel"), "depth_head.resize_layers.1.weight", _convT)
    head(("resize_1", "bias"), "depth_head.resize_layers.1.bias")
    head(("resize_3", "kernel"), "depth_head.resize_layers.3.weight", _conv)
    head(("resize_3", "bias"), "depth_head.resize_layers.3.bias")
    for k in range(1, 5):
        head((f"layer{k}_rn", "kernel"),
             f"depth_head.scratch.layer{k}_rn.weight", _conv)
        rf = f"depth_head.scratch.refinenet{k}"
        for unit in (1, 2):
            if k == 4 and unit == 1:
                # refinenet4 takes a single input, so its resConfUnit1 is
                # never used (by the torch forward either); the checkpoint
                # still contains the weights — skip them.
                continue
            for conv in (1, 2):
                head((f"refinenet{k}", f"resConfUnit{unit}", f"conv{conv}",
                      "kernel"), f"{rf}.resConfUnit{unit}.conv{conv}.weight",
                     _conv)
                head((f"refinenet{k}", f"resConfUnit{unit}", f"conv{conv}",
                      "bias"), f"{rf}.resConfUnit{unit}.conv{conv}.bias")
        head((f"refinenet{k}", "out_conv", "kernel"), f"{rf}.out_conv.weight",
             _conv)
        head((f"refinenet{k}", "out_conv", "bias"), f"{rf}.out_conv.bias")
    head(("output_conv1", "kernel"), "depth_head.scratch.output_conv1.weight",
         _conv)
    head(("output_conv1", "bias"), "depth_head.scratch.output_conv1.bias")
    head(("output_conv2_0", "kernel"),
         "depth_head.scratch.output_conv2.0.weight", _conv)
    head(("output_conv2_0", "bias"),
         "depth_head.scratch.output_conv2.0.bias")
    head(("output_conv2_2", "kernel"),
         "depth_head.scratch.output_conv2.2.weight", _conv)
    head(("output_conv2_2", "bias"),
         "depth_head.scratch.output_conv2.2.bias")
    return params


def convert_pose_net(state: Mapping[str, np.ndarray]) -> dict:
    """Convert the reference PoseEstimationNet state dict.

    Returns ``{"params": ..., "batch_stats": ...}`` variable collections.
    """
    params: dict = {}
    stats: dict = {}

    def conv(path, key):
        _set(params, path + ("kernel",), _conv(state[key + ".weight"]))

    def bn(path, key):
        _set(params, path + ("scale",), state[key + ".weight"])
        _set(params, path + ("bias",), state[key + ".bias"])
        _set(stats, path + ("mean",), state[key + ".running_mean"])
        _set(stats, path + ("var",), state[key + ".running_var"])

    def dense(path, key):
        _set(params, path + ("kernel",), _dense(state[key + ".weight"]))
        _set(params, path + ("bias",), state[key + ".bias"])

    conv(("conv1",), "backbone.conv1")
    bn(("bn1",), "backbone.bn1")
    for layer in range(1, 5):
        for j in range(2):
            tname = f"backbone.layer{layer}.{j}"
            fname = (f"layer{layer}_{j}",)
            conv(fname + ("conv1",), f"{tname}.conv1")
            bn(fname + ("bn1",), f"{tname}.bn1")
            conv(fname + ("conv2",), f"{tname}.conv2")
            bn(fname + ("bn2",), f"{tname}.bn2")
            if f"{tname}.downsample.0.weight" in state:
                conv(fname + ("downsample_conv",), f"{tname}.downsample.0")
                bn(fname + ("downsample_bn",), f"{tname}.downsample.1")
    dense(("fc",), "backbone.fc")
    dense(("head_fc1",), "pose_head.2")
    dense(("head_fc2",), "pose_head.5")
    dense(("head_fc3",), "pose_head.8")
    return {"params": params, "batch_stats": stats}


def synthetic_dav2_state_dict(encoder: str,
                              seed: int = 0) -> dict[str, np.ndarray]:
    """Random torch-format DAv2 state dict (for tests: exercises every key
    the converter must map, with the true shapes)."""
    rng = np.random.default_rng(seed)
    arch = VIT_ARCHS[encoder]
    cfg = MODEL_CONFIGS[encoder]
    c = arch["embed_dim"]
    f = cfg["features"]
    oc = cfg["out_channels"]
    grid = 37 if encoder != "vitt" else 4

    def r(*shape):
        return (rng.normal(size=shape) * 0.02).astype(np.float32)

    s: dict[str, np.ndarray] = {
        "pretrained.cls_token": r(1, 1, c),
        "pretrained.pos_embed": r(1, 1 + grid * grid, c),
        "pretrained.mask_token": r(1, c),
        "pretrained.patch_embed.proj.weight": r(c, 3, 14, 14),
        "pretrained.patch_embed.proj.bias": r(c),
        "pretrained.norm.weight": 1 + r(c),
        "pretrained.norm.bias": r(c),
    }
    for i in range(arch["depth"]):
        b = f"pretrained.blocks.{i}"
        s |= {
            f"{b}.norm1.weight": 1 + r(c), f"{b}.norm1.bias": r(c),
            f"{b}.attn.qkv.weight": r(3 * c, c), f"{b}.attn.qkv.bias": r(3 * c),
            f"{b}.attn.proj.weight": r(c, c), f"{b}.attn.proj.bias": r(c),
            f"{b}.ls1.gamma": 1 + r(c), f"{b}.ls2.gamma": 1 + r(c),
            f"{b}.norm2.weight": 1 + r(c), f"{b}.norm2.bias": r(c),
            f"{b}.mlp.fc1.weight": r(4 * c, c), f"{b}.mlp.fc1.bias": r(4 * c),
            f"{b}.mlp.fc2.weight": r(c, 4 * c), f"{b}.mlp.fc2.bias": r(c),
        }
    for i in range(4):
        s[f"depth_head.projects.{i}.weight"] = r(oc[i], c, 1, 1)
        s[f"depth_head.projects.{i}.bias"] = r(oc[i])
    s["depth_head.resize_layers.0.weight"] = r(oc[0], oc[0], 4, 4)
    s["depth_head.resize_layers.0.bias"] = r(oc[0])
    s["depth_head.resize_layers.1.weight"] = r(oc[1], oc[1], 2, 2)
    s["depth_head.resize_layers.1.bias"] = r(oc[1])
    s["depth_head.resize_layers.3.weight"] = r(oc[3], oc[3], 3, 3)
    s["depth_head.resize_layers.3.bias"] = r(oc[3])
    for k in range(1, 5):
        s[f"depth_head.scratch.layer{k}_rn.weight"] = r(f, oc[k - 1], 3, 3)
        rf = f"depth_head.scratch.refinenet{k}"
        for unit in (1, 2):
            for conv_i in (1, 2):
                s[f"{rf}.resConfUnit{unit}.conv{conv_i}.weight"] = r(f, f, 3, 3)
                s[f"{rf}.resConfUnit{unit}.conv{conv_i}.bias"] = r(f)
        s[f"{rf}.out_conv.weight"] = r(f, f, 1, 1)
        s[f"{rf}.out_conv.bias"] = r(f)
    s["depth_head.scratch.output_conv1.weight"] = r(f // 2, f, 3, 3)
    s["depth_head.scratch.output_conv1.bias"] = r(f // 2)
    s["depth_head.scratch.output_conv2.0.weight"] = r(32, f // 2, 3, 3)
    s["depth_head.scratch.output_conv2.0.bias"] = r(32)
    s["depth_head.scratch.output_conv2.2.weight"] = r(1, 32, 1, 1)
    s["depth_head.scratch.output_conv2.2.bias"] = r(1)
    return s
