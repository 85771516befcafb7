"""Numerical parity of our DinoViT against HuggingFace transformers Dinov2.

Builds a tiny HF Dinov2Model, exports its weights in the DAv2 torch naming
(fused qkv), converts with models.convert, and compares the final hidden
states — validating patch embed, pos embed, pre-LN blocks, LayerScale,
attention and the final norm end to end.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import e3d_tpu  # noqa: F401
from e3d_tpu.models.convert import convert_dav2
from e3d_tpu.models.dinov2 import DinoViT


def hf_to_dav2_state(hf_state, depth):
    import torch

    out = {
        "pretrained.cls_token": hf_state["embeddings.cls_token"],
        "pretrained.mask_token": hf_state["embeddings.mask_token"],
        "pretrained.pos_embed": hf_state["embeddings.position_embeddings"],
        "pretrained.patch_embed.proj.weight":
            hf_state["embeddings.patch_embeddings.projection.weight"],
        "pretrained.patch_embed.proj.bias":
            hf_state["embeddings.patch_embeddings.projection.bias"],
        "pretrained.norm.weight": hf_state["layernorm.weight"],
        "pretrained.norm.bias": hf_state["layernorm.bias"],
    }
    for i in range(depth):
        src = f"encoder.layer.{i}"
        dst = f"pretrained.blocks.{i}"
        att = f"{src}.attention.attention"
        out[f"{dst}.attn.qkv.weight"] = torch.cat([
            hf_state[f"{att}.query.weight"],
            hf_state[f"{att}.key.weight"],
            hf_state[f"{att}.value.weight"]], dim=0)
        out[f"{dst}.attn.qkv.bias"] = torch.cat([
            hf_state[f"{att}.query.bias"],
            hf_state[f"{att}.key.bias"],
            hf_state[f"{att}.value.bias"]], dim=0)
        out[f"{dst}.attn.proj.weight"] = \
            hf_state[f"{src}.attention.output.dense.weight"]
        out[f"{dst}.attn.proj.bias"] = \
            hf_state[f"{src}.attention.output.dense.bias"]
        out[f"{dst}.ls1.gamma"] = hf_state[f"{src}.layer_scale1.lambda1"]
        out[f"{dst}.ls2.gamma"] = hf_state[f"{src}.layer_scale2.lambda1"]
        for nm in ("norm1", "norm2"):
            out[f"{dst}.{nm}.weight"] = hf_state[f"{src}.{nm}.weight"]
            out[f"{dst}.{nm}.bias"] = hf_state[f"{src}.{nm}.bias"]
        if f"{src}.mlp.fc1.weight" in hf_state:  # ratio-4 GELU MLP
            for fc in ("fc1", "fc2"):
                out[f"{dst}.mlp.{fc}.weight"] = \
                    hf_state[f"{src}.mlp.{fc}.weight"]
                out[f"{dst}.mlp.{fc}.bias"] = hf_state[f"{src}.mlp.{fc}.bias"]
        else:  # SwiGLU (use_swiglu_ffn): weights_in/out -> DAv2 w12/w3
            out[f"{dst}.mlp.w12.weight"] = \
                hf_state[f"{src}.mlp.weights_in.weight"]
            out[f"{dst}.mlp.w12.bias"] = \
                hf_state[f"{src}.mlp.weights_in.bias"]
            out[f"{dst}.mlp.w3.weight"] = \
                hf_state[f"{src}.mlp.weights_out.weight"]
            out[f"{dst}.mlp.w3.bias"] = \
                hf_state[f"{src}.mlp.weights_out.bias"]
    return {k: v.numpy() for k, v in out.items()}


def test_encoder_matches_transformers_dinov2():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    cfg = transformers.Dinov2Config(
        hidden_size=64, num_hidden_layers=4, num_attention_heads=2,
        intermediate_size=256, patch_size=14, image_size=56,
        layerscale_value=1.0, hidden_act="gelu")
    hf = transformers.Dinov2Model(cfg).eval()

    state = hf_to_dav2_state(hf.state_dict(), depth=4)
    params = convert_dav2(state, "vitt", encoder_only=True)["pretrained"]

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 56, 56, 3)).astype(np.float32)

    with torch.no_grad():
        expected = hf(torch.tensor(x.transpose(0, 3, 1, 2))
                      ).last_hidden_state.numpy()

    model = DinoViT(encoder="vitt", dtype=jnp.float32)
    with jax.default_matmul_precision("highest"):
        taps = model.apply({"params": params}, jnp.asarray(x),
                           tap_indices=[3])
    patch_tokens, cls_token = taps[0]
    ours = np.concatenate(
        [np.asarray(cls_token)[:, None], np.asarray(patch_tokens)], axis=1)

    np.testing.assert_allclose(ours, expected, atol=2e-4)


def test_encoder_matches_transformers_dinov2_swiglu():
    """vit_giant2's fused-SwiGLU FFN (models/dinov2.py SwiGLU) against HF
    Dinov2 with ``use_swiglu_ffn=True`` — same packed w12 -> chunk ->
    silu(x1)*x2 -> w3 math and the same 2/3-of-4x hidden rounded to 8."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from e3d_tpu.models.dinov2 import swiglu_hidden

    cfg = transformers.Dinov2Config(
        hidden_size=64, num_hidden_layers=4, num_attention_heads=2,
        intermediate_size=256, patch_size=14, image_size=56,
        layerscale_value=1.0, use_swiglu_ffn=True)
    hf = transformers.Dinov2Model(cfg).eval()
    # Same hidden width as HF's Dinov2SwiGLUFFN rounding.
    assert hf.state_dict()[
        "encoder.layer.0.mlp.weights_out.weight"].shape[1] == \
        swiglu_hidden(64)

    state = hf_to_dav2_state(hf.state_dict(), depth=4)
    params = convert_dav2(state, "vitt", encoder_only=True)["pretrained"]

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        expected = hf(torch.tensor(x.transpose(0, 3, 1, 2))
                      ).last_hidden_state.numpy()

    model = DinoViT(encoder="vitt", dtype=jnp.float32, ffn="swiglu")
    with jax.default_matmul_precision("highest"):
        taps = model.apply({"params": params}, jnp.asarray(x),
                           tap_indices=[3])
    patch_tokens, cls_token = taps[0]
    ours = np.concatenate(
        [np.asarray(cls_token)[:, None], np.asarray(patch_tokens)], axis=1)
    np.testing.assert_allclose(ours, expected, atol=2e-4)
