"""Full-model numerical parity vs HuggingFace DepthAnythingForDepthEstimation.

Builds a tiny HF DepthAnything (metric, max_depth=20) whose architecture
mirrors our ``vitt`` config, exports its weights in the DAv2 torch naming,
converts them with ``models.convert.convert_dav2`` and compares the
predicted metric depth maps end to end (encoder + DPT neck + metric head).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import e3d_tpu  # noqa: F401
from e3d_tpu.models import build_depth_model
from e3d_tpu.models.convert import convert_dav2
from tests.test_dinov2_parity import hf_to_dav2_state


def hf_head_to_dav2(sd):
    """Map HF DepthAnything neck/head names to DAv2 torch naming."""
    out = {}
    for i in range(4):
        out[f"depth_head.projects.{i}.weight"] = \
            sd[f"neck.reassemble_stage.layers.{i}.projection.weight"]
        out[f"depth_head.projects.{i}.bias"] = \
            sd[f"neck.reassemble_stage.layers.{i}.projection.bias"]
        out[f"depth_head.scratch.layer{i + 1}_rn.weight"] = \
            sd[f"neck.convs.{i}.weight"]
    for i in (0, 1, 3):
        out[f"depth_head.resize_layers.{i}.weight"] = \
            sd[f"neck.reassemble_stage.layers.{i}.resize.weight"]
        out[f"depth_head.resize_layers.{i}.bias"] = \
            sd[f"neck.reassemble_stage.layers.{i}.resize.bias"]
    # HF fusion layer j processes the (4-j)-th deepest feature:
    # fusion.layers.0 == refinenet4 ... layers.3 == refinenet1.
    for j in range(4):
        k = 4 - j
        src = f"neck.fusion_stage.layers.{j}"
        dst = f"depth_head.scratch.refinenet{k}"
        out[f"{dst}.out_conv.weight"] = sd[f"{src}.projection.weight"]
        out[f"{dst}.out_conv.bias"] = sd[f"{src}.projection.bias"]
        for unit, hf_unit in ((1, "residual_layer1"), (2, "residual_layer2")):
            for conv, hf_conv in ((1, "convolution1"), (2, "convolution2")):
                out[f"{dst}.resConfUnit{unit}.conv{conv}.weight"] = \
                    sd[f"{src}.{hf_unit}.{hf_conv}.weight"]
                out[f"{dst}.resConfUnit{unit}.conv{conv}.bias"] = \
                    sd[f"{src}.{hf_unit}.{hf_conv}.bias"]
    out["depth_head.scratch.output_conv1.weight"] = sd["head.conv1.weight"]
    out["depth_head.scratch.output_conv1.bias"] = sd["head.conv1.bias"]
    out["depth_head.scratch.output_conv2.0.weight"] = sd["head.conv2.weight"]
    out["depth_head.scratch.output_conv2.0.bias"] = sd["head.conv2.bias"]
    out["depth_head.scratch.output_conv2.2.weight"] = sd["head.conv3.weight"]
    out["depth_head.scratch.output_conv2.2.bias"] = sd["head.conv3.bias"]
    return {k: v.numpy() for k, v in out.items()}


def test_full_model_matches_transformers_depth_anything():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    bb = transformers.Dinov2Config(
        hidden_size=64, num_hidden_layers=4, num_attention_heads=2,
        intermediate_size=256, patch_size=14, image_size=56,
        layerscale_value=1.0, out_indices=[1, 2, 3, 4],
        apply_layernorm=True, reshape_hidden_states=False)
    cfg = transformers.DepthAnythingConfig(
        backbone_config=bb, depth_estimation_type="metric", max_depth=20.0,
        fusion_hidden_size=32, reassemble_hidden_size=64,
        neck_hidden_sizes=[16, 32, 48, 64], head_hidden_size=32)
    hf = transformers.DepthAnythingForDepthEstimation(cfg).eval()

    sd = hf.state_dict()
    backbone_sd = {k[len("backbone."):]: v for k, v in sd.items()
                   if k.startswith("backbone.")}
    state = hf_to_dav2_state(backbone_sd, depth=4)
    state.update(hf_head_to_dav2(sd))
    params = convert_dav2(state, "vitt")

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 56, 56, 3)).astype(np.float32)

    with torch.no_grad():
        expected = hf(pixel_values=torch.tensor(x.transpose(0, 3, 1, 2))
                      ).predicted_depth.numpy()

    model = build_depth_model("vitt", max_depth=20.0, dtype=jnp.float32)
    with jax.default_matmul_precision("highest"):
        ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))

    assert ours.shape == expected.shape == (2, 56, 56)
    np.testing.assert_allclose(ours, expected, atol=5e-4)
