"""Model shape/structure tests + converter round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import e3d_tpu  # noqa: F401
from e3d_tpu.models import build_depth_model, PoseEstimationNet
from e3d_tpu.models.convert import (
    convert_dav2,
    convert_pose_net,
    synthetic_dav2_state_dict,
)


def tree_shapes(tree):
    return jax.tree_util.tree_map(lambda x: tuple(x.shape), tree)


def test_depth_model_forward_tiny():
    model = build_depth_model("vitt", max_depth=20.0, dtype=jnp.float32)
    x = jnp.zeros((2, 56, 56, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    y = model.apply({"params": params}, x)
    assert y.shape == (2, 56, 56)
    assert y.dtype == jnp.float32
    y = np.asarray(y)
    assert (y >= 0).all() and (y <= 20.0).all()


@pytest.mark.parametrize("encoder", ["vits"])
def test_depth_model_forward_and_convert(encoder):
    model = build_depth_model(encoder, max_depth=20.0, dtype=jnp.float32)
    x = jnp.zeros((1, 126, 126, 3), jnp.float32)  # 9x9 patch grid
    init_params = model.init(jax.random.PRNGKey(0), x)["params"]

    state = synthetic_dav2_state_dict(encoder)
    converted = convert_dav2(state, encoder)

    # Converted tree must exactly match the model's parameter tree.
    init_s = tree_shapes(init_params)
    conv_s = tree_shapes(converted)
    flat_init = dict(jax.tree_util.tree_flatten_with_path(init_s)[0])
    flat_conv = dict(jax.tree_util.tree_flatten_with_path(conv_s)[0])
    assert set(flat_init) == set(flat_conv), (
        set(flat_init) ^ set(flat_conv))
    for k in flat_init:
        assert flat_init[k] == flat_conv[k], (k, flat_init[k], flat_conv[k])

    # And the converted weights must run.
    y = model.apply({"params": converted}, x)
    assert y.shape == (1, 126, 126)
    assert np.isfinite(np.asarray(y)).all()


def test_encoder_only_filter():
    state = synthetic_dav2_state_dict("vitt")
    params = convert_dav2(state, "vitt", encoder_only=True)
    assert "pretrained" in params and "depth_head" not in params


def test_pose_net_forward_shapes():
    model = PoseEstimationNet(in_channels=8)
    x = jnp.zeros((2, 224, 224, 8), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 7)
    # train mode mutates batch_stats and needs dropout rng
    y2, mutated = model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    assert y2.shape == (2, 7)
    assert "batch_stats" in mutated


def test_pose_net_convert_roundtrip():
    """Synthetic torch-format pose state dict -> same tree as model.init."""
    rng = np.random.default_rng(0)

    def r(*shape):
        return rng.normal(size=shape).astype(np.float32) * 0.02

    state = {
        "backbone.conv1.weight": r(64, 8, 7, 7),
        "backbone.bn1.weight": 1 + r(64), "backbone.bn1.bias": r(64),
        "backbone.bn1.running_mean": r(64),
        "backbone.bn1.running_var": 1 + np.abs(r(64)),
        "backbone.fc.weight": r(256, 512), "backbone.fc.bias": r(256),
        "pose_head.2.weight": r(128, 256), "pose_head.2.bias": r(128),
        "pose_head.5.weight": r(64, 128), "pose_head.5.bias": r(64),
        "pose_head.8.weight": r(7, 64), "pose_head.8.bias": r(7),
    }
    planes = {1: (64, 64), 2: (64, 128), 3: (128, 256), 4: (256, 512)}
    for layer, (cin, cout) in planes.items():
        for j in range(2):
            b = f"backbone.layer{layer}.{j}"
            first_in = cin if j == 0 else cout
            state[f"{b}.conv1.weight"] = r(cout, first_in, 3, 3)
            state[f"{b}.conv2.weight"] = r(cout, cout, 3, 3)
            for bn in ("bn1", "bn2"):
                state[f"{b}.{bn}.weight"] = 1 + r(cout)
                state[f"{b}.{bn}.bias"] = r(cout)
                state[f"{b}.{bn}.running_mean"] = r(cout)
                state[f"{b}.{bn}.running_var"] = 1 + np.abs(r(cout))
            if j == 0 and cin != cout:
                state[f"{b}.downsample.0.weight"] = r(cout, cin, 1, 1)
                state[f"{b}.downsample.1.weight"] = 1 + r(cout)
                state[f"{b}.downsample.1.bias"] = r(cout)
                state[f"{b}.downsample.1.running_mean"] = r(cout)
                state[f"{b}.downsample.1.running_var"] = 1 + np.abs(r(cout))

    converted = convert_pose_net(state)
    model = PoseEstimationNet(in_channels=8)
    x = jnp.zeros((1, 64, 64, 8), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    for coll in ("params", "batch_stats"):
        flat_init = dict(jax.tree_util.tree_flatten_with_path(
            tree_shapes(variables[coll]))[0])
        flat_conv = dict(jax.tree_util.tree_flatten_with_path(
            tree_shapes(converted[coll]))[0])
        assert set(flat_init) == set(flat_conv), (
            coll, set(flat_init) ^ set(flat_conv))
        for k in flat_init:
            assert flat_init[k] == flat_conv[k], (coll, k)

    y = model.apply(converted, x, train=False)
    assert y.shape == (1, 7)


def test_conv_bn_matches_torch(rng):
    """First-layer conv+BN numerics vs torch functional golden values."""
    import torch
    import torch.nn.functional as F

    x = rng.normal(size=(2, 8, 17, 17)).astype(np.float32)
    w = rng.normal(size=(4, 8, 7, 7)).astype(np.float32) * 0.1
    gamma = rng.normal(size=4).astype(np.float32)
    beta = rng.normal(size=4).astype(np.float32)
    mean = rng.normal(size=4).astype(np.float32)
    var = np.abs(rng.normal(size=4)).astype(np.float32) + 0.5

    yt = F.conv2d(torch.tensor(x), torch.tensor(w), stride=2, padding=3)
    yt = F.batch_norm(yt, torch.tensor(mean), torch.tensor(var),
                      torch.tensor(gamma), torch.tensor(beta),
                      training=False, eps=1e-5).numpy()

    import flax.linen as nn

    class Mini(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(4, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                        name="conv1")(x)
            return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                                momentum=0.9, name="bn1")(x)

    variables = {
        "params": {
            "conv1": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))},
            "bn1": {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta)},
        },
        "batch_stats": {"bn1": {"mean": jnp.asarray(mean),
                                "var": jnp.asarray(var)}},
    }
    with jax.default_matmul_precision("highest"):
        ours = Mini().apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    ours = np.asarray(ours).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, yt, atol=2e-4)


def test_packed_stride2_conv_matches_plain_conv():
    """PackedStride2Conv == nn.Conv(F, (3,3), pad 1) + its per-phase
    pointwise head == nn.Conv(1, (1,1)), including gradients.

    The packed form exists purely for MXU lane utilization at the 518 px
    tail (models/dpt.py); this pins the exact-equivalence claim at several
    even sizes.
    """
    import flax.linen as nn

    from e3d_tpu.models.dpt import (
        PackedPointwiseHead,
        PackedStride2Conv,
        _depth_to_space2,
    )

    rng = np.random.default_rng(0)
    for (h, w, cin, feat) in [(14, 14, 16, 8), (28, 42, 8, 4)]:
        x = jnp.asarray(rng.normal(size=(2, h, w, cin)), jnp.float32)

        packed = PackedStride2Conv(feat, dtype=jnp.float32)
        pvars = packed.init(jax.random.PRNGKey(1), x)
        plain = nn.Conv(feat, (3, 3), padding=1, dtype=jnp.float32,
                        param_dtype=jnp.float32)
        y_ref = plain.apply({"params": pvars["params"]}, x)

        y_pk = packed.apply(pvars, x)
        b, h2, w2, _ = y_pk.shape
        assert (h2, w2) == (h // 2, w // 2)
        y_un = y_pk.reshape(b, h2, w2, 2, 2, feat).transpose(
            0, 1, 3, 2, 4, 5).reshape(b, h, w, feat)
        np.testing.assert_allclose(np.asarray(y_un), np.asarray(y_ref),
                                   atol=1e-5)

        # Per-phase pointwise head == 1x1 conv on the unpacked layout.
        head = PackedPointwiseHead(feat)
        hvars = head.init(jax.random.PRNGKey(2),
                          jnp.zeros((1, 2, 2, 4 * feat)))
        z_pk = _depth_to_space2(head.apply(hvars, y_pk))
        plain_head = nn.Conv(1, (1, 1), dtype=jnp.float32,
                             param_dtype=jnp.float32)
        z_ref = plain_head.apply({"params": hvars["params"]}, y_ref)
        np.testing.assert_allclose(np.asarray(z_pk), np.asarray(z_ref),
                                   atol=1e-5)

        # Gradients w.r.t. the shared kernel agree.
        def loss_packed(p):
            return jnp.sum(packed.apply({"params": p}, x) ** 2)

        def loss_plain(p):
            return jnp.sum(plain.apply({"params": p}, x) ** 2)

        g_pk = jax.grad(loss_packed)(pvars["params"])
        g_pl = jax.grad(loss_plain)(pvars["params"])
        np.testing.assert_allclose(np.asarray(g_pk["kernel"]),
                                   np.asarray(g_pl["kernel"]), atol=1e-3)
