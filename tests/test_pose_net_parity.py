"""Numerical parity of PoseEstimationNet vs a torch ResNet-18 golden model.

torchvision is not installed in this image, so the golden model is a
minimal torch implementation of the same architecture (the reference's
``PoseEstimationNet``: torchvision resnet18 with an 8-channel stem,
fc->256 and the 256->128->64->7 dropout MLP head,
``pose_estimation_model.py:35-105``). Weights are exported in the
reference naming and run through ``convert_pose_net``.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import e3d_tpu  # noqa: F401
from e3d_tpu.models import PoseEstimationNet
from e3d_tpu.models.convert import convert_pose_net


def build_torch_model(torch, nn):
    class BasicBlock(nn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False),
                    nn.BatchNorm2d(cout))

        def forward(self, x):
            idt = x
            out = torch.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                idt = self.downsample(x)
            return torch.relu(out + idt)

    class Backbone(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(8, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = nn.Sequential(BasicBlock(64, 64),
                                        BasicBlock(64, 64))
            self.layer2 = nn.Sequential(BasicBlock(64, 128, 2),
                                        BasicBlock(128, 128))
            self.layer3 = nn.Sequential(BasicBlock(128, 256, 2),
                                        BasicBlock(256, 256))
            self.layer4 = nn.Sequential(BasicBlock(256, 512, 2),
                                        BasicBlock(512, 512))
            self.fc = nn.Linear(512, 256)

        def forward(self, x):
            x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            x = x.mean(dim=(2, 3))
            return self.fc(x)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = Backbone()
            self.pose_head = nn.Sequential(
                nn.ReLU(), nn.Dropout(0.3), nn.Linear(256, 128),
                nn.ReLU(), nn.Dropout(0.2), nn.Linear(128, 64),
                nn.ReLU(), nn.Dropout(0.1), nn.Linear(64, 7))

        def forward(self, x):
            return self.pose_head(self.backbone(x))

    return Net()


def test_pose_net_matches_torch_golden(rng):
    torch = pytest.importorskip("torch")
    from torch import nn as tnn

    torch.manual_seed(0)
    net = build_torch_model(torch, tnn).eval()
    # Perturb BN running stats so eval-mode normalization is non-trivial.
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    state = {k: v.detach().numpy() for k, v in net.state_dict().items()
             if "num_batches_tracked" not in k}
    variables = convert_pose_net(state)

    x = rng.normal(size=(2, 112, 112, 8)).astype(np.float32)
    with torch.no_grad():
        expected = net(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()

    model = PoseEstimationNet(in_channels=8)
    with jax.default_matmul_precision("highest"):
        ours = np.asarray(model.apply(variables, jnp.asarray(x),
                                      train=False))
    np.testing.assert_allclose(ours, expected, atol=2e-4)
