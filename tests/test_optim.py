"""OneCycle schedule vs torch.optim.lr_scheduler.OneCycleLR."""

import numpy as np
import torch

import e3d_tpu  # noqa: F401
from e3d_tpu.train import onecycle_schedule
from e3d_tpu.train.optim import onecycle_momentum_schedule


def test_onecycle_matches_torch():
    total_steps = 120
    for max_lr, pct_start, div_factor in [(5e-5, 0.1, 1e9), (1e-4, 0.3, 25.0),
                                          (5e-6, 0.05, 1e9)]:
        opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=max_lr)
        sched = torch.optim.lr_scheduler.OneCycleLR(
            opt, max_lr=max_lr, total_steps=total_steps,
            pct_start=pct_start, div_factor=div_factor, cycle_momentum=False)
        ours = onecycle_schedule(max_lr, total_steps, pct_start, div_factor)
        torch_lrs, our_lrs = [], []
        for step in range(total_steps):
            torch_lrs.append(opt.param_groups[0]["lr"])
            our_lrs.append(float(ours(step)))
            opt.step()
            sched.step()
        np.testing.assert_allclose(our_lrs, torch_lrs, rtol=1e-5, atol=1e-12)


def test_onecycle_momentum_matches_torch():
    """cycle_momentum=True cycles Adam's beta1 inversely to the LR
    (reference pose recipe, pose_estimation.yaml cycle_momentum: True);
    includes the degenerate tiny-total_steps case (warmup end < step 0)."""
    for total_steps, pct_start in [(120, 0.3), (120, 0.1), (3, 0.3),
                                   (5, 0.4)]:
        opt = torch.optim.AdamW([torch.nn.Parameter(torch.zeros(1))],
                                lr=1e-3)
        sched = torch.optim.lr_scheduler.OneCycleLR(
            opt, max_lr=1e-3, total_steps=total_steps, pct_start=pct_start,
            div_factor=25.0, cycle_momentum=True)
        ours = onecycle_momentum_schedule(total_steps, pct_start)
        torch_m, our_m = [], []
        for step in range(total_steps):
            torch_m.append(opt.param_groups[0]["betas"][0])
            our_m.append(float(ours(step)))
            opt.step()
            sched.step()
        np.testing.assert_allclose(our_m, torch_m, rtol=1e-5, atol=1e-7)
