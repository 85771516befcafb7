"""OneCycle schedule vs torch.optim.lr_scheduler.OneCycleLR."""

import numpy as np
import torch

import e3d_tpu  # noqa: F401
from e3d_tpu.train import onecycle_schedule


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
