"""Losses and metrics vs golden values computed with the reference formulas
(torch/numpy re-implementations of /root/reference/lightning_model.py,
pose_estimation_model.py and eval/evaluation.py)."""

import numpy as np
import torch
import jax.numpy as jnp

import e3d_tpu  # noqa: F401
from e3d_tpu.losses import silog_loss, pose_loss
from e3d_tpu.evaluation import (
    compute_depth_errors,
    compute_pose_errors,
    evaluate_trajectory,
    calculate_scale_factor,
)


# ---- golden reference implementations (torch, formulas cited in modules) ----

def ref_silog(pred, target, mask, lambd=0.5):
    pred_t = torch.tensor(pred)
    target_t = torch.tensor(target)
    mask_t = torch.tensor(mask)
    d = torch.log(target_t[mask_t]) - torch.log(pred_t[mask_t])
    return torch.sqrt((d ** 2).mean() - lambd * d.mean() ** 2).item()


def ref_compute_errors(pred, gt):
    pred_t = torch.tensor(pred)
    gt_t = torch.tensor(gt)
    diff = pred_t - gt_t
    eps = 1e-6
    l1 = diff.abs().mean()
    abs_rel = (diff.abs() / (gt_t + eps)).mean()
    rmse = torch.sqrt((diff ** 2).mean())
    thresh = torch.max(gt_t / pred_t, pred_t / gt_t)
    d1 = (thresh < 1.1).float().mean()
    return dict(d1=d1.item(), abs_rel=abs_rel.item(), rmse=rmse.item(),
                l1=l1.item())


def ref_pose_loss(pred, gt, beta=1.0):
    pred_t = torch.tensor(pred)
    gt_t = torch.tensor(gt)
    pt, pq = pred_t[:, :3], pred_t[:, 3:]
    gt_tr, gq = gt_t[:, :3], gt_t[:, 3:]
    eps = 1e-8
    pq_norm = pq.norm(dim=1, keepdim=True)
    reg = torch.exp(-pq_norm).mean()
    pqn = pq / pq.norm(dim=1, keepdim=True).clamp(min=eps)
    gqn = gq / gq.norm(dim=1, keepdim=True).clamp(min=eps)
    scale = gt_tr.norm(dim=1, keepdim=True).clamp(min=eps)
    l_t = ((pt - gt_tr) / scale).pow(2).sum(dim=1).mean()
    dot = (pqn * gqn).sum(dim=1)
    pqn = torch.where(dot.unsqueeze(1) < 0, -pqn, pqn)
    l_r = (1 - (pqn * gqn).sum(dim=1).pow(2)).mean()
    return (l_t + beta * l_r + 0.1 * reg).item()


# ----------------------------- tests -----------------------------------------

def test_silog_matches_reference(rng):
    pred = rng.uniform(0.5, 20.0, size=(2, 1, 32, 32)).astype(np.float32)
    gt = rng.uniform(0.5, 20.0, size=(2, 1, 32, 32)).astype(np.float32)
    mask = (gt > 2.0) & (gt < 18.0)
    ours = float(silog_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask)))
    expected = ref_silog(pred, gt, mask)
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_depth_errors_match_reference(rng):
    pred = rng.uniform(0.5, 20.0, size=(4096,)).astype(np.float32)
    gt = rng.uniform(0.5, 20.0, size=(4096,)).astype(np.float32)
    # make some pixels "close" so d1 is non-trivial
    pred[:2048] = gt[:2048] * rng.uniform(0.95, 1.05, size=2048)
    ours = {k: float(v) for k, v in
            compute_depth_errors(jnp.asarray(pred), jnp.asarray(gt)).items()}
    expected = ref_compute_errors(pred, gt)
    for k in expected:
        np.testing.assert_allclose(ours[k], expected[k], rtol=1e-4, err_msg=k)


def test_depth_errors_masked_equals_indexed(rng):
    pred = rng.uniform(0.5, 20.0, size=(64, 64)).astype(np.float32)
    gt = rng.uniform(0.5, 20.0, size=(64, 64)).astype(np.float32)
    mask = gt > 10.0
    ours = {k: float(v) for k, v in
            compute_depth_errors(jnp.asarray(pred), jnp.asarray(gt),
                                 jnp.asarray(mask)).items()}
    expected = ref_compute_errors(pred[mask], gt[mask])
    for k in expected:
        np.testing.assert_allclose(ours[k], expected[k], rtol=1e-4, err_msg=k)


def test_pose_loss_matches_reference(rng):
    pred = rng.normal(size=(16, 7)).astype(np.float32)
    gt = rng.normal(size=(16, 7)).astype(np.float32)
    gt[:, 3:] /= np.linalg.norm(gt[:, 3:], axis=1, keepdims=True)
    ours = float(pose_loss(jnp.asarray(pred), jnp.asarray(gt), beta=1.0))
    expected = ref_pose_loss(pred, gt, beta=1.0)
    np.testing.assert_allclose(ours, expected, rtol=1e-4)


def test_pose_errors_reasonable(rng):
    gt = rng.normal(size=(32, 7)).astype(np.float32)
    gt[:, 3:] /= np.linalg.norm(gt[:, 3:], axis=1, keepdims=True)
    out = compute_pose_errors(jnp.asarray(gt), jnp.asarray(gt))
    np.testing.assert_allclose(float(out["ate"]), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(out["rte"]), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(out["rote"]), 0.0, atol=0.2)  # arccos near 1


def test_scale_factor(rng):
    gt = rng.normal(size=(32, 7)).astype(np.float32)
    pred = gt.copy()
    pred[:, :3] /= 4.0
    s = float(calculate_scale_factor(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(s, 4.0, rtol=1e-5)


def test_evaluate_trajectory_perfect_prediction(rng):
    rel = rng.normal(size=(50, 7)).astype(np.float32) * 0.1
    rel[:, 3:] += np.array([0, 0, 0, 1], dtype=np.float32)
    rel[:, 3:] /= np.linalg.norm(rel[:, 3:], axis=1, keepdims=True)
    m = evaluate_trajectory(jnp.asarray(rel), jnp.asarray(rel))
    assert float(m["ate"]) < 1e-4
    assert float(m["rte"]) < 1e-4
    assert float(m["rote"]) < 0.5
