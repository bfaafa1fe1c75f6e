"""Golden tests for the remaining criterion losses vs direct torch math."""
import dataclasses

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from rba_tpu.config import OODConfig, tiny_test_config
from rba_tpu.train.criterion import (
    _gaussian_blur_2d,
    densehybrid_loss,
    gambler_loss,
    loss_labels,
    smoothness_loss,
    sparsity_loss,
)


def test_loss_labels_matches_torch_weighted_ce(rng):
    cfg = tiny_test_config()
    k = cfg.num_classes
    b, q, t = 2, 10, 4
    pred_logits = rng.randn(b, q, k + 1).astype(np.float32)
    gt_labels = rng.randint(0, k, (b, t)).astype(np.int32)
    gt_valid = np.array([[1, 1, 1, 0], [1, 0, 0, 0]], np.float32)
    assignment = np.stack([rng.permutation(q)[:t] for _ in range(b)]).astype(np.int32)

    got = float(
        loss_labels(cfg, jnp.asarray(pred_logits), jnp.asarray(gt_labels),
                    jnp.asarray(gt_valid), jnp.asarray(assignment))
    )

    target = np.full((b, q), k, np.int64)
    for i in range(b):
        for j in range(t):
            if gt_valid[i, j]:
                target[i, assignment[i, j]] = gt_labels[i, j]
    weight = torch.ones(k + 1)
    weight[-1] = cfg.loss.no_object_weight
    want = F.cross_entropy(
        torch.from_numpy(pred_logits).transpose(1, 2), torch.from_numpy(target), weight
    )
    np.testing.assert_allclose(got, float(want), rtol=1e-5)


def _sem_logits_torch(pred_logits, pred_masks, keep_void=False):
    cls = torch.softmax(torch.from_numpy(pred_logits), -1)
    if not keep_void:
        cls = cls[..., :-1]
    m = torch.from_numpy(pred_masks).sigmoid()
    return torch.einsum("bqc,bqhw->bchw", cls, m)


def test_smoothness_loss_matches_torch(rng):
    cfg = dataclasses.replace(
        tiny_test_config(), ood=OODConfig(smoothness_loss=True, smoothness_score="nls")
    )
    b, q, k, h, w = 2, 6, cfg.num_classes, 8, 10
    pl_ = rng.randn(b, q, k + 1).astype(np.float32)
    pm = rng.randn(b, q, h, w).astype(np.float32)
    got = float(smoothness_loss(cfg, jnp.asarray(pl_), jnp.asarray(pm)))

    logits = _sem_logits_torch(pl_, pm)
    score = -logits.sum(dim=1)
    sh = torch.zeros_like(score)
    sh[:, :-1, :] = score[:, 1:, :]
    sh[:, -1, :] = score[:, -1, :]
    sw = torch.zeros_like(score)
    sw[:, :, :-1] = score[:, :, 1:]
    sw[:, :, -1] = score[:, :, -1]
    want = (torch.sum((sh - score) ** 2) + torch.sum((sw - score) ** 2)) / 2
    np.testing.assert_allclose(got, float(want), rtol=1e-4)


def test_sparsity_loss_matches_torch(rng):
    cfg = tiny_test_config()
    b, q, k, h, w = 1, 6, cfg.num_classes, 8, 10
    pl_ = rng.randn(b, q, k + 1).astype(np.float32)
    pm = rng.randn(b, q, h, w).astype(np.float32)
    om = rng.choice([0, 1, 255], size=(b, 16, 20), p=[0.6, 0.3, 0.1]).astype(np.int32)
    got = float(sparsity_loss(cfg, jnp.asarray(pl_), jnp.asarray(pm), jnp.asarray(om)))

    logits = _sem_logits_torch(pl_, pm)
    score = -logits.sum(dim=1)
    score = F.interpolate(score.unsqueeze(1), size=(16, 20), mode="bilinear",
                          align_corners=True).squeeze(1)
    ood = torch.from_numpy(om) == 1
    # reference criterion.py:318: torch.norm over the flattened OOD pixels
    # (dim=0 of a 1-D tensor), whose outer mean() is a no-op on the scalar
    want = torch.norm(score[ood], dim=0).mean()
    np.testing.assert_allclose(got, float(want), rtol=1e-4)


def _torch_gaussian_blur(x: torch.Tensor, ksize=7, sigma=1.0) -> torch.Tensor:
    """torchvision GaussianBlur semantics: separable kernel, reflect pad."""
    half = ksize // 2
    g = torch.exp(-0.5 * (torch.arange(ksize, dtype=torch.float32) - half) ** 2 / sigma**2)
    g = g / g.sum()
    k2d = torch.outer(g, g)[None, None]
    b = x.shape[0]
    xp = F.pad(x.unsqueeze(1), (half, half, half, half), mode="reflect")
    return F.conv2d(xp, k2d).squeeze(1)


def test_gaussian_blur_matches_torch_reference(rng):
    x = rng.randn(2, 16, 20).astype(np.float32)
    got = np.asarray(_gaussian_blur_2d(jnp.asarray(x), 7, 1.0))
    want = _torch_gaussian_blur(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_gambler_loss_matches_torch(rng):
    cfg = dataclasses.replace(tiny_test_config(), ood=OODConfig(gambler_loss=True))
    k = cfg.num_classes
    b, q, h, w = 1, 6, 8, 10
    pl_ = rng.randn(b, q, k + 1).astype(np.float32)
    pm = rng.randn(b, q, h, w).astype(np.float32)
    H, W = 16, 20
    om = rng.choice([0, 1, 255], size=(b, H, W), p=[0.7, 0.2, 0.1]).astype(np.int32)
    sem = rng.randint(0, k, (b, H, W)).astype(np.int32)
    got = float(
        gambler_loss(cfg, jnp.asarray(pl_), jnp.asarray(pm), jnp.asarray(om), jnp.asarray(sem))
    )

    # torch reference (criterion.py:323-388)
    logits = _sem_logits_torch(pl_, pm, keep_void=True)
    logits = F.interpolate(logits, size=(H, W), mode="bilinear", align_corners=True)
    probs = logits.softmax(dim=1)
    true_pred, reservation = probs[:, :-1], probs[:, -1]
    reward = torch.logsumexp(logits[:, :-1], dim=1).pow(2)
    reward = _torch_gaussian_blur(reward)
    ood_mask = torch.from_numpy(om) == 1
    void_mask = torch.from_numpy(om) == 255
    labels = torch.from_numpy(sem.astype(np.int64)).clone()
    reservation = reservation / reward
    boost = torch.clamp(
        true_pred + reservation.unsqueeze(1), min=1e-7
    ).log()[ood_mask.unsqueeze(1).repeat(1, k, 1, 1)]
    g_out = cfg.ood.ood_reg * boost
    labels[void_mask] = 0
    labels[ood_mask] = 0
    g_in = torch.gather(true_pred, index=labels.unsqueeze(1), dim=1).squeeze(1)
    g_in = (g_in + reservation)[(~ood_mask) & (~void_mask)].log()
    want = -(g_in.mean() + g_out.mean())
    np.testing.assert_allclose(got, float(want), rtol=1e-3, atol=1e-4)


def test_densehybrid_loss_matches_torch(rng):
    cfg = dataclasses.replace(tiny_test_config(), ood=OODConfig(densehybrid_loss=True))
    k = cfg.num_classes
    b, q, h, w = 1, 6, 8, 10
    pl_ = rng.randn(b, q, k + 1).astype(np.float32)
    pm = rng.randn(b, q, h, w).astype(np.float32)
    ood_pred = rng.randn(b, 2, h, w).astype(np.float32)
    H, W = 16, 20
    sem = rng.randint(0, k, (b, H, W)).astype(np.int32)
    sem[0, :2] = 254  # OOD region
    sem[0, 2:3] = 255  # ignore
    om = np.zeros((b, H, W), np.int32)
    om[sem == 254] = 1
    om[sem == 255] = 255

    got = float(
        densehybrid_loss(cfg, jnp.asarray(pl_), jnp.asarray(pm), jnp.asarray(ood_pred),
                         jnp.asarray(om), jnp.asarray(sem))
    )

    logits = _sem_logits_torch(pl_, pm)
    logits = F.interpolate(logits, size=(H, W), mode="bilinear", align_corners=True)
    lo = F.interpolate(torch.from_numpy(ood_pred), size=(H, W), mode="bilinear",
                       align_corners=True)
    cls_out = F.log_softmax(logits, dim=1)
    ood_out = F.log_softmax(lo, dim=1)
    labels = torch.from_numpy(sem.astype(np.int64)).clone()
    label_ood = torch.zeros_like(labels)
    label_ood[labels == 254] = 1
    lse = torch.logsumexp(logits, dim=1) * label_ood
    # get_batch_avg (criterion.py:93-97), added detached at :423
    reg = -logits.mean(1).mean().view(1, 1, 1).repeat(*labels.shape) * label_ood
    loss_ood = (lse + reg.detach()).sum() / label_ood[label_ood == 1].numel()
    labels[labels == 255] = k
    labels[labels == 254] = k
    loss_seg = F.nll_loss(cls_out, labels, ignore_index=k)
    loss_th = F.nll_loss(ood_out, label_ood, ignore_index=2)
    want = loss_seg + cfg.ood.densehybrid_beta * loss_ood + cfg.ood.densehybrid_beta * 10 * loss_th
    np.testing.assert_allclose(got, float(want), rtol=1e-3, atol=1e-4)
