"""SetCriterion: mask-classification losses + RbA outlier-exposure losses.

Behavioral spec: /root/reference/mask2former/modeling/criterion.py
  * loss_labels — weighted CE with no-object weight 0.1 (:174-192)
  * loss_masks — PointRend-sampled sigmoid-CE + dice at 12544 points
    (:194-243; sigmoid_ce_loss/dice_loss :38-95)
  * outlier_loss — the RbA OOD-finetuning loss: score from the class⊗mask
    einsum, pushed below the inlier threshold / above the outlier threshold
    via squared hinge (or bce/mse/l1 variants) (:435-553)
  * smoothness_loss (:245-281), sparsity_loss (:283-321)
  * gambler_loss (PEBAL, :323-388), densehybrid_loss (:390-433)
  * forward — matching + num_masks normalization (all-reduced in the
    reference :596-603; here the pjit global batch view makes the global
    sum automatic) and per-aux-layer deep supervision (:611-622)

All losses take padded, static-shape targets:
  gt_labels (B, T) int32; gt_masks (B, T, H, W) f32; gt_valid (B, T) f32;
  optional outlier_masks (B, H, W) int32 in {0, 1, 255};
  optional sem_seg (B, H, W) int32 labels.
Boolean-indexing reductions of the reference become masked sums.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..config import RbAConfig
from ..ops.point_sample import point_sample, uncertain_point_coords
from ..ops.resize import resize_bilinear
from .matcher import hungarian_match


def _masked_mean(x, mask, eps=1e-12):
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), eps)


def loss_labels(cfg: RbAConfig, pred_logits, gt_labels, gt_valid, assignment):
    """Weighted cross-entropy over all queries; unmatched queries get the
    no-object class with weight eos_coef."""
    b, q, kp1 = pred_logits.shape
    k = cfg.num_classes
    # scatter matched target classes into a (B, Q) map initialised to K
    target = jnp.full((b, q), k, jnp.int32)
    bidx = jnp.arange(b)[:, None]
    # only scatter valid targets; invalid ones write their (clipped) query
    # with the no-object class, which is a no-op value-wise unless a valid
    # target also claims it — scatter valid ones last
    safe_q = jnp.where(gt_valid > 0, assignment, 0)
    updates = jnp.where(gt_valid > 0, gt_labels, k).astype(jnp.int32)
    # write invalid entries to query 0 with value k could clobber a valid
    # match on query 0 — instead scatter with min-mode trick: valid labels
    # are < k, no-object is k, and each query has at most one valid target.
    target = target.at[bidx, safe_q].min(updates)

    logp = jax.nn.log_softmax(pred_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, target[..., None], axis=2)[..., 0]  # (B, Q)
    w = jnp.where(target == k, cfg.loss.no_object_weight, 1.0)
    return jnp.sum(nll * w) / jnp.sum(w)


def loss_masks(cfg: RbAConfig, rng, pred_masks, gt_masks, gt_valid, assignment, num_masks):
    """Point-sampled sigmoid-CE + dice over matched (query, target) pairs."""
    b, q, h, w = pred_masks.shape
    t = gt_masks.shape[1]
    bidx = jnp.arange(b)[:, None]
    src = pred_masks[bidx, assignment].astype(jnp.float32)  # (B, T, h, w)

    n = b * t
    src_flat = src.reshape(n, 1, h, w)
    tgt_flat = gt_masks.reshape(n, 1, gt_masks.shape[2], gt_masks.shape[3]).astype(jnp.float32)

    coords = uncertain_point_coords(
        rng,
        jax.lax.stop_gradient(src_flat),
        cfg.loss.train_num_points,
        cfg.loss.oversample_ratio,
        cfg.loss.importance_sample_ratio,
    )
    point_logits = point_sample(src_flat, coords)[:, 0]  # (N, P)
    point_labels = jax.lax.stop_gradient(point_sample(tgt_flat, coords)[:, 0])

    valid = gt_valid.reshape(n)

    # sigmoid CE (exact BCE-with-logits, soft labels from bilinear sampling):
    # mean over points, sum over valid masks / num_masks
    ce = jax.nn.softplus(point_logits) - point_logits * point_labels
    loss_mask = jnp.sum(ce.mean(axis=1) * valid) / num_masks

    probs = jax.nn.sigmoid(point_logits)
    numerator = 2.0 * jnp.sum(probs * point_labels, axis=1)
    denominator = probs.sum(axis=1) + point_labels.sum(axis=1)
    dice = 1.0 - (numerator + 1.0) / (denominator + 1.0)
    loss_dice = jnp.sum(dice * valid) / num_masks
    return loss_mask, loss_dice


def _semantic_logits(pred_logits, pred_masks, drop_void=True):
    cls = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)
    if drop_void:
        cls = cls[..., :-1]
    masks = jax.nn.sigmoid(pred_masks.astype(jnp.float32))
    return jnp.einsum("bqc,bqhw->bchw", cls, masks)


def _ood_score(cfg: RbAConfig, logits):
    """Score used as the outlier-loss target (criterion.py:456-472)."""
    target = cfg.ood.outlier_loss_target
    if target == "nls":
        if cfg.ood.score_norm == "sigmoid":
            s = jax.nn.sigmoid(logits)
        elif cfg.ood.score_norm == "tanh":
            s = jnp.tanh(logits)
        else:
            s = logits
        return -s.sum(axis=1)
    if target == "energy":
        return -jax.nn.logsumexp(logits, axis=1)
    if target == "softmax_entropy":
        p = jax.nn.softmax(logits, axis=1)
        return jnp.sum(-p * jnp.log(jnp.clip(p, 1e-20)), axis=1)
    if target == "sum_entropy":
        p = logits / jnp.sum(logits, axis=1, keepdims=True)
        return jnp.sum(-p * jnp.log(jnp.clip(p, 1e-20)), axis=1)
    raise ValueError(f"outlier_loss_target={target}")


def outlier_loss(cfg: RbAConfig, pred_logits, pred_masks, outlier_masks):
    """RbA outlier-exposure loss (squared hinge + variants)."""
    logits = _semantic_logits(pred_logits, pred_masks)
    score = _ood_score(cfg, logits)  # (B, h, w)
    score = resize_bilinear(
        score[:, None], outlier_masks.shape[-2:], align_corners=True
    )[:, 0]

    ood = (outlier_masks == 1).astype(jnp.float32)
    inl = (outlier_masks == 0).astype(jnp.float32)
    has_ood = jnp.sum(ood) > 0

    fn = cfg.ood.outlier_loss_func
    thr_in = cfg.ood.inlier_upper_threshold
    thr_out = cfg.ood.outlier_lower_threshold
    if fn in ("max", "squared_hinge"):
        l_in = _masked_mean(jax.nn.relu(score - thr_in) ** 2, inl)
        l_out = _masked_mean(jax.nn.relu(thr_out - score) ** 2, ood)
        loss = jnp.where(has_ood, 0.5 * (l_in + l_out), l_in)
    elif fn == "binary_cross_entropy":
        bce = jax.nn.softplus(score) - score * ood
        loss = 0.5 * jnp.mean(bce)
    elif fn == "mse":
        l_in = _masked_mean((score - thr_in) ** 2, inl)
        l_out = _masked_mean((score - thr_out) ** 2, ood)
        loss = jnp.where(has_ood, 0.5 * (l_in + l_out), l_in)
    elif fn == "l1":
        l_in = _masked_mean(jnp.abs(score - thr_in), inl)
        l_out = _masked_mean(jnp.abs(score - thr_out), ood)
        loss = jnp.where(has_ood, 0.5 * (l_in + l_out), l_in)
    else:
        raise ValueError(f"outlier_loss_func={fn}")
    return loss


def smoothness_loss(cfg: RbAConfig, pred_logits, pred_masks):
    """Pairwise squared difference of the score map with its h/w-shifted
    self (criterion.py:245-281)."""
    logits = _semantic_logits(pred_logits, pred_masks)
    sc = cfg.ood.smoothness_score if cfg.ood.smoothness_score != "none" else "nls"
    if sc == "nls":
        score = -logits.sum(axis=1)
    elif sc == "energy":
        score = -jax.nn.logsumexp(logits, axis=1)
    else:
        p = jax.nn.softmax(logits, axis=1)
        score = jnp.sum(-p * jnp.log(jnp.clip(p, 1e-20)), axis=1)
    dh = score[:, 1:, :] - score[:, :-1, :]
    dw = score[:, :, 1:] - score[:, :, :-1]
    return 0.5 * (jnp.sum(dh**2) + jnp.sum(dw**2))


def sparsity_loss(cfg: RbAConfig, pred_logits, pred_masks, outlier_masks):
    """L2 norm of the score vector over OOD pixels (criterion.py:283-321).

    The reference computes torch.norm(score[ood_mask], dim=0) — the L2 norm
    of the flattened OOD-pixel scores (its outer mean() is a no-op on the
    resulting scalar) — so the value grows ~sqrt(N_ood)."""
    logits = _semantic_logits(pred_logits, pred_masks)
    sc = cfg.ood.smoothness_score
    if sc == "nls" or sc == "none":
        score = -logits.sum(axis=1)
    elif sc == "energy":
        score = -jax.nn.logsumexp(logits, axis=1)
    else:  # reference falls through to softmax entropy via outlier_loss_target
        p = jax.nn.softmax(logits, axis=1)
        score = jnp.sum(-p * jnp.log(jnp.clip(p, 1e-20)), axis=1)
    score = resize_bilinear(score[:, None], outlier_masks.shape[-2:], align_corners=True)[:, 0]
    ood = (outlier_masks == 1).astype(jnp.float32)
    sq = jnp.sum((score * ood) ** 2)
    # safe sqrt: zero OOD pixels -> 0 with a finite gradient
    return jnp.where(sq > 0, jnp.sqrt(jnp.where(sq > 0, sq, 1.0)), 0.0)


def _gaussian_blur_2d(x, ksize=7, sigma=1.0):
    """(B, H, W) separable Gaussian blur with reflect padding (matching
    torchvision.transforms.GaussianBlur as used in criterion.py:350-353)."""
    import numpy as np

    half = ksize // 2
    g = np.exp(-0.5 * (np.arange(-half, half + 1) / sigma) ** 2)
    g = (g / g.sum()).astype(np.float32)
    kernel = jnp.asarray(g)
    xp = jnp.pad(x, ((0, 0), (half, half), (0, 0)), mode="reflect")
    x = sum(xp[:, i : i + x.shape[1], :] * kernel[i] for i in range(ksize))
    xp = jnp.pad(x, ((0, 0), (0, 0), (half, half)), mode="reflect")
    return sum(xp[:, :, i : i + x.shape[2]] * kernel[i] for i in range(ksize))


def gambler_loss(cfg: RbAConfig, pred_logits, pred_masks, outlier_masks, sem_seg):
    """PEBAL gambler loss (criterion.py:323-388)."""
    k = cfg.num_classes
    cls = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)  # keep void
    masks = jax.nn.sigmoid(pred_masks.astype(jnp.float32))
    logits = jnp.einsum("bqc,bqhw->bchw", cls, masks)
    logits = resize_bilinear(logits, outlier_masks.shape[-2:], align_corners=True)

    probs = jax.nn.softmax(logits, axis=1)
    true_pred, reservation = probs[:, :-1], probs[:, -1]
    reward = jax.nn.logsumexp(logits[:, :-1], axis=1) ** 2
    reward = _gaussian_blur_2d(reward, 7, 1.0)
    reservation = reservation / reward

    ood = outlier_masks == 1
    void = outlier_masks == 255
    labels = jnp.where(void | ood, 0, sem_seg).astype(jnp.int32)
    gathered = jnp.take_along_axis(true_pred, labels[:, None], axis=1)[:, 0]
    g_in = jnp.log(jnp.clip(gathered + reservation, 1e-7))
    in_mask = (~ood) & (~void)
    loss_in = -_masked_mean(g_in, in_mask.astype(jnp.float32))

    boost = jnp.log(jnp.clip(true_pred + reservation[:, None], 1e-7))
    # independent PEBAL_OOD_REG coefficient (reference criterion.py:368);
    # criterion() separately multiplies the whole loss by gambler_weight
    loss_out = -cfg.ood.ood_reg * _masked_mean(
        boost, jnp.broadcast_to(ood[:, None], boost.shape).astype(jnp.float32)
    )
    has_ood = jnp.sum(ood) > 0
    return jnp.where(has_ood, loss_in + loss_out, loss_in)


def densehybrid_loss(cfg: RbAConfig, pred_logits, pred_masks, ood_pred, outlier_masks, sem_seg):
    """DenseHybrid loss (criterion.py:390-433)."""
    k = cfg.num_classes
    logits = _semantic_logits(pred_logits, pred_masks)
    logits = resize_bilinear(logits, outlier_masks.shape[-2:], align_corners=True)
    logits_ood = resize_bilinear(
        ood_pred.astype(jnp.float32), outlier_masks.shape[-2:], align_corners=True
    )

    cls_logp = jax.nn.log_softmax(logits, axis=1)
    ood_logp = jax.nn.log_softmax(logits_ood, axis=1)

    label_ood = (sem_seg == 254).astype(jnp.float32)
    lse = jax.nn.logsumexp(logits, axis=1) * label_ood
    # detached moving-average regulariser (reference get_batch_avg :93-97,
    # added via reg.detach() at :423): shifts the value, not the gradient
    reg = -jax.lax.stop_gradient(jnp.mean(logits)) * label_ood
    loss_ood = jnp.sum(lse + reg) / jnp.maximum(jnp.sum(label_ood), 1.0)

    labels = jnp.where((sem_seg == 255) | (sem_seg == 254), k, sem_seg).astype(jnp.int32)
    valid = (labels < k).astype(jnp.float32)
    nll = -jnp.take_along_axis(cls_logp, jnp.clip(labels, 0, k - 1)[:, None], axis=1)[:, 0]
    loss_seg = _masked_mean(nll, valid)

    # the reference's F.nll_loss(ood_out, label_ood, ignore_index=2) never
    # ignores anything (the 255->2 remap is commented out, criterion.py:428-429)
    # so loss_th averages over ALL pixels, ignore regions included
    nll_th = -jnp.take_along_axis(ood_logp, label_ood.astype(jnp.int32)[:, None], axis=1)[:, 0]
    loss_th = jnp.mean(nll_th)

    beta = cfg.ood.densehybrid_beta
    return loss_seg + beta * loss_ood + beta * 10.0 * loss_th


def criterion(
    cfg: RbAConfig,
    rng: jax.Array,
    outputs: Dict,
    targets: Dict,
) -> Dict[str, jax.Array]:
    """Full loss: Hungarian matching + weighted losses + deep supervision.
    Returns a dict of already-weighted losses plus 'total'."""
    gt_labels = targets["gt_labels"]
    gt_masks = targets["gt_masks"]
    gt_valid = targets["gt_valid"].astype(jnp.float32)

    # global num_masks (pjit global view ≙ the reference's all_reduce)
    num_masks = jnp.maximum(jnp.sum(gt_valid), 1.0)

    losses: Dict[str, jax.Array] = {}
    w = cfg.loss

    def layer_losses(rng, preds, suffix=""):
        r1, r2 = jax.random.split(rng)
        if w.matcher == "FixedMatcher":
            from .matcher import fixed_match

            assignment = fixed_match(gt_labels, preds["pred_logits"].shape[1])
        else:
            assignment = hungarian_match(
                r1, w, preds["pred_logits"], preds["pred_masks"], gt_labels, gt_masks, gt_valid
            )
        lc = loss_labels(cfg, preds["pred_logits"], gt_labels, gt_valid, assignment)
        lm, ld = loss_masks(
            cfg, r2, preds["pred_masks"], gt_masks, gt_valid, assignment, num_masks
        )
        out = {
            f"loss_ce{suffix}": w.class_weight * lc,
            f"loss_mask{suffix}": w.mask_weight * lm,
            f"loss_dice{suffix}": w.dice_weight * ld,
        }
        if cfg.ood.outlier_supervision and "outlier_masks" in targets:
            out[f"outlier_loss{suffix}"] = cfg.ood.outlier_weight * outlier_loss(
                cfg, preds["pred_logits"], preds["pred_masks"], targets["outlier_masks"]
            )
        if cfg.ood.smoothness_loss:
            out[f"smoothness_loss{suffix}"] = cfg.ood.smoothness_weight * smoothness_loss(
                cfg, preds["pred_logits"], preds["pred_masks"]
            )
        if cfg.ood.sparsity_loss and "outlier_masks" in targets:
            out[f"sparsity_loss{suffix}"] = cfg.ood.sparsity_weight * sparsity_loss(
                cfg, preds["pred_logits"], preds["pred_masks"], targets["outlier_masks"]
            )
        return out

    rngs = jax.random.split(rng, 1 + len(outputs.get("aux_outputs", [])) + 1)
    losses.update(layer_losses(rngs[0], outputs))

    if cfg.ood.gambler_loss and "outlier_masks" in targets and "sem_seg" in targets:
        losses["gambler_loss"] = cfg.ood.gambler_weight * gambler_loss(
            cfg, outputs["pred_logits"], outputs["pred_masks"],
            targets["outlier_masks"], targets["sem_seg"],
        )
    if cfg.ood.densehybrid_loss and "ood_pred" in outputs and "sem_seg" in targets:
        losses["densehybrid_loss"] = cfg.ood.densehybrid_weight * densehybrid_loss(
            cfg, outputs["pred_logits"], outputs["pred_masks"], outputs["ood_pred"],
            targets["outlier_masks"], targets["sem_seg"],
        )

    if w.deep_supervision:
        for i, aux in enumerate(outputs.get("aux_outputs", [])):
            losses.update(layer_losses(rngs[1 + i], aux, suffix=f"_{i}"))

    losses["total"] = sum(losses.values())
    return losses
