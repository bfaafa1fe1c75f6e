"""Hungarian matcher — batched, on-device, exact.

Behavioral spec: /root/reference/mask2former/modeling/matcher.py
(HungarianMatcher.memory_efficient_forward :96-156): per-image cost =
class_weight·(-softmax prob of the target class)
+ mask_weight·point-sampled sigmoid-CE + dice_weight·point-sampled dice,
with ONE shared set of uniform random points per image, then exact LSAP.

TPU-native differences: targets are padded to a static T per image
(invalid rows get a constant cost and are ignored downstream via gt_valid);
the assignment runs on-device through the JAX Jonker–Volgenant solver
(rba_tpu/ops/lsap.py) instead of a host scipy sync; everything is batched.

Also provides FixedMatcher (query i ↔ class i, reference matcher.py:191-221).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import LossConfig
from ..ops.lsap import batched_linear_sum_assignment
from ..ops.point_sample import point_sample

INVALID_COST = 1e6


def _batch_sigmoid_ce_cost(out_points: jax.Array, tgt_points: jax.Array) -> jax.Array:
    """(B, Q, P) logits × (B, T, P) binary targets → (B, Q, T) mean-over-point
    BCE cost, via the pos/neg matmul decomposition."""
    p = out_points.shape[-1]
    pos = jax.nn.softplus(-out_points)  # BCE(x, 1)
    neg = jax.nn.softplus(out_points)  # BCE(x, 0)
    cost = jnp.einsum("bqp,btp->bqt", pos, tgt_points) + jnp.einsum(
        "bqp,btp->bqt", neg, 1.0 - tgt_points
    )
    return cost / p


def _batch_dice_cost(out_points: jax.Array, tgt_points: jax.Array) -> jax.Array:
    probs = jax.nn.sigmoid(out_points)
    numerator = 2.0 * jnp.einsum("bqp,btp->bqt", probs, tgt_points)
    denominator = probs.sum(-1)[:, :, None] + tgt_points.sum(-1)[:, None, :]
    return 1.0 - (numerator + 1.0) / (denominator + 1.0)


def hungarian_match(
    rng: jax.Array,
    cfg: LossConfig,
    pred_logits: jax.Array,  # (B, Q, K+1)
    pred_masks: jax.Array,  # (B, Q, h, w)
    gt_labels: jax.Array,  # (B, T) int
    gt_masks: jax.Array,  # (B, T, H, W) float 0/1
    gt_valid: jax.Array,  # (B, T) float 0/1
) -> jax.Array:
    """Returns (B, T) assigned query index per (padded) target."""
    b, q, _ = pred_logits.shape
    t = gt_labels.shape[1]
    if t > q:
        raise ValueError(
            f"padded target count ({t}) must be <= num_queries ({q}): every "
            "target needs a distinct query; lower MapperConfig.max_instances"
        )

    out_prob = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)
    cost_class = -jnp.take_along_axis(out_prob, gt_labels[:, None, :], axis=2)  # (B, Q, T)

    coords = jax.random.uniform(rng, (b, cfg.train_num_points, 2))
    out_points = point_sample(pred_masks.astype(jnp.float32), coords)  # (B, Q, P)
    tgt_points = point_sample(gt_masks.astype(jnp.float32), coords)  # (B, T, P)

    cost = (
        cfg.mask_weight * _batch_sigmoid_ce_cost(out_points, tgt_points)
        + cfg.class_weight * cost_class
        + cfg.dice_weight * _batch_dice_cost(out_points, tgt_points)
    )
    cost = jnp.transpose(cost, (0, 2, 1))  # (B, T, Q): rows = targets
    cost = jnp.where(gt_valid[:, :, None] > 0, cost, INVALID_COST)
    cost = jax.lax.stop_gradient(cost)
    return batched_linear_sum_assignment(cost)


def fixed_match(gt_labels: jax.Array, num_queries: int) -> jax.Array:
    """FixedMatcher: target with class c is matched to query c
    (reference matcher.py:191-221)."""
    return jnp.clip(gt_labels, 0, num_queries - 1)
