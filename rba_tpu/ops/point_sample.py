"""PointRend-style point sampling for mask losses.

Behavioral spec: detectron2.projects.point_rend.point_features.point_sample
(grid_sample with align_corners=False on coords*2-1) as used by the
reference criterion (/root/reference/mask2former/modeling/criterion.py:
194-243) and matcher (/root/reference/mask2former/modeling/matcher.py:
96-156), plus the uncertainty-based point selection
(get_uncertain_point_coords_with_randomness; uncertainty = -|logit|).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def point_sample(masks: jax.Array, coords: jax.Array) -> jax.Array:
    """Bilinearly sample (..., H, W) mask logits at normalized [0,1] coords.

    masks: (B, Q, H, W); coords: (B, P, 2) as (x, y) in [0,1].
    Returns (B, Q, P).  Matches F.grid_sample(align_corners=False,
    padding_mode="zeros") on grid coords*2-1.
    """
    b, q, h, w = masks.shape
    x = coords[..., 0] * w - 0.5  # (B, P)
    y = coords[..., 1] * h - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0)[:, None, :]  # (B, 1, P)
    ty = (y - y0)[:, None, :]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = masks.reshape(b, q, h * w)

    def corner(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)  # (B, P)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        v = jnp.take_along_axis(flat, idx[:, None, :], axis=2)  # (B, Q, P)
        return jnp.where(valid[:, None, :], v, 0.0)

    return (
        corner(y0i, x0i) * (1 - tx) * (1 - ty)
        + corner(y0i, x0i + 1) * tx * (1 - ty)
        + corner(y0i + 1, x0i) * (1 - tx) * ty
        + corner(y0i + 1, x0i + 1) * tx * ty
    )


def uncertain_point_coords(
    rng: jax.Array,
    mask_logits: jax.Array,  # (B, Q_matched, H, W) — logits of matched preds
    num_points: int,
    oversample_ratio: float,
    importance_sample_ratio: float,
) -> jax.Array:
    """Importance sampling of point coordinates: oversample uniformly, keep
    the most uncertain (|logit| smallest) importance fraction, fill the rest
    with fresh uniform points.  Returns (B, num_points, 2)."""
    b = mask_logits.shape[0]
    n_sampled = int(num_points * oversample_ratio)
    k1, k2 = jax.random.split(rng)
    coords = jax.random.uniform(k1, (b, n_sampled, 2))
    logits = point_sample(mask_logits, coords)  # (B, Q, P)
    # uncertainty per point: -|logit| of the (single) matched channel; when
    # multiple channels are passed, follow D2 and use channel 0
    uncertainty = -jnp.abs(logits[:, 0, :])  # (B, P)
    n_uncertain = int(importance_sample_ratio * num_points)
    n_random = num_points - n_uncertain
    _, idx = jax.lax.top_k(uncertainty, n_uncertain)
    chosen = jnp.take_along_axis(coords, idx[..., None], axis=1)
    if n_random > 0:
        rand = jax.random.uniform(k2, (b, n_random, 2))
        chosen = jnp.concatenate([chosen, rand], axis=1)
    return chosen
