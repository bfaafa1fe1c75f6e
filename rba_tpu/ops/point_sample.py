"""PointRend-style point sampling for mask losses.

Behavioral spec: detectron2.projects.point_rend.point_features.point_sample
(grid_sample with align_corners=False on coords*2-1) as used by the
reference criterion (/root/reference/mask2former/modeling/criterion.py:
194-243) and matcher (/root/reference/mask2former/modeling/matcher.py:
96-156), plus the uncertainty-based point selection
(get_uncertain_point_coords_with_randomness; uncertainty = -|logit|).

TPU lowering strategy.  Gathers on this hardware are index-rate-bound
(~12 ns/index on HBM operands, CLAUDE.md), and the training criterion's
per-mask sampling is the worst shape for them: (N, P) distinct indices with
a scalar payload each — measured 27.7 ms for ONE oversampled sampling op at
the Swin-B train shapes (16 masks x 37632 points, 128x256 grid), which
multiplied by 10 deep-supervision layers made the criterion ~80% of the
0.5 s/step training cost.  Four lowerings are used, picked per shape:

* shared-coords, many channels (matcher out_points, Q = 100): 2x2
  patch-gather from ops/deform_sampling — one lax.gather index fetches all
  four bilinear corners with a (2, 2, Q) slice whose Q minor axis fills
  lanes (0.27 vs 0.89 ms at the matcher shape).
* per-mask coords, small grid (criterion src at stride 4): separable 2-hot
  matmul — bilinear sampling as two exact contractions on the MXU, zero
  gather indices (the same rewrite that won for deformable attention,
  ops/deform_sampling._onehot_matmul_level).
* per-mask coords, large grid (criterion's full-res gt, Q = 1, B <= 128):
  lane-batched patch gather — one hoisted (H, W, B) transpose shared across
  deep-supervision layers, one (2, 2, B)-slice gather index per point, then
  a one-hot channel select over the small B axis (_point_sample_lanes).
* everything else (matcher tgt, odd shapes): per-corner take_along_axis on
  the (B, Q, H*W) flatten, which keeps H*W in lanes.

Measured dead ends (v5e, this tunnel backend): a (2, 2)-slice single-index
gather on a (B*(H+2), W+2) 2-D operand ran 1928 ms for one criterion layer
and then hard-faulted the TPU worker (tiny-slice gather emitter); the
(2, 2, D) patch gather with D = 1 pads the operand minor dim to the
128-lane tile for a 128x memory blowup (43 -> 1982 ms per loss_masks
layer).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def point_sample(masks: jax.Array, coords: jax.Array) -> jax.Array:
    """Bilinearly sample (..., H, W) mask logits at normalized [0,1] coords.

    masks: (B, Q, H, W); coords: (B, P, 2) as (x, y) in [0,1].
    Returns (B, Q, P).  Matches F.grid_sample(align_corners=False,
    padding_mode="zeros") on grid coords*2-1.  See the module docstring for
    the lowering strategy.
    """
    b, q, h, w = masks.shape
    if q >= 64:
        from .deform_sampling import _bilinear_gather_level_patch

        value = masks.transpose(0, 2, 3, 1)[:, :, :, None, :]  # (B, H, W, 1, Q)
        loc = coords[:, :, None, None, :]  # (B, P, 1, 1, 2)
        out = _bilinear_gather_level_patch(value, loc)  # (B, P, 1, 1, Q)
        return out[:, :, 0, 0, :].transpose(0, 2, 1)  # (B, Q, P)
    if q == 1 and h * w <= 128 * 512:
        return _point_sample_onehot(masks, coords)
    if q == 1 and b <= 128:
        return _point_sample_lanes(masks, coords)
    return _point_sample_corners(masks, coords)


def _point_sample_corners(masks: jax.Array, coords: jax.Array) -> jax.Array:
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


def _point_sample_onehot(masks: jax.Array, coords: jax.Array) -> jax.Array:
    """Q = 1 separable 2-hot matmul: bilinear sampling with ZERO gather
    indices.  out[p] = y2[p, :] @ M @ x2[:, p] where y2/x2 rows carry the
    two bilinear weights at the two corner rows/columns (iota-compare
    construction, so out-of-range corners contribute exactly 0, matching
    grid_sample's zeros padding).  The larger spatial dim is contracted
    first on the MXU (fp32 HIGHEST — exact: every dot row has at most two
    nonzero products); the smaller one is a fused elementwise 2-hot
    multiply+reduce.  P*H*W MXU FLOPs replace 4*P HBM gather indices."""
    b, q, h, w = masks.shape
    m = masks[:, 0].astype(jnp.float32)  # (B, H, W)
    x = coords[..., 0].astype(jnp.float32) * w - 0.5  # (B, P)
    y = coords[..., 1].astype(jnp.float32) * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0)[..., None]  # (B, P, 1)
    ty = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)[..., None]
    y0i = y0.astype(jnp.int32)[..., None]

    iw = jnp.arange(w, dtype=jnp.int32)
    ih = jnp.arange(h, dtype=jnp.int32)
    x2 = (iw == x0i) * (1.0 - tx) + (iw == x0i + 1) * tx  # (B, P, W)
    y2 = (ih == y0i) * (1.0 - ty) + (ih == y0i + 1) * ty  # (B, P, H)

    hi = jax.lax.Precision.HIGHEST
    if w >= h:
        a = jnp.einsum("bpw,bhw->bph", x2, m, precision=hi)  # (B, P, H)
        out = jnp.einsum("bph,bph->bp", a, y2, precision=hi)
    else:
        a = jnp.einsum("bph,bhw->bpw", y2, m, precision=hi)  # (B, P, W)
        out = jnp.einsum("bpw,bpw->bp", a, x2, precision=hi)
    return out[:, None, :].astype(masks.dtype)  # (B, 1, P)


def _point_sample_lanes(masks: jax.Array, coords: jax.Array) -> jax.Array:
    """Q = 1, large grid (the criterion's full-res gt side): batch the B
    masks into the gather slice's lane axis.  The operand is transposed
    once to (H, W, B) — a pure function of the gt masks, so XLA hoists/CSEs
    it across all deep-supervision layers — and every point is ONE
    (2, 2, B)-slice gather index (B*P total, vs 4*B*P scalar indices for
    the corner form); each point then keeps its own mask's channel via a
    one-hot contraction over the small B axis.  The lane padding (B = 16 ->
    128) wastes fetch bandwidth 8x, but the path is index-rate-bound, not
    bandwidth-bound."""
    b, q, h, w = masks.shape
    p = coords.shape[1]
    from .deform_sampling import _bilinear_gather_level_patch

    value = masks[:, 0].transpose(1, 2, 0)[None, :, :, None, :]  # (1, H, W, 1, B)
    loc = coords.reshape(1, b * p, 1, 1, 2)
    out = _bilinear_gather_level_patch(value, loc)  # (1, B*P, 1, 1, B)
    out = out[0, :, 0, 0, :].reshape(b, p, b)
    eye = jnp.eye(b, dtype=out.dtype)
    return jnp.einsum("npc,nc->np", out, eye)[:, None, :]  # (B, 1, P)


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
