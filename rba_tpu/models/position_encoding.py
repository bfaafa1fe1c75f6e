"""2D sine positional embedding (DETR-style).

Behavioral spec: /root/reference/mask2former/modeling/transformer_decoder/
position_encoding.py:12-52 (PositionEmbeddingSine, normalize=True, scale=2π).
With the live all-valid mask, the cumsum over "not masked" reduces to
row/col index + 1; we compute that closed form directly.  Output layout here
is (H, W, C) channels-last, with the channel order [pos_y ‖ pos_x] and each
half interleaved as (sin, cos) pairs per frequency — matching the reference's
channel order after its NCHW permute.
"""
from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _sine_pos_embed_np(h: int, w: int, num_pos_feats: int, temperature: float = 10000.0) -> np.ndarray:
    eps = 1e-6
    scale = 2 * math.pi
    y_embed = np.arange(1, h + 1, dtype=np.float32)[:, None] * np.ones((1, w), np.float32)
    x_embed = np.ones((h, 1), np.float32) * np.arange(1, w + 1, dtype=np.float32)[None, :]
    y_embed = y_embed / (h + eps) * scale
    x_embed = x_embed / (w + eps) * scale

    dim_t = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)

    pos_x = x_embed[:, :, None] / dim_t  # (H, W, F)
    pos_y = y_embed[:, :, None] / dim_t
    # interleave: even indices -> sin, odd -> cos (same frequency pairwise)
    pos_x = np.stack([np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])], axis=3).reshape(h, w, -1)
    pos_y = np.stack([np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])], axis=3).reshape(h, w, -1)
    return np.concatenate([pos_y, pos_x], axis=2)  # (H, W, 2F)


def sine_pos_embed(h: int, w: int, channels: int, dtype=jnp.float32) -> jnp.ndarray:
    """(H, W, channels) sine embedding; ``channels`` must be even."""
    assert channels % 2 == 0
    return jnp.asarray(_sine_pos_embed_np(h, w, channels // 2), dtype=dtype)
