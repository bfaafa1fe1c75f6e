"""MSDeformAttn pixel decoder — TPU-native JAX implementation.

Behavioral spec: /root/reference/mask2former/modeling/pixel_decoder/
msdeformattn.py (MSDeformAttnPixelDecoder :173-367, encoder :32-170) and the
MSDeformAttn module (/root/reference/mask2former/modeling/pixel_decoder/ops/
modules/ms_deform_attn.py:34-125).

The whole decoder runs in fp32: the reference pins it out of AMP
(msdeformattn.py:323-329) and the 0.1-point score-parity budget depends on it.
Shapes are static under jit, so the per-level reference-point grids and
level-start offsets are Python-time constants.

Structure (params pytree keys mirror the checkpoint layout for the converter):
  input_proj: [ {conv, gn} ]           per transformer level (res5→res2 order)
  transformer: {level_embed, encoder: {layers: [...]}}
  adapters / layers: FPN lateral (1x1+GN) and output (3x3+GN+relu) convs
  mask_features: 1x1 conv to mask_dim
"""
from __future__ import annotations

import functools
import math
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PixelDecoderConfig
from ..ops.deform_sampling import ms_deform_attn_core
from ..ops.nn import (
    conv2d,
    conv2d_3x3_rowtiled,
    group_norm,
    init_conv2d,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
)
from ..ops.resize import resize_bilinear_nhwc
from .position_encoding import sine_pos_embed


# ---------------------------------------------------------------------------
# MSDeformAttn module
# ---------------------------------------------------------------------------

def init_ms_deform_attn(key, d_model: int, n_levels: int, n_heads: int, n_points: int):
    k1, k2, k3 = jax.random.split(key, 3)
    # directional bias init (reference ms_deform_attn.py:66-80)
    thetas = np.arange(n_heads, dtype=np.float32) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid.reshape(n_heads, 1, 1, 2), (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1

    return {
        "sampling_offsets": {
            "kernel": jnp.zeros((d_model, n_heads * n_levels * n_points * 2), jnp.float32),
            "bias": jnp.asarray(grid.reshape(-1)),
        },
        "attention_weights": {
            "kernel": jnp.zeros((d_model, n_heads * n_levels * n_points), jnp.float32),
            "bias": jnp.zeros((n_heads * n_levels * n_points,), jnp.float32),
        },
        "value_proj": init_linear(k2, d_model, d_model),
        "output_proj": init_linear(k3, d_model, d_model),
    }


def ms_deform_attn_apply(
    params,
    query: jax.Array,  # (N, Lq, C) — content + positional
    reference_points: jax.Array,  # (N, Lq, L, 2) in [0, 1]
    value_input: jax.Array,  # (N, S, C)
    spatial_shapes: Sequence[Tuple[int, int]],  # static
    n_heads: int,
    n_points: int,
    sampling_method: str = "auto",
    sampling_dtype: str = "float32",
    sampling_onehot_cap: int = 192 * 1024 * 1024,
) -> jax.Array:
    n, lq, c = query.shape
    nlevels = len(spatial_shapes)
    hd = c // n_heads

    value = linear(params["value_proj"], value_input).reshape(n, -1, n_heads, hd)
    offsets = linear(params["sampling_offsets"], query).reshape(
        n, lq, n_heads, nlevels, n_points, 2
    )
    aw = linear(params["attention_weights"], query).reshape(n, lq, n_heads, nlevels * n_points)
    aw = jax.nn.softmax(aw.astype(jnp.float32), axis=-1).reshape(
        n, lq, n_heads, nlevels, n_points
    )

    # normalizer is (W, H) per level (ms_deform_attn.py:107-109)
    normalizer = jnp.asarray(
        [[w, h] for (h, w) in spatial_shapes], jnp.float32
    )  # (L, 2)
    loc = (
        reference_points[:, :, None, :, None, :]
        + offsets / normalizer[None, None, None, :, None, :]
    )

    out = ms_deform_attn_core(value, spatial_shapes, loc, aw, method=sampling_method,
                              sampling_dtype=sampling_dtype,
                              onehot_cap=sampling_onehot_cap)
    return linear(params["output_proj"], out)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def init_encoder_layer(key, d_model: int, d_ffn: int, n_levels: int, n_heads: int, n_points: int):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "self_attn": init_ms_deform_attn(k1, d_model, n_levels, n_heads, n_points),
        "norm1": init_layer_norm(d_model),
        "linear1": init_linear(k2, d_model, d_ffn),
        "linear2": init_linear(k3, d_ffn, d_model),
        "norm2": init_layer_norm(d_model),
    }


def encoder_layer_apply(
    params, src, pos, reference_points, spatial_shapes, n_heads, n_points,
    sampling_method: str = "auto", sampling_dtype: str = "float32",
    sampling_onehot_cap: int = 192 * 1024 * 1024,
):
    q = src + pos
    src2 = ms_deform_attn_apply(
        params["self_attn"], q, reference_points, src, spatial_shapes, n_heads, n_points,
        sampling_method=sampling_method, sampling_dtype=sampling_dtype,
        sampling_onehot_cap=sampling_onehot_cap,
    )
    src = layer_norm(params["norm1"], src + src2)
    ffn = linear(params["linear2"], jax.nn.relu(linear(params["linear1"], src)))
    return layer_norm(params["norm2"], src + ffn)


@functools.lru_cache(maxsize=64)
def _reference_points_np(spatial_shapes: Tuple[Tuple[int, int], ...]) -> np.ndarray:
    """(sum HW, L, 2) normalized center-grid reference points; valid_ratios
    are all-ones in the live path (masks are all-valid) so the reference's
    valid-ratio scaling (msdeformattn.py:149-162) collapses to the plain
    grid, broadcast across levels."""
    pts = []
    for h, w in spatial_shapes:
        ys = (np.arange(h, dtype=np.float32) + 0.5) / h
        xs = (np.arange(w, dtype=np.float32) + 0.5) / w
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        pts.append(np.stack([gx.reshape(-1), gy.reshape(-1)], -1))
    ref = np.concatenate(pts, 0)  # (S, 2)
    return np.tile(ref[:, None, :], (1, len(spatial_shapes), 1))


# ---------------------------------------------------------------------------
# Pixel decoder
# ---------------------------------------------------------------------------

def pixel_decoder_init(key, cfg: PixelDecoderConfig, in_channels: Dict[str, int]):
    keys = jax.random.split(key, 32)
    nlv = cfg.num_feature_levels
    params: Dict = {}

    # input projections, res5 -> lower (reversed transformer_in_features)
    tf_feats_rev = list(cfg.transformer_in_features)[::-1]
    params["input_proj"] = []
    for i, f in enumerate(tf_feats_rev):
        params["input_proj"].append(
            {
                "conv": init_conv2d(keys[i], 1, 1, in_channels[f], cfg.conv_dim),
                "gn": init_layer_norm(cfg.conv_dim),  # GroupNorm scale/bias
            }
        )

    ekeys = jax.random.split(keys[8], cfg.transformer_enc_layers)
    params["transformer"] = {
        "level_embed": jax.random.normal(keys[9], (nlv, cfg.conv_dim), jnp.float32),
        "encoder": {
            "layers": [
                init_encoder_layer(
                    ekeys[i],
                    cfg.conv_dim,
                    cfg.transformer_dim_feedforward,
                    nlv,
                    cfg.transformer_nheads,
                    cfg.enc_n_points,
                )
                for i in range(cfg.transformer_enc_layers)
            ]
        },
    }

    # FPN: one (lateral, output) pair per feature below the transformer levels
    min_tf_stride_idx = len(cfg.in_features) - len(cfg.transformer_in_features)
    fpn_feats = list(cfg.in_features)[:min_tf_stride_idx]  # e.g. res2, res3, res4
    params["fpn"] = []
    for i, f in enumerate(fpn_feats):  # stored bottom-up (adapter_1 = res2)
        params["fpn"].append(
            {
                "lateral": {
                    "conv": init_conv2d(keys[10 + i], 1, 1, in_channels[f], cfg.conv_dim, bias=False),
                    "gn": init_layer_norm(cfg.conv_dim),
                },
                "output": {
                    "conv": init_conv2d(keys[16 + i], 3, 3, cfg.conv_dim, cfg.conv_dim, bias=False),
                    "gn": init_layer_norm(cfg.conv_dim),
                },
            }
        )

    params["mask_features"] = init_conv2d(keys[30], 1, 1, cfg.conv_dim, cfg.mask_dim)
    return params


def pixel_decoder_apply(
    params,
    cfg: PixelDecoderConfig,
    features: Dict[str, jax.Array],  # NHWC feature maps from the backbone
    dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array, List[jax.Array]]:
    """Returns (mask_features, transformer_encoder_feature, multi_scale_features),
    all NHWC.  Mirrors forward_features (msdeformattn.py:323-367).

    ``dtype`` governs the conv/FFN matmuls; fp32 (default) matches the
    reference's fp32-pinned pixel decoder, bf16 is the fast serving mode.
    Norms, softmaxes, and the deformable sampling always run fp32."""
    tf_feats_rev = list(cfg.transformer_in_features)[::-1]

    srcs = []
    poss = []
    spatial_shapes: List[Tuple[int, int]] = []
    for i, f in enumerate(tf_feats_rev):
        x = features[f].astype(dtype)
        p = params["input_proj"][i]
        y = conv2d(p["conv"], x)
        y = group_norm(p["gn"], y, num_groups=32)
        srcs.append(y)
        n, h, w, c = y.shape
        poss.append(sine_pos_embed(h, w, c, dtype=dtype))
        spatial_shapes.append((h, w))

    # flatten + add level embeds
    n = srcs[0].shape[0]
    c = srcs[0].shape[-1]
    src_flat = jnp.concatenate([s.reshape(n, -1, c) for s in srcs], axis=1)
    lvl_embed = params["transformer"]["level_embed"].astype(dtype)
    pos_flat = jnp.concatenate(
        [
            (poss[i] + lvl_embed[i][None, None, :]).reshape(1, -1, c)
            for i in range(len(srcs))
        ],
        axis=1,
    )
    pos_flat = jnp.broadcast_to(pos_flat, src_flat.shape)

    ref_pts = jnp.asarray(_reference_points_np(tuple(spatial_shapes)))[None]
    ref_pts = jnp.broadcast_to(ref_pts, (n,) + ref_pts.shape[1:])

    y = src_flat
    for layer in params["transformer"]["encoder"]["layers"]:
        y = encoder_layer_apply(
            layer, y, pos_flat, ref_pts, tuple(spatial_shapes),
            cfg.transformer_nheads, cfg.enc_n_points,
            sampling_method=cfg.sampling_method,
            sampling_dtype=cfg.sampling_dtype,
            sampling_onehot_cap=cfg.sampling_onehot_cap,
        )

    # split levels back to maps
    out: List[jax.Array] = []
    offset = 0
    for h, w in spatial_shapes:
        out.append(y[:, offset : offset + h * w].reshape(n, h, w, c))
        offset += h * w

    # FPN top-down over the remaining (higher-res) features
    num_fpn = len(params["fpn"])
    fpn_feats = list(cfg.in_features)[:num_fpn]  # bottom-up, e.g. [res2, res3, res4]
    for f, p in zip(fpn_feats[::-1], params["fpn"][::-1]):  # top-down
        x = features[f].astype(dtype)
        lat = group_norm(p["lateral"]["gn"], conv2d(p["lateral"]["conv"], x), num_groups=32)
        # the 2x upsample follows the pixel-decoder compute dtype (fp32 in
        # parity mode — the reference's fp32-pinned decoder; bf16 in fast)
        up = resize_bilinear_nhwc(out[-1], (lat.shape[1], lat.shape[2]),
                                  compute_dtype=dtype)
        z = lat + up
        z = conv2d_3x3_rowtiled(p["output"]["conv"], z)
        z = jax.nn.relu(group_norm(p["output"]["gn"], z, num_groups=32))
        out.append(z)

    mask_features = conv2d(params["mask_features"], out[-1])
    multi_scale = out[: cfg.num_feature_levels]
    return mask_features, out[0], multi_scale
