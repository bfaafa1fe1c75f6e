"""Baseline heads: FPN pixel decoder, vanilla-transformer variants, and
per-pixel baselines.

Behavioral spec:
  * BasePixelDecoder / TransformerEncoderPixelDecoder —
    /root/reference/mask2former/modeling/pixel_decoder/fpn.py (plain FPN
    with GN+ReLU output convs; optional vanilla transformer encoder on res5)
  * StandardTransformerDecoder (MaskFormer v1) —
    /root/reference/mask2former/modeling/transformer_decoder/
    maskformer_transformer_decoder.py:30-188
  * vanilla DETR Transformer —
    /root/reference/mask2former/modeling/transformer_decoder/transformer.py
  * PerPixelBaselineHead / PerPixelBaselinePlusHead —
    /root/reference/mask2former/modeling/meta_arch/per_pixel_baseline.py
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import PixelDecoderConfig, RbAConfig
from ..ops.nn import (
    conv2d,
    group_norm,
    init_conv2d,
    init_layer_norm,
    init_linear,
    init_mlp,
    layer_norm,
    linear,
    mlp_apply,
)
from ..ops.resize import resize_bilinear_nhwc
from .position_encoding import sine_pos_embed
from .transformer_decoder import init_mha, mha_apply


# ---------------------------------------------------------------------------
# FPN pixel decoder (BasePixelDecoder)
# ---------------------------------------------------------------------------

def fpn_pixel_decoder_init(key, cfg: PixelDecoderConfig, in_channels: Dict[str, int]):
    keys = jax.random.split(key, 2 * len(cfg.in_features) + 1)
    params: Dict = {"stages": []}
    # top-down order: res5 first (no lateral), then res4..res2
    feats = list(cfg.in_features)[::-1]
    for i, f in enumerate(feats):
        k1, k2 = jax.random.split(keys[i])
        stage: Dict = {}
        if i == 0:
            stage["output"] = {
                "conv": init_conv2d(k2, 3, 3, in_channels[f], cfg.conv_dim, bias=False),
                "gn": init_layer_norm(cfg.conv_dim),
            }
        else:
            stage["lateral"] = {
                "conv": init_conv2d(k1, 1, 1, in_channels[f], cfg.conv_dim, bias=False),
                "gn": init_layer_norm(cfg.conv_dim),
            }
            stage["output"] = {
                "conv": init_conv2d(k2, 3, 3, cfg.conv_dim, cfg.conv_dim, bias=False),
                "gn": init_layer_norm(cfg.conv_dim),
            }
        params["stages"].append(stage)
    params["mask_features"] = init_conv2d(keys[-1], 3, 3, cfg.conv_dim, cfg.mask_dim)
    return params


def fpn_pixel_decoder_apply(params, cfg: PixelDecoderConfig, features: Dict[str, jax.Array]):
    feats = list(cfg.in_features)[::-1]
    y = None
    outs: List[jax.Array] = []
    for stage, f in zip(params["stages"], feats):
        x = features[f].astype(jnp.float32)
        if "lateral" in stage:
            lat = group_norm(stage["lateral"]["gn"], conv2d(stage["lateral"]["conv"], x), 32)
            y = lat + resize_bilinear_nhwc(y, (lat.shape[1], lat.shape[2]))
        else:
            y = x
        y = jax.nn.relu(group_norm(stage["output"]["gn"], conv2d(stage["output"]["conv"], y, padding=1), 32))
        outs.append(y)
    mask_features = conv2d(params["mask_features"], outs[-1], padding=1)
    # multi-scale features: lowest-res first (matching MSDeformAttn decoder)
    return mask_features, None, outs[: max(1, len(outs) - 1)]


# ---------------------------------------------------------------------------
# vanilla transformer encoder/decoder (DETR style, post-norm)
# ---------------------------------------------------------------------------

def transformer_encoder_layer_init(key, d_model: int, d_ffn: int):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "attn": init_mha(k1, d_model),
        "norm1": init_layer_norm(d_model),
        "linear1": init_linear(k2, d_model, d_ffn),
        "linear2": init_linear(k3, d_ffn, d_model),
        "norm2": init_layer_norm(d_model),
    }


def transformer_encoder_layer_apply(p, src, pos, nheads: int):
    q = src + pos
    y = mha_apply(p["attn"], q, q, src, nheads)
    src = layer_norm(p["norm1"], src + y)
    y = linear(p["linear2"], jax.nn.relu(linear(p["linear1"], src)))
    return layer_norm(p["norm2"], src + y)


def transformer_decoder_layer_init(key, d_model: int, d_ffn: int):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "self_attn": init_mha(k1, d_model),
        "norm1": init_layer_norm(d_model),
        "cross_attn": init_mha(k2, d_model),
        "norm2": init_layer_norm(d_model),
        "linear1": init_linear(k3, d_model, d_ffn),
        "linear2": init_linear(k4, d_ffn, d_model),
        "norm3": init_layer_norm(d_model),
    }


def transformer_decoder_layer_apply(p, tgt, memory, query_pos, mem_pos, nheads: int):
    q = tgt + query_pos
    y = mha_apply(p["self_attn"], q, q, tgt, nheads)
    tgt = layer_norm(p["norm1"], tgt + y)
    y = mha_apply(p["cross_attn"], tgt + query_pos, memory + mem_pos, memory, nheads)
    tgt = layer_norm(p["norm2"], tgt + y)
    y = linear(p["linear2"], jax.nn.relu(linear(p["linear1"], tgt)))
    return layer_norm(p["norm3"], tgt + y)


# ---------------------------------------------------------------------------
# StandardTransformerDecoder (MaskFormer v1 predictor)
# ---------------------------------------------------------------------------

def standard_decoder_init(key, cfg: RbAConfig, in_channels: int,
                          enc_layers: int = 0, dec_layers: int = 6):
    d = cfg.decoder
    keys = jax.random.split(key, enc_layers + dec_layers + 6)
    params: Dict = {
        "query_embed": jax.random.normal(keys[0], (d.num_queries, d.hidden_dim)),
        "input_proj": init_conv2d(keys[1], 1, 1, in_channels, d.hidden_dim),
        "enc_layers": [
            transformer_encoder_layer_init(keys[2 + i], d.hidden_dim, d.dim_feedforward)
            for i in range(enc_layers)
        ],
        "dec_layers": [
            transformer_decoder_layer_init(keys[2 + enc_layers + i], d.hidden_dim, d.dim_feedforward)
            for i in range(dec_layers)
        ],
        "decoder_norm": init_layer_norm(d.hidden_dim),
        "class_embed": init_linear(keys[-2], d.hidden_dim, cfg.num_classes + 1),
        "mask_embed": init_mlp(keys[-1], d.hidden_dim, d.hidden_dim, d.mask_dim, 3),
    }
    return params


def standard_decoder_apply(params, cfg: RbAConfig, x: jax.Array, mask_features: jax.Array):
    """x: (B, H, W, C) res5 feature; mask_features: (B, H4, W4, C_mask)."""
    d = cfg.decoder
    b, h, w, _ = x.shape
    pos = jnp.broadcast_to(
        sine_pos_embed(h, w, d.hidden_dim).reshape(1, h * w, d.hidden_dim), (b, h * w, d.hidden_dim)
    )
    src = conv2d(params["input_proj"], x.astype(jnp.float32)).reshape(b, h * w, d.hidden_dim)
    for layer in params["enc_layers"]:
        src = transformer_encoder_layer_apply(layer, src, pos, d.nheads)

    query_pos = jnp.broadcast_to(params["query_embed"][None], (b,) + params["query_embed"].shape)
    tgt = jnp.zeros_like(query_pos)
    for layer in params["dec_layers"]:
        tgt = transformer_decoder_layer_apply(layer, tgt, src, query_pos, pos, d.nheads)
    tgt = layer_norm(params["decoder_norm"], tgt)

    pred_logits = linear(params["class_embed"], tgt)
    mask_embed = mlp_apply(params["mask_embed"], tgt)
    pred_masks = jnp.einsum(
        "bqc,bhwc->bqhw", mask_embed.astype(jnp.float32), mask_features.astype(jnp.float32)
    )
    return {"pred_logits": pred_logits, "pred_masks": pred_masks, "aux_outputs": []}


# ---------------------------------------------------------------------------
# per-pixel baseline heads
# ---------------------------------------------------------------------------

def per_pixel_head_init(key, cfg: RbAConfig, in_channels: Dict[str, int]):
    k1, k2 = jax.random.split(key)
    return {
        "pixel_decoder": fpn_pixel_decoder_init(k1, cfg.pixel_decoder, in_channels),
        "predictor": init_conv2d(k2, 1, 1, cfg.pixel_decoder.mask_dim, cfg.num_classes),
    }


def per_pixel_head_apply(params, cfg: RbAConfig, features: Dict[str, jax.Array]) -> jax.Array:
    """→ (B, K, H/4, W/4) per-pixel class logits."""
    mask_features, _, _ = fpn_pixel_decoder_apply(params["pixel_decoder"], cfg.pixel_decoder, features)
    logits = conv2d(params["predictor"], mask_features)
    return jnp.transpose(logits, (0, 3, 1, 2))
