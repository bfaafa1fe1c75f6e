"""Masked-attention transformer decoder (Mask2Former) — TPU-native JAX.

Behavioral spec: /root/reference/mask2former/modeling/transformer_decoder/
mask2former_transformer_decoder.py (MultiScaleMaskedTransformerDecoder
:232-502; Self/Cross-attention + FFN layers :25-186; MLP :200-212).

Key behaviors reproduced:
  * learnable query features + query positional embeddings (Q=100, C=256)
  * round-robin cross-attention over the multi-scale features
  * masked attention: the attention mask is the previous prediction's mask
    logits resized to the level size, thresholded at sigmoid < 0.5; rows
    that would be fully masked are unmasked (:431-433, :483-487)
  * prediction heads after every layer (deep supervision aux outputs)

TPU-first differences: batch-first tensors, additive -1e9 masks instead of
bool -inf (identical softmax output in fp32, NaN-safe under autodiff), NHWC
mask features with the mask einsum written as bqc,bhwc->bqhw.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import DecoderConfig
from ..ops.nn import (
    conv2d,
    init_conv2d,
    init_layer_norm,
    init_linear,
    init_mlp,
    layer_norm,
    linear,
    mlp_apply,
    xavier_uniform,
)
from ..ops.resize import resize_bilinear
from .position_encoding import sine_pos_embed

NEG_INF = -1e9


# ---------------------------------------------------------------------------
# Multi-head attention with torch.nn.MultiheadAttention semantics
# ---------------------------------------------------------------------------

def init_mha(key, d_model: int):
    k1, k2 = jax.random.split(key)
    return {
        "in_proj": init_linear(k1, d_model, 3 * d_model),
        "out_proj": init_linear(k2, d_model, d_model),
    }


def mha_apply(
    params,
    query: jax.Array,  # (B, Lq, C)
    key: jax.Array,  # (B, Lk, C)
    value: jax.Array,  # (B, Lk, C)
    num_heads: int,
    attn_mask: Optional[jax.Array] = None,  # (B, nh, Lq, Lk) additive, fp32
) -> jax.Array:
    b, lq, c = query.shape
    lk = key.shape[1]
    hd = c // num_heads
    kernel = params["in_proj"]["kernel"]  # (C, 3C): [q | k | v] blocks
    bias = params["in_proj"]["bias"]
    q = jnp.dot(query, kernel[:, :c].astype(query.dtype)) + bias[:c].astype(query.dtype)
    k = jnp.dot(key, kernel[:, c : 2 * c].astype(key.dtype)) + bias[c : 2 * c].astype(key.dtype)
    v = jnp.dot(value, kernel[:, 2 * c :].astype(value.dtype)) + bias[2 * c :].astype(value.dtype)

    q = q.reshape(b, lq, num_heads, hd)
    k = k.reshape(b, lk, num_heads, hd)
    v = v.reshape(b, lk, num_heads, hd)

    scale = hd**-0.5
    attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k, preferred_element_type=jnp.float32)
    if attn_mask is not None:
        attn = attn + attn_mask
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v, preferred_element_type=jnp.float32)
    out = out.astype(query.dtype).reshape(b, lq, c)
    return linear(params["out_proj"], out)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def decoder_init(key, cfg: DecoderConfig, num_classes: int, in_channels: int):
    keys = jax.random.split(key, 12 + 3 * cfg.dec_layers)
    params: Dict = {
        "query_feat": jax.random.normal(keys[0], (cfg.num_queries, cfg.hidden_dim)),
        "query_embed": jax.random.normal(keys[1], (cfg.num_queries, cfg.hidden_dim)),
        "level_embed": jax.random.normal(keys[2], (cfg.num_feature_levels, cfg.hidden_dim)),
        "decoder_norm": init_layer_norm(cfg.hidden_dim),
        "class_embed": init_linear(keys[3], cfg.hidden_dim, num_classes + 1),
        "mask_embed": init_mlp(keys[4], cfg.hidden_dim, cfg.hidden_dim, cfg.mask_dim, 3),
        "cross_layers": [],
        "self_layers": [],
        "ffn_layers": [],
    }
    if in_channels != cfg.hidden_dim or cfg.enforce_input_project:
        params["input_proj"] = [
            init_conv2d(jax.random.fold_in(keys[5], i), 1, 1, in_channels, cfg.hidden_dim)
            for i in range(cfg.num_feature_levels)
        ]
    for i in range(cfg.dec_layers):
        params["cross_layers"].append(
            {"attn": init_mha(keys[6 + 3 * i], cfg.hidden_dim), "norm": init_layer_norm(cfg.hidden_dim)}
        )
        params["self_layers"].append(
            {"attn": init_mha(keys[7 + 3 * i], cfg.hidden_dim), "norm": init_layer_norm(cfg.hidden_dim)}
        )
        params["ffn_layers"].append(
            {
                "linear1": init_linear(jax.random.fold_in(keys[8 + 3 * i], 0), cfg.hidden_dim, cfg.dim_feedforward),
                "linear2": init_linear(jax.random.fold_in(keys[8 + 3 * i], 1), cfg.dim_feedforward, cfg.hidden_dim),
                "norm": init_layer_norm(cfg.hidden_dim),
            }
        )
    if cfg.ood_prediction:
        # BNReluConv head for DenseHybrid (reference :216-230, :365-366)
        params["ood_pred"] = {
            "bn": {
                "scale": jnp.ones((cfg.hidden_dim,)),
                "bias": jnp.zeros((cfg.hidden_dim,)),
                "mean": jnp.zeros((cfg.hidden_dim,)),
                "var": jnp.ones((cfg.hidden_dim,)),
            },
            "conv": init_conv2d(keys[11], 1, 1, cfg.hidden_dim, 2),
        }
    return params


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def _attn_mask_only(
    params,
    output: jax.Array,  # (B, Q, C)
    mask_features_small: jax.Array,  # (B, h, w, C_mask) pre-resized to the level
):
    """Inference-only fast path for non-final layers: their class/mask heads
    feed nothing but the next layer's attention mask (aux outputs are
    discarded at eval), and bilinear resize is linear in mask_features, so
    resize-then-einsum equals einsum-then-resize — computed at the level
    resolution (32×64 for the released 1dl configs) instead of stride 4,
    skipping the full-res HIGHEST-precision einsum entirely."""
    dec_out = layer_norm(params["decoder_norm"], output)
    mask_embed = mlp_apply(params["mask_embed"], dec_out)
    am = jnp.einsum(
        "bqc,bhwc->bqhw",
        mask_embed.astype(jnp.float32),
        mask_features_small.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    blocked = jax.nn.sigmoid(am) < 0.5
    blocked = blocked.reshape(am.shape[0], am.shape[1], -1)
    all_blocked = jnp.all(blocked, axis=-1, keepdims=True)
    blocked = jnp.where(all_blocked, False, blocked)
    attn_mask = jnp.where(blocked, NEG_INF, 0.0).astype(jnp.float32)
    return jax.lax.stop_gradient(attn_mask[:, None, :, :])


def _prediction_heads(
    params,
    cfg: DecoderConfig,
    output: jax.Array,  # (B, Q, C)
    mask_features: jax.Array,  # (B, H, W, C_mask) fp32
    attn_target_hw: Tuple[int, int],
):
    dec_out = layer_norm(params["decoder_norm"], output)
    outputs_class = linear(params["class_embed"], dec_out)  # (B, Q, K+1)
    mask_embed = mlp_apply(params["mask_embed"], dec_out)  # (B, Q, C_mask)
    outputs_mask = jnp.einsum(
        "bqc,bhwc->bqhw",
        mask_embed.astype(jnp.float32),
        mask_features.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, Q, H, W)

    # attention mask: resized mask logits, blocked where sigmoid < 0.5
    am = resize_bilinear(outputs_mask, attn_target_hw, align_corners=False)
    blocked = jax.nn.sigmoid(am) < 0.5  # (B, Q, h, w)
    blocked = blocked.reshape(am.shape[0], am.shape[1], -1)  # (B, Q, S)
    # unmask fully-blocked rows (reference :433)
    all_blocked = jnp.all(blocked, axis=-1, keepdims=True)
    blocked = jnp.where(all_blocked, False, blocked)
    attn_mask = jnp.where(blocked, NEG_INF, 0.0).astype(jnp.float32)
    attn_mask = jax.lax.stop_gradient(attn_mask[:, None, :, :])  # (B, 1→nh, Q, S)
    return outputs_class, outputs_mask, attn_mask


def decoder_apply(
    params,
    cfg: DecoderConfig,
    x: Sequence[jax.Array],  # multi-scale NHWC features (len = num_feature_levels)
    mask_features: jax.Array,  # (B, H/4, W/4, C_mask)
    compute_dtype=jnp.float32,
    final_mask_layout: str = "bqhw",  # "bhwq" feeds the fused RbA kernel
    need_aux: bool = True,  # False at inference: intermediate heads only
    # produce the next attention mask, via the resize-commuted small einsum
) -> Dict:
    assert len(x) == cfg.num_feature_levels
    b = x[0].shape[0]
    c = cfg.hidden_dim

    from ..ops.resize import resize_bilinear_nhwc

    mf_small = None
    if not need_aux:
        # one resize of mask_features per level size, reused across layers
        mf_small = {}

    srcs, poss, sizes = [], [], []
    for i in range(cfg.num_feature_levels):
        n, h, w, ci = x[i].shape
        sizes.append((h, w))
        pos = sine_pos_embed(h, w, c).reshape(1, h * w, c)
        poss.append(jnp.broadcast_to(pos, (b, h * w, c)).astype(compute_dtype))
        feat = x[i].astype(compute_dtype)
        if "input_proj" in params:
            feat = conv2d(params["input_proj"][i], feat)
        src = feat.reshape(b, h * w, ci if "input_proj" not in params else c)
        src = src + params["level_embed"][i].astype(compute_dtype)[None, None, :]
        srcs.append(src)

    query_embed = jnp.broadcast_to(
        params["query_embed"][None], (b,) + params["query_embed"].shape
    ).astype(compute_dtype)
    output = jnp.broadcast_to(
        params["query_feat"][None], (b,) + params["query_feat"].shape
    ).astype(compute_dtype)

    predictions_class: List[jax.Array] = []
    predictions_mask: List[jax.Array] = []

    def small_mf(hw):
        if hw not in mf_small:
            mf_small[hw] = resize_bilinear_nhwc(
                mask_features.astype(jnp.float32), hw
            )
        return mf_small[hw]

    if need_aux:
        outputs_class, outputs_mask, attn_mask = _prediction_heads(
            params, cfg, output, mask_features, sizes[0]
        )
        predictions_class.append(outputs_class)
        predictions_mask.append(outputs_mask)
    else:
        attn_mask = _attn_mask_only(params, output, small_mf(sizes[0]))

    for i in range(cfg.dec_layers):
        lvl = i % cfg.num_feature_levels
        # cross-attention (pre_norm=False → post-norm residual blocks)
        layer = params["cross_layers"][i]
        y = mha_apply(
            layer["attn"],
            output + query_embed,
            srcs[lvl] + poss[lvl],
            srcs[lvl],
            cfg.nheads,
            attn_mask=attn_mask,
        )
        output = layer_norm(layer["norm"], output + y)

        layer = params["self_layers"][i]
        q = output + query_embed
        y = mha_apply(layer["attn"], q, q, output, cfg.nheads)
        output = layer_norm(layer["norm"], output + y)

        layer = params["ffn_layers"][i]
        y = linear(layer["linear2"], jax.nn.relu(linear(layer["linear1"], output)))
        output = layer_norm(layer["norm"], output + y)

        if i == cfg.dec_layers - 1 and final_mask_layout == "bhwq":
            # final prediction only: channels-last masks for the fused RbA
            # kernel (no HBM transpose), and no attention-mask rebuild
            dec_out = layer_norm(params["decoder_norm"], output)
            outputs_class = linear(params["class_embed"], dec_out)
            mask_embed = mlp_apply(params["mask_embed"], dec_out)
            outputs_mask = jnp.einsum(
                "bqc,bhwc->bhwq",
                mask_embed.astype(jnp.float32),
                mask_features.astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST,
            )
        elif not need_aux and i < cfg.dec_layers - 1:
            attn_mask = _attn_mask_only(
                params, output, small_mf(sizes[(i + 1) % cfg.num_feature_levels])
            )
            continue
        else:
            outputs_class, outputs_mask, attn_mask = _prediction_heads(
                params, cfg, output, mask_features, sizes[(i + 1) % cfg.num_feature_levels]
            )
        predictions_class.append(outputs_class)
        predictions_mask.append(outputs_mask)

    out = {
        "pred_logits": predictions_class[-1],
        "pred_masks": predictions_mask[-1],
        "aux_outputs": [
            {"pred_logits": a, "pred_masks": m}
            for a, m in zip(predictions_class[:-1], predictions_mask[:-1])
        ],
    }
    if cfg.ood_prediction and "ood_pred" in params:
        p = params["ood_pred"]
        mf32 = mask_features.astype(jnp.float32)
        bn = (mf32 - p["bn"]["mean"]) * jax.lax.rsqrt(p["bn"]["var"] + 1e-5)
        bn = bn * p["bn"]["scale"] + p["bn"]["bias"]
        ood = conv2d(p["conv"], jax.nn.relu(bn))  # (B, H, W, 2)
        out["ood_pred"] = jnp.transpose(ood, (0, 3, 1, 2))
    return out


# ---------------------------------------------------------------------------
# MultiScalePerPixelDecoder — mask-only (no classification) variant
# (reference mask2former_transformer_decoder.py:506-746)
# ---------------------------------------------------------------------------

def per_pixel_decoder_init(key, cfg: DecoderConfig, in_channels: int):
    """Same layer stack as the masked decoder but mask_classification=False:
    no class_embed; queries play the role of per-pixel channels."""
    keys = jax.random.split(key, 8 + 3 * cfg.dec_layers)
    params: Dict = {
        "query_feat": jax.random.normal(keys[0], (cfg.num_queries, cfg.hidden_dim)),
        "query_embed": jax.random.normal(keys[1], (cfg.num_queries, cfg.hidden_dim)),
        "level_embed": jax.random.normal(keys[2], (cfg.num_feature_levels, cfg.hidden_dim)),
        "decoder_norm": init_layer_norm(cfg.hidden_dim),
        "mask_embed": init_mlp(keys[3], cfg.hidden_dim, cfg.hidden_dim, cfg.mask_dim, 3),
        "cross_layers": [],
        "self_layers": [],
        "ffn_layers": [],
    }
    if in_channels != cfg.hidden_dim or cfg.enforce_input_project:
        params["input_proj"] = [
            init_conv2d(jax.random.fold_in(keys[4], i), 1, 1, in_channels, cfg.hidden_dim)
            for i in range(cfg.num_feature_levels)
        ]
    for i in range(cfg.dec_layers):
        params["cross_layers"].append(
            {"attn": init_mha(keys[5 + 3 * i], cfg.hidden_dim), "norm": init_layer_norm(cfg.hidden_dim)}
        )
        params["self_layers"].append(
            {"attn": init_mha(keys[6 + 3 * i], cfg.hidden_dim), "norm": init_layer_norm(cfg.hidden_dim)}
        )
        params["ffn_layers"].append(
            {
                "linear1": init_linear(jax.random.fold_in(keys[7 + 3 * i], 0), cfg.hidden_dim, cfg.dim_feedforward),
                "linear2": init_linear(jax.random.fold_in(keys[7 + 3 * i], 1), cfg.dim_feedforward, cfg.hidden_dim),
                "norm": init_layer_norm(cfg.hidden_dim),
            }
        )
    return params


def _mask_prediction_head(params, output, mask_features, attn_target_hw):
    """Mask-only prediction head (reference :728-740): mask logits + the
    sigmoid<0.5 attention mask with the fully-blocked-row unmask fix."""
    dec_out = layer_norm(params["decoder_norm"], output)
    mask_embed = mlp_apply(params["mask_embed"], dec_out)
    outputs_mask = jnp.einsum(
        "bqc,bhwc->bqhw",
        mask_embed.astype(jnp.float32),
        mask_features.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    am = resize_bilinear(outputs_mask, attn_target_hw, align_corners=False)
    blocked = jax.nn.sigmoid(am) < 0.5
    blocked = blocked.reshape(am.shape[0], am.shape[1], -1)
    all_blocked = jnp.all(blocked, axis=-1, keepdims=True)
    blocked = jnp.where(all_blocked, False, blocked)
    attn_mask = jnp.where(blocked, NEG_INF, 0.0).astype(jnp.float32)
    return outputs_mask, jax.lax.stop_gradient(attn_mask[:, None, :, :])


def per_pixel_decoder_apply(
    params,
    cfg: DecoderConfig,
    x: Sequence[jax.Array],  # multi-scale NHWC features
    mask_features: jax.Array,  # (B, H/4, W/4, C_mask)
    compute_dtype=jnp.float32,
) -> Dict:
    """Returns {"pred_masks": (B, Q, H/4, W/4), "aux_outputs": [{pred_masks}…]}
    — no pred_logits (mask_classification=False, reference :568)."""
    assert len(x) == cfg.num_feature_levels
    b = x[0].shape[0]
    c = cfg.hidden_dim

    srcs, poss, sizes = [], [], []
    for i in range(cfg.num_feature_levels):
        n, h, w, ci = x[i].shape
        sizes.append((h, w))
        pos = sine_pos_embed(h, w, c).reshape(1, h * w, c)
        poss.append(jnp.broadcast_to(pos, (b, h * w, c)).astype(compute_dtype))
        feat = x[i].astype(compute_dtype)
        if "input_proj" in params:
            feat = conv2d(params["input_proj"][i], feat)
        src = feat.reshape(b, h * w, c)
        src = src + params["level_embed"][i].astype(compute_dtype)[None, None, :]
        srcs.append(src)

    query_embed = jnp.broadcast_to(
        params["query_embed"][None], (b,) + params["query_embed"].shape
    ).astype(compute_dtype)
    output = jnp.broadcast_to(
        params["query_feat"][None], (b,) + params["query_feat"].shape
    ).astype(compute_dtype)

    predictions_mask: List[jax.Array] = []
    outputs_mask, attn_mask = _mask_prediction_head(params, output, mask_features, sizes[0])
    predictions_mask.append(outputs_mask)

    for i in range(cfg.dec_layers):
        lvl = i % cfg.num_feature_levels
        layer = params["cross_layers"][i]
        y = mha_apply(
            layer["attn"], output + query_embed, srcs[lvl] + poss[lvl], srcs[lvl],
            cfg.nheads, attn_mask=attn_mask,
        )
        output = layer_norm(layer["norm"], output + y)

        layer = params["self_layers"][i]
        q = output + query_embed
        y = mha_apply(layer["attn"], q, q, output, cfg.nheads)
        output = layer_norm(layer["norm"], output + y)

        layer = params["ffn_layers"][i]
        y = linear(layer["linear2"], jax.nn.relu(linear(layer["linear1"], output)))
        output = layer_norm(layer["norm"], output + y)

        outputs_mask, attn_mask = _mask_prediction_head(
            params, output, mask_features, sizes[(i + 1) % cfg.num_feature_levels]
        )
        predictions_mask.append(outputs_mask)

    return {
        "pred_masks": predictions_mask[-1],
        "aux_outputs": [{"pred_masks": m} for m in predictions_mask[:-1]],
    }


# ---------------------------------------------------------------------------
# SimpleTransformerDecoder — one masked cross-attention over mask_features
# (reference mask2former_transformer_decoder.py:748-947)
# ---------------------------------------------------------------------------

def simple_decoder_init(key, cfg: DecoderConfig, num_classes: int):
    keys = jax.random.split(key, 6)
    return {
        "query_feat": jax.random.normal(keys[0], (cfg.num_queries, cfg.hidden_dim)),
        "query_embed": jax.random.normal(keys[1], (cfg.num_queries, cfg.hidden_dim)),
        "cross_attention": {
            "attn": init_mha(keys[2], cfg.hidden_dim),
            "norm": init_layer_norm(cfg.hidden_dim),
        },
        "decoder_norm": init_layer_norm(cfg.hidden_dim),
        "class_embed": init_linear(keys[3], cfg.hidden_dim, num_classes + 1),
        "mask_embed": init_mlp(keys[4], cfg.hidden_dim, cfg.hidden_dim, cfg.mask_dim, 3),
    }


def simple_decoder_apply(
    params,
    cfg: DecoderConfig,
    mask_features: jax.Array,  # (B, H/4, W/4, C_mask); C_mask == hidden_dim
    compute_dtype=jnp.float32,
) -> Dict:
    """One masked cross-attention of the queries over the stride-4 mask
    features, then prediction heads.  The reference does NOT apply the
    fully-blocked-row unmask fix here (:898-904); with our additive mask a
    fully-blocked row degrades to uniform attention instead of the NaNs the
    reference's bool mask would produce — the benign reading of the same
    code.  aux_outputs is empty (predictions are appended only after the
    cross-attention, :906-918)."""
    b, h, w, cm = mask_features.shape
    c = cfg.hidden_dim

    def pred_heads(output):
        dec_out = layer_norm(params["decoder_norm"], output)
        cls = linear(params["class_embed"], dec_out)
        me = mlp_apply(params["mask_embed"], dec_out)
        masks = jnp.einsum(
            "bqc,bhwc->bqhw",
            me.astype(jnp.float32),
            mask_features.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        )
        am = resize_bilinear(masks, (h, w), align_corners=False)
        blocked = (jax.nn.sigmoid(am) < 0.5).reshape(b, masks.shape[1], -1)
        attn_mask = jnp.where(blocked, NEG_INF, 0.0).astype(jnp.float32)
        return cls, masks, jax.lax.stop_gradient(attn_mask[:, None, :, :])

    query_embed = jnp.broadcast_to(
        params["query_embed"][None], (b,) + params["query_embed"].shape
    ).astype(compute_dtype)
    output = jnp.broadcast_to(
        params["query_feat"][None], (b,) + params["query_feat"].shape
    ).astype(compute_dtype)

    _, _, attn_mask = pred_heads(output)

    mf_vec = mask_features.astype(compute_dtype).reshape(b, h * w, cm)
    mf_pos = jnp.broadcast_to(
        sine_pos_embed(h, w, c).reshape(1, h * w, c), (b, h * w, c)
    ).astype(compute_dtype)

    layer = params["cross_attention"]
    y = mha_apply(
        layer["attn"], output + query_embed, mf_vec + mf_pos, mf_vec,
        cfg.nheads, attn_mask=attn_mask,
    )
    output = layer_norm(layer["norm"], output + y)

    outputs_class, outputs_mask, _ = pred_heads(output)
    return {
        "pred_logits": outputs_class,
        "pred_masks": outputs_mask,
        "aux_outputs": [],
    }
