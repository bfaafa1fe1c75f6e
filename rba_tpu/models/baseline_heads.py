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
from ..ops.resize import resize_bilinear, resize_nearest_nhwc
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


def fpn_pixel_decoder_apply(
    params, cfg: PixelDecoderConfig, features: Dict[str, jax.Array], dtype=jnp.float32
):
    """BasePixelDecoder.forward_features (fpn.py:137-157): top-down FPN with
    NEAREST upsampling, first 3 levels (lowest-res first) as multi-scale
    features, mask_features conv on the stride-4 output."""
    feats = list(cfg.in_features)[::-1]
    y = None
    outs: List[jax.Array] = []
    for stage, f in zip(params["stages"], feats):
        x = features[f].astype(dtype)
        if "lateral" in stage:
            lat = group_norm(stage["lateral"]["gn"], conv2d(stage["lateral"]["conv"], x), 32)
            y = lat + resize_nearest_nhwc(y, (lat.shape[1], lat.shape[2]))
        else:
            y = x
        y = jax.nn.relu(group_norm(stage["output"]["gn"], conv2d(stage["output"]["conv"], y, padding=1), 32))
        outs.append(y)
    mask_features = conv2d(params["mask_features"], outs[-1], padding=1)
    # reference caps at maskformer_num_feature_levels = 3 (fpn.py:123)
    return mask_features, None, outs[:3]


# ---------------------------------------------------------------------------
# TransformerEncoderPixelDecoder: FPN + vanilla transformer encoder on res5
# (reference fpn.py:203-311)
# ---------------------------------------------------------------------------

def transformer_encoder_pixel_decoder_init(key, cfg: RbAConfig, in_channels: Dict[str, int]):
    pcfg = cfg.pixel_decoder
    k0, k1, k2, k3 = jax.random.split(key, 4)
    params = fpn_pixel_decoder_init(k0, pcfg, in_channels)
    # the res5 output conv now consumes the transformer output (conv_dim
    # channels), replacing the in_channels->conv_dim conv (fpn.py:256-270)
    params["stages"][0]["output"] = {
        "conv": init_conv2d(k1, 3, 3, pcfg.conv_dim, pcfg.conv_dim, bias=False),
        "gn": init_layer_norm(pcfg.conv_dim),
    }
    top = list(pcfg.in_features)[-1]
    params["input_proj"] = init_conv2d(k2, 1, 1, in_channels[top], pcfg.conv_dim)
    ekeys = jax.random.split(k3, max(pcfg.transformer_enc_layers, 1))
    params["encoder"] = [
        transformer_encoder_layer_init(ekeys[i], pcfg.conv_dim, cfg.decoder.dim_feedforward)
        for i in range(pcfg.transformer_enc_layers)
    ]
    if cfg.decoder.pre_norm:
        # DETR pre-norm stacks end in a final LayerNorm (reference
        # fpn.py:177 `encoder_norm = nn.LayerNorm(d_model) if
        # normalize_before else None`)
        params["encoder_norm"] = init_layer_norm(pcfg.conv_dim)
    return params


def transformer_encoder_pixel_decoder_apply(
    params, cfg: RbAConfig, features: Dict[str, jax.Array], dtype=jnp.float32
):
    pcfg = cfg.pixel_decoder
    feats = list(pcfg.in_features)[::-1]
    y = None
    enc_feat = None
    outs: List[jax.Array] = []
    for stage, f in zip(params["stages"], feats):
        x = features[f].astype(dtype)
        if "lateral" in stage:
            lat = group_norm(stage["lateral"]["gn"], conv2d(stage["lateral"]["conv"], x), 32)
            y = lat + resize_nearest_nhwc(y, (lat.shape[1], lat.shape[2]))
        else:
            t = conv2d(params["input_proj"], x)
            b, h, w, c = t.shape
            pos = sine_pos_embed(h, w, c).reshape(1, h * w, c)
            src = t.reshape(b, h * w, c)
            posf = jnp.broadcast_to(pos, src.shape).astype(src.dtype)
            for layer in params["encoder"]:
                src = transformer_encoder_layer_apply(
                    layer, src, posf, cfg.decoder.nheads, pre_norm=cfg.decoder.pre_norm
                )
            if "encoder_norm" in params:
                src = layer_norm(params["encoder_norm"], src)
            enc_feat = src.reshape(b, h, w, c)
            y = enc_feat
        y = jax.nn.relu(group_norm(stage["output"]["gn"], conv2d(stage["output"]["conv"], y, padding=1), 32))
        outs.append(y)
    mask_features = conv2d(params["mask_features"], outs[-1], padding=1)
    return mask_features, enc_feat, outs[:3]


def build_pixel_decoder(cfg: RbAConfig):
    """SEM_SEG_HEAD.PIXEL_DECODER_NAME registry dispatch (reference
    fpn.py:21-33 build_pixel_decoder).  Returns
    (init_fn(key, in_channels), apply_fn(params, features, dtype)) where
    apply returns (mask_features, transformer_encoder_feature,
    multi_scale_features), all NHWC."""
    name = cfg.pixel_decoder.name
    if name == "MSDeformAttnPixelDecoder":
        from .pixel_decoder import pixel_decoder_apply, pixel_decoder_init

        return (
            lambda key, in_ch: pixel_decoder_init(key, cfg.pixel_decoder, in_ch),
            lambda p, feats, dtype: pixel_decoder_apply(
                p, cfg.pixel_decoder, feats, dtype=dtype
            ),
        )
    if name == "BasePixelDecoder":
        return (
            lambda key, in_ch: fpn_pixel_decoder_init(key, cfg.pixel_decoder, in_ch),
            lambda p, feats, dtype: fpn_pixel_decoder_apply(
                p, cfg.pixel_decoder, feats, dtype=dtype
            ),
        )
    if name == "TransformerEncoderPixelDecoder":
        return (
            lambda key, in_ch: transformer_encoder_pixel_decoder_init(key, cfg, in_ch),
            lambda p, feats, dtype: transformer_encoder_pixel_decoder_apply(
                p, cfg, feats, dtype=dtype
            ),
        )
    raise NotImplementedError(f"PIXEL_DECODER_NAME {name}")


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


def transformer_encoder_layer_apply(p, src, pos, nheads: int, pre_norm: bool = False):
    if pre_norm:
        # DETR pre-norm variant (reference transformer.py forward_pre)
        s2 = layer_norm(p["norm1"], src)
        q = s2 + pos
        src = src + mha_apply(p["attn"], q, q, s2, nheads)
        s2 = layer_norm(p["norm2"], src)
        return src + linear(p["linear2"], jax.nn.relu(linear(p["linear1"], s2)))
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


def transformer_decoder_layer_apply(p, tgt, memory, query_pos, mem_pos, nheads: int,
                                    pre_norm: bool = False):
    if pre_norm:
        t2 = layer_norm(p["norm1"], tgt)
        q = t2 + query_pos
        tgt = tgt + mha_apply(p["self_attn"], q, q, t2, nheads)
        t2 = layer_norm(p["norm2"], tgt)
        tgt = tgt + mha_apply(p["cross_attn"], t2 + query_pos, memory + mem_pos, memory, nheads)
        t2 = layer_norm(p["norm3"], tgt)
        return tgt + linear(p["linear2"], jax.nn.relu(linear(p["linear1"], t2)))
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
                          enc_layers: Optional[int] = None,
                          dec_layers: Optional[int] = None,
                          mask_classification: bool = True):
    """StandardTransformerDecoder params (reference
    maskformer_transformer_decoder.py:30-105).  ``mask_classification=False``
    (the PerPixelBaselinePlusHead mode) omits the class head; pred_masks then
    double as per-pixel class logits with Q = num_classes channels."""
    d = cfg.decoder
    enc_layers = d.enc_layers if enc_layers is None else enc_layers
    dec_layers = d.dec_layers_total if dec_layers is None else dec_layers
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
        "mask_embed": init_mlp(keys[-1], d.hidden_dim, d.hidden_dim, d.mask_dim, 3),
    }
    if d.pre_norm:
        # reference transformer.py:37: pre-norm encoders get a final
        # LayerNorm (applied even when enc_layers == 0)
        params["encoder_norm"] = init_layer_norm(d.hidden_dim)
    if mask_classification:
        params["class_embed"] = init_linear(keys[-2], d.hidden_dim, cfg.num_classes + 1)
    return params


def standard_decoder_apply(params, cfg: RbAConfig, x: jax.Array, mask_features: jax.Array,
                           deep_supervision: Optional[bool] = None):
    """x: (B, H, W, C) res5 feature; mask_features: (B, H4, W4, C_mask).
    ``mask_classification`` is inferred from the params (class_embed present).
    With deep supervision, per-layer aux pred_masks (+logits) mirror the
    reference's return_intermediate_dec path (transformer.py:141-166)."""
    d = cfg.decoder
    if deep_supervision is None:
        deep_supervision = cfg.loss.deep_supervision
    mask_classification = "class_embed" in params
    b, h, w, _ = x.shape
    pos = jnp.broadcast_to(
        sine_pos_embed(h, w, d.hidden_dim).reshape(1, h * w, d.hidden_dim), (b, h * w, d.hidden_dim)
    )
    src = conv2d(params["input_proj"], x.astype(jnp.float32)).reshape(b, h * w, d.hidden_dim)
    for layer in params["enc_layers"]:
        src = transformer_encoder_layer_apply(layer, src, pos, d.nheads, pre_norm=d.pre_norm)
    if "encoder_norm" in params:
        src = layer_norm(params["encoder_norm"], src)

    query_pos = jnp.broadcast_to(params["query_embed"][None], (b,) + params["query_embed"].shape)
    tgt = jnp.zeros_like(query_pos)
    inter: List[jax.Array] = []
    for layer in params["dec_layers"]:
        tgt = transformer_decoder_layer_apply(layer, tgt, src, query_pos, pos, d.nheads,
                                              pre_norm=d.pre_norm)
        inter.append(layer_norm(params["decoder_norm"], tgt))

    hs = inter if deep_supervision else inter[-1:]
    mf = mask_features.astype(jnp.float32)
    all_logits = [linear(params["class_embed"], t) for t in hs] if mask_classification else None
    all_masks = [
        jnp.einsum("bqc,bhwc->bqhw", mlp_apply(params["mask_embed"], t).astype(jnp.float32), mf)
        for t in hs
    ]
    out: Dict = {"pred_masks": all_masks[-1]}
    if mask_classification:
        out["pred_logits"] = all_logits[-1]
        out["aux_outputs"] = [
            {"pred_logits": l, "pred_masks": m}
            for l, m in zip(all_logits[:-1], all_masks[:-1])
        ]
    else:
        out["aux_outputs"] = [{"pred_masks": m} for m in all_masks[:-1]]
    return out


# ---------------------------------------------------------------------------
# per-pixel baseline heads
# ---------------------------------------------------------------------------

def per_pixel_head_init(key, cfg: RbAConfig, in_channels: Dict[str, int]):
    """PerPixelBaselineHead (per_pixel_baseline.py:49-158): pixel decoder
    (built by PIXEL_DECODER_NAME dispatch) + a 1x1 predictor conv."""
    k1, k2 = jax.random.split(key)
    pd_init, _ = build_pixel_decoder(cfg)
    return {
        "pixel_decoder": pd_init(k1, in_channels),
        "predictor": init_conv2d(k2, 1, 1, cfg.pixel_decoder.mask_dim, cfg.num_classes),
    }


def per_pixel_head_apply(
    params, cfg: RbAConfig, features: Dict[str, jax.Array], dtype=jnp.float32
) -> jax.Array:
    """→ (B, K, H/4, W/4) per-pixel class logits."""
    _, pd_apply = build_pixel_decoder(cfg)
    mask_features, _, _ = pd_apply(params["pixel_decoder"], features, dtype)
    logits = conv2d(params["predictor"], mask_features.astype(jnp.float32))
    return jnp.transpose(logits, (0, 3, 1, 2))


def _plus_predictor_in_channels(cfg: RbAConfig, in_channels: Dict[str, int]) -> int:
    in_feat = cfg.decoder.transformer_in_feature
    if in_feat in ("transformer_encoder", "multi_scale_pixel_decoder"):
        return cfg.pixel_decoder.conv_dim
    if in_feat == "pixel_embedding":
        return cfg.pixel_decoder.mask_dim
    return in_channels[in_feat]


def per_pixel_plus_head_init(key, cfg: RbAConfig, in_channels: Dict[str, int]):
    """PerPixelBaselinePlusHead (per_pixel_baseline.py:205-344): pixel
    decoder + a StandardTransformerDecoder predictor with
    ``mask_classification=False`` — its Q = num_classes pred_masks channels
    ARE the per-pixel class logits, deep-supervised per decoder layer."""
    k1, k2 = jax.random.split(key)
    pd_init, _ = build_pixel_decoder(cfg)
    return {
        "pixel_decoder": pd_init(k1, in_channels),
        "predictor": standard_decoder_init(
            k2, cfg, _plus_predictor_in_channels(cfg, in_channels),
            mask_classification=False,
        ),
    }


def per_pixel_plus_head_apply(
    params, cfg: RbAConfig, features: Dict[str, jax.Array], dtype=jnp.float32
) -> Tuple[jax.Array, List[Dict]]:
    """→ ((B, K, H/4, W/4) logits, aux list of {"pred_masks"} per decoder
    layer) following PerPixelBaselinePlusHead.layers (:326-344)."""
    _, pd_apply = build_pixel_decoder(cfg)
    mask_features, enc_feat, _ = pd_apply(params["pixel_decoder"], features, dtype)
    in_feat = cfg.decoder.transformer_in_feature
    if in_feat == "transformer_encoder":
        if enc_feat is None:
            raise ValueError(
                "transformer_in_feature='transformer_encoder' requires the "
                "TransformerEncoderPixelDecoder (reference :331-333)"
            )
        x = enc_feat
    elif in_feat == "pixel_embedding":
        x = mask_features
    else:
        x = features[in_feat]
    out = standard_decoder_apply(params["predictor"], cfg, x, mask_features)
    return out["pred_masks"], out.get("aux_outputs", [])


# ---------------------------------------------------------------------------
# per-pixel baseline losses (per_pixel_baseline.py:160-201, 303-324)
# ---------------------------------------------------------------------------

def _nearest_point_sample_labels(targets: jax.Array, coords: jax.Array) -> jax.Array:
    """Sample (B, H, W) integer labels at normalized coords with
    grid_sample ``mode="nearest", align_corners=False`` semantics →
    (B, P) int labels (out-of-range points land on 0 after clamping, matching
    torch's zero padding on the float cast)."""
    b, h, w = targets.shape
    x = jnp.round(coords[..., 0] * w - 0.5).astype(jnp.int32)
    y = jnp.round(coords[..., 1] * h - 0.5).astype(jnp.int32)
    valid = (x >= 0) & (x < w) & (y >= 0) & (y < h)
    idx = jnp.clip(y, 0, h - 1) * w + jnp.clip(x, 0, w - 1)
    v = jnp.take_along_axis(targets.reshape(b, h * w), idx, axis=1)
    return jnp.where(valid, v, 0)


def _sem_seg_uncertainty(logits: jax.Array) -> jax.Array:
    """PointRend semantic uncertainty: second-best minus best logit
    (per_pixel_baseline.py:23-37 calculate_uncertainty)."""
    top2 = jax.lax.top_k(jnp.moveaxis(logits, 1, -1), 2)[0]  # (B, ..., 2)
    return top2[..., 1] - top2[..., 0]


def per_pixel_loss(
    cfg: RbAConfig,
    rng,
    logits: jax.Array,   # (B, K, H/4, W/4)
    targets: jax.Array,  # (B, H, W) int labels, 255 = ignore
) -> jax.Array:
    """Cross-entropy with ignore label; point-rend sampled when
    cfg.loss.use_point_rend (reference losses(), :160-201)."""
    logits = logits.astype(jnp.float32)
    if cfg.loss.use_point_rend:
        from ..ops.point_sample import point_sample

        l = cfg.loss
        n_sampled = int(l.train_num_points * l.oversample_ratio)
        k1, k2 = jax.random.split(rng)
        cand = jax.random.uniform(k1, (logits.shape[0], n_sampled, 2))
        cand_logits = point_sample(logits, cand)  # (B, K, P)
        unc = _sem_seg_uncertainty(cand_logits)  # (B, P) higher = more uncertain
        n_unc = int(l.importance_sample_ratio * l.train_num_points)
        n_rand = l.train_num_points - n_unc
        _, idx = jax.lax.top_k(unc, n_unc)
        coords = jnp.take_along_axis(cand, idx[..., None], axis=1)
        if n_rand > 0:
            coords = jnp.concatenate(
                [coords, jax.random.uniform(k2, (logits.shape[0], n_rand, 2))], axis=1
            )
        point_logits = point_sample(logits, coords)  # (B, K, P)
        point_labels = jax.lax.stop_gradient(
            _nearest_point_sample_labels(targets, coords)
        )
        logp = jax.nn.log_softmax(point_logits, axis=1)
        picked = jnp.take_along_axis(logp, point_labels[:, None, :] % logits.shape[1], axis=1)[:, 0]
        # any label >= K is dropped, not just `ignore` (255): e.g. the
        # coco-mix mappers write ood_label=254, which the reference
        # F.cross_entropy(ignore_index=255) would loudly reject as an
        # out-of-range target — silently folding it mod K would train
        # toward an arbitrary inlier class
        keep = (point_labels < logits.shape[1]).astype(jnp.float32)
        return -(picked * keep).sum() / jnp.maximum(keep.sum(), 1.0)
    # dense path: x4 bilinear upsample then CE ignoring 255 (:190-199)
    full = resize_bilinear(logits, targets.shape[-2:], align_corners=False)
    logp = jax.nn.log_softmax(full, axis=1)
    # see point path: labels >= K (ignore=255, ood_label=254, …) are dropped
    keep = (targets < full.shape[1]).astype(jnp.float32)
    safe = jnp.where(targets < full.shape[1], targets, 0)
    picked = jnp.take_along_axis(logp, safe[:, None], axis=1)[:, 0]
    return -(picked * keep).sum() / jnp.maximum(keep.sum(), 1.0)


def per_pixel_losses(
    cfg: RbAConfig, rng, logits: jax.Array, aux: Sequence[Dict], targets: jax.Array
) -> Dict[str, jax.Array]:
    """Head loss dict incl. deep supervision (reference forward(), :303-319):
    {"loss_sem_seg", "loss_sem_seg_0", ...}."""
    keys = jax.random.split(rng, 1 + len(aux))
    out = {"loss_sem_seg": per_pixel_loss(cfg, keys[0], logits, targets)}
    for i, a in enumerate(aux):
        out[f"loss_sem_seg_{i}"] = per_pixel_loss(cfg, keys[1 + i], a["pred_masks"], targets)
    return out
