"""MViTv2 backbone — JAX/NHWC.

Behavioral spec: /root/reference/mask2former/modeling/backbone/mvit.py
(MultiScaleAttention with depthwise qkv pooling + hybrid window attention
:42-183, MultiScaleBlock with projection/pool-skip :186-278, MViT stage
machinery :281-455: per-stage dim/head doubling at last_block_indexes,
adaptive kv stride halving, window size halving, q-stride 2 on the first
block after each stage boundary, global attention in the last block of
stages 2-4).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nn import conv2d, init_conv2d, init_layer_norm, init_linear, linear
from .vit import _ln, _rel_pos_resampled


@dataclass(frozen=True)
class MViTConfig:
    img_size: int = 512
    patch_kernel: Tuple[int, int] = (7, 7)
    patch_stride: Tuple[int, int] = (4, 4)
    patch_padding: Tuple[int, int] = (3, 3)
    embed_dim: int = 96
    depth: int = 24
    num_heads: int = 1
    last_block_indexes: Tuple[int, ...] = (1, 4, 20, 23)
    qkv_pool_kernel: Tuple[int, int] = (3, 3)
    adaptive_kv_stride: int = 4
    adaptive_window_size: int = 56
    residual_pooling: bool = True
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    use_abs_pos: bool = False
    use_rel_pos: bool = True
    pretrain_img_size: int = 224
    pretrain_use_cls_token: bool = True
    out_features: Tuple[str, ...] = ("scale2", "scale3", "scale4", "scale5")
    ln_eps: float = 1e-6


def _block_schedule(cfg: MViTConfig):
    """Static per-block hyperparameters mirroring the reference loop
    (mvit.py:365-418)."""
    sched = []
    dim, dim_out = cfg.embed_dim, cfg.embed_dim
    heads = cfg.num_heads
    stride_kv = cfg.adaptive_kv_stride
    window = cfg.adaptive_window_size
    input_size = cfg.img_size // cfg.patch_stride[0]
    lbi = cfg.last_block_indexes
    for i in range(cfg.depth):
        stride_kv_ = stride_kv * 2 if (i == lbi[1] or i == lbi[2]) else stride_kv
        window_ = 0 if i in lbi[1:] else window
        stride_q = 2 if (i - 1) in lbi else 1
        sched.append(
            dict(dim=dim, dim_out=dim_out, heads=heads, stride_q=stride_q,
                 stride_kv=stride_kv_, window=window_, input_size=input_size)
        )
        dim = dim_out
        if i in lbi:
            dim_out *= 2
            heads *= 2
            stride_kv = max(stride_kv // 2, 1)
        if (i - 1) in lbi:
            window //= 2
            input_size //= 2
    return sched


def mvit_init(key, cfg: MViTConfig):
    keys = jax.random.split(key, cfg.depth + 8)
    params: Dict = {
        "patch_embed": {
            "proj": init_conv2d(keys[0], cfg.patch_kernel[0], cfg.patch_kernel[1], 3, cfg.embed_dim)
        },
        "blocks": [],
    }
    if cfg.use_abs_pos:
        n = cfg.pretrain_img_size // cfg.patch_stride[0]
        tokens = n * n + (1 if cfg.pretrain_use_cls_token else 0)
        params["pos_embed"] = 0.02 * jax.random.normal(keys[1], (1, tokens, cfg.embed_dim))

    sched = _block_schedule(cfg)
    for i, s in enumerate(sched):
        bkeys = jax.random.split(keys[2 + i], 10)
        dim, dim_out, heads = s["dim"], s["dim_out"], s["heads"]
        hd = dim_out // heads
        pk = cfg.qkv_pool_kernel[0]
        blk: Dict = {
            "norm1": init_layer_norm(dim),
            "attn": {
                "qkv": init_linear(bkeys[0], dim, 3 * dim_out, bias=cfg.qkv_bias),
                "proj": init_linear(bkeys[1], dim_out, dim_out),
                "pool_q": init_conv2d(bkeys[2], pk, pk, 1, hd, bias=False),
                "norm_q": init_layer_norm(hd),
                "pool_k": init_conv2d(bkeys[3], pk, pk, 1, hd, bias=False),
                "norm_k": init_layer_norm(hd),
                "pool_v": init_conv2d(bkeys[4], pk, pk, 1, hd, bias=False),
                "norm_v": init_layer_norm(hd),
            },
            "norm2": init_layer_norm(dim_out),
            "mlp": {
                "fc1": init_linear(bkeys[5], dim_out, int(dim_out * cfg.mlp_ratio)),
                "fc2": init_linear(bkeys[6], int(dim_out * cfg.mlp_ratio), dim_out),
            },
        }
        if cfg.use_rel_pos:
            size = s["input_size"]
            rel_dim = 2 * max(size // s["stride_q"], size // s["stride_kv"]) - 1
            blk["attn"]["rel_pos_h"] = jnp.zeros((rel_dim, hd))
            blk["attn"]["rel_pos_w"] = jnp.zeros((rel_dim, hd))
        if dim != dim_out:
            blk["proj"] = init_linear(bkeys[7], dim, dim_out)
        params["blocks"].append(blk)
    for stage, i in enumerate(cfg.last_block_indexes):
        name = f"scale{stage + 2}"
        if name in cfg.out_features:
            params[f"{name}_norm"] = init_layer_norm(_block_schedule(cfg)[i]["dim_out"])
    return params


def _attention_pool(p, norm, x, stride, heads_dim, eps):
    """depthwise 3×3 pool conv + LN on (B*, H, W, hd)."""
    y = conv2d(p, x, stride=stride, padding=1, feature_group_count=x.shape[-1])
    if norm is not None:
        y = _ln(norm, y, eps)
    return y


def _window_part(x, ws):
    b, h, w, c = x.shape
    ph = (ws - h % ws) % ws
    pw = (ws - w % ws) % ws
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, ws, ws, c), (hp, wp)


def _window_unpart(xw, ws, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = xw.shape[0] // ((hp // ws) * (wp // ws))
    x = xw.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def _ms_attention(p, x, s, cfg: MViTConfig):
    b, h, w, _ = x.shape
    heads = s["heads"]
    dim_out = p["proj"]["kernel"].shape[0]
    hd = dim_out // heads
    qkv = linear(p["qkv"], x).reshape(b, h, w, 3, heads, hd)
    qkv = jnp.transpose(qkv, (3, 0, 4, 1, 2, 5)).reshape(3, b * heads, h, w, hd)
    q, k, v = qkv[0], qkv[1], qkv[2]

    q = _attention_pool(p["pool_q"], p["norm_q"], q, 1 if s["stride_q"] == 1 else s["stride_q"], hd, cfg.ln_eps)
    k = _attention_pool(p["pool_k"], p["norm_k"], k, s["stride_kv"], hd, cfg.ln_eps)
    v = _attention_pool(p["pool_v"], p["norm_v"], v, s["stride_kv"], hd, cfg.ln_eps)

    ori_q = q
    ws = s["window"]
    if ws:
        q_ws = ws // s["stride_q"]
        kv_ws = ws // s["stride_kv"]
        q, q_pad = _window_part(q, q_ws)
        k, _ = _window_part(k, kv_ws)
        v, _ = _window_part(v, kv_ws)
        q_hw, kv_hw = (q_ws, q_ws), (kv_ws, kv_ws)
    else:
        q_hw = q.shape[1:3]
        kv_hw = k.shape[1:3]

    qf = q.reshape(q.shape[0], q_hw[0] * q_hw[1], hd)
    kf = k.reshape(k.shape[0], kv_hw[0] * kv_hw[1], hd)
    vf = v.reshape(v.shape[0], kv_hw[0] * kv_hw[1], hd)

    # AMP-exact placement (torch autocast): compute-dtype logits, fp32 softmax
    attn = jnp.einsum("bqd,bkd->bqk", qf * (hd**-0.5), kf, preferred_element_type=x.dtype)
    if cfg.use_rel_pos:
        # resample in fp32 (torch autocast keeps F.interpolate fp32), cast after
        rh = _rel_pos_resampled(p["rel_pos_h"], q_hw[0], kv_hw[0]).astype(x.dtype)
        rw = _rel_pos_resampled(p["rel_pos_w"], q_hw[1], kv_hw[1]).astype(x.dtype)
        r_q = qf.reshape(-1, q_hw[0], q_hw[1], hd)
        rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, rh, preferred_element_type=x.dtype)
        rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, rw, preferred_element_type=x.dtype)
        attn = attn.reshape(-1, q_hw[0], q_hw[1], kv_hw[0], kv_hw[1])
        attn = attn + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
        attn = attn.reshape(-1, q_hw[0] * q_hw[1], kv_hw[0] * kv_hw[1])
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bqk,bkd->bqd", attn, vf, preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.reshape(-1, q_hw[0], q_hw[1], hd)

    if ws:
        out = _window_unpart(out, ws // s["stride_q"], q_pad, ori_q.shape[1:3])
    if cfg.residual_pooling:
        out = out + ori_q

    oh, ow = out.shape[1], out.shape[2]
    out = out.reshape(b, heads, oh, ow, hd)
    out = jnp.transpose(out, (0, 2, 3, 1, 4)).reshape(b, oh, ow, heads * hd)
    return linear(p["proj"], out)


def mvit_apply(params, cfg: MViTConfig, images: jax.Array, compute_dtype=jnp.bfloat16):
    x = images.astype(compute_dtype)
    x = conv2d(
        params["patch_embed"]["proj"], x, stride=cfg.patch_stride[0],
        padding=cfg.patch_padding[0],
    )
    if cfg.use_abs_pos and "pos_embed" in params:
        pe = params["pos_embed"]
        if cfg.pretrain_use_cls_token:
            pe = pe[:, 1:]
        n = int(math.sqrt(pe.shape[1]))
        pe = pe.reshape(1, n, n, -1)
        if (x.shape[1], x.shape[2]) != (n, n):
            # torch-parity bicubic (a=-0.75, no antialias), as in vit.py
            from ..ops.resize import resize_bicubic_nhwc

            pe = resize_bicubic_nhwc(pe, (x.shape[1], x.shape[2]))
        x = x + pe.astype(compute_dtype)

    sched = _block_schedule(cfg)
    outs: Dict[str, jax.Array] = {}
    stage = 2
    for i, (blk, s) in enumerate(zip(params["blocks"], sched)):
        xn = _ln(blk["norm1"], x, cfg.ln_eps)
        att = _ms_attention(blk["attn"], xn, s, cfg)
        skip = linear(blk["proj"], xn) if "proj" in blk else x
        if s["stride_q"] > 1:
            ksz = s["stride_q"] + 1
            pad = ksz // 2
            skip = jax.lax.reduce_window(
                skip, -jnp.inf, jax.lax.max, (1, ksz, ksz, 1),
                (1, s["stride_q"], s["stride_q"], 1),
                [(0, 0), (pad, pad), (pad, pad), (0, 0)],
            )
        x = skip + att
        y = _ln(blk["norm2"], x, cfg.ln_eps)
        x = x + linear(blk["mlp"]["fc2"], jax.nn.gelu(linear(blk["mlp"]["fc1"], y), approximate=False))
        if i in cfg.last_block_indexes:
            name = f"scale{stage}"
            if name in cfg.out_features:
                outs[name] = _ln(params[f"{name}_norm"], x, cfg.ln_eps)
            stage += 1
    return outs
