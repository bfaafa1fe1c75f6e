"""MixVisionTransformer (SegFormer) backbone — JAX/NHWC.

Behavioral spec: /root/reference/mask2former/modeling/backbone/
mix_transformer.py (OverlapPatchEmbed :164-205, spatial-reduction Attention
:62-122, Mlp with depthwise conv :24-60, 4-stage MixVisionTransformer
:207-377, mit_b0..mit_b5 variants :395-492).  LayerNorm eps 1e-6.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nn import conv2d, init_conv2d, init_layer_norm, init_linear, linear


@dataclass(frozen=True)
class MiTConfig:
    embed_dims: Tuple[int, ...] = (64, 128, 320, 512)
    num_heads: Tuple[int, ...] = (1, 2, 5, 8)
    mlp_ratios: Tuple[int, ...] = (4, 4, 4, 4)
    depths: Tuple[int, ...] = (3, 4, 6, 3)
    sr_ratios: Tuple[int, ...] = (8, 4, 2, 1)
    qkv_bias: bool = True
    drop_path_rate: float = 0.1
    ln_eps: float = 1e-6


MIT_VARIANTS = {
    "mit_b0": MiTConfig(embed_dims=(32, 64, 160, 256), depths=(2, 2, 2, 2)),
    "mit_b1": MiTConfig(depths=(2, 2, 2, 2)),
    "mit_b2": MiTConfig(depths=(3, 4, 6, 3)),
    "mit_b3": MiTConfig(depths=(3, 4, 18, 3)),
    "mit_b4": MiTConfig(depths=(3, 8, 27, 3)),
    "mit_b5": MiTConfig(depths=(3, 6, 40, 3)),
}

_PATCH = ((7, 4), (3, 2), (3, 2), (3, 2))  # (kernel, stride) per stage


def _ln(params, x, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * params["scale"] + params["bias"]).astype(x.dtype)


def mit_init(key, cfg: MiTConfig):
    params: Dict = {"stages": []}
    in_ch = 3
    keys = jax.random.split(key, 4)
    for s in range(4):
        dim = cfg.embed_dims[s]
        k, stride = _PATCH[s]
        skeys = jax.random.split(keys[s], cfg.depths[s] + 2)
        stage = {
            "patch_embed": {
                "proj": init_conv2d(skeys[0], k, k, in_ch, dim),
                "norm": init_layer_norm(dim),
            },
            "blocks": [],
            "norm": init_layer_norm(dim),
        }
        for b in range(cfg.depths[s]):
            bkeys = jax.random.split(skeys[1 + b], 8)
            hidden = dim * cfg.mlp_ratios[s]
            blk = {
                "norm1": init_layer_norm(dim),
                "attn": {
                    "q": init_linear(bkeys[0], dim, dim, bias=cfg.qkv_bias),
                    "kv": init_linear(bkeys[1], dim, 2 * dim, bias=cfg.qkv_bias),
                    "proj": init_linear(bkeys[2], dim, dim),
                },
                "norm2": init_layer_norm(dim),
                "mlp": {
                    "fc1": init_linear(bkeys[3], dim, hidden),
                    "dwconv": init_conv2d(bkeys[4], 3, 3, 1, hidden),  # depthwise
                    "fc2": init_linear(bkeys[5], hidden, dim),
                },
            }
            if cfg.sr_ratios[s] > 1:
                blk["attn"]["sr"] = init_conv2d(
                    bkeys[6], cfg.sr_ratios[s], cfg.sr_ratios[s], dim, dim
                )
                blk["attn"]["sr_norm"] = init_layer_norm(dim)
            stage["blocks"].append(blk)
        params["stages"].append(stage)
        in_ch = dim
    return params


def _attention(p, x, h, w, num_heads, sr_ratio, eps):
    b, n, c = x.shape
    hd = c // num_heads
    q = linear(p["q"], x).reshape(b, n, num_heads, hd)
    if sr_ratio > 1:
        xs = x.reshape(b, h, w, c)
        xs = conv2d(p["sr"], xs, stride=sr_ratio, padding="VALID")
        xs = xs.reshape(b, -1, c)
        xs = _ln(p["sr_norm"], xs, eps)
        kv_in = xs
    else:
        kv_in = x
    kv = linear(p["kv"], kv_in).reshape(b, -1, 2, num_heads, hd)
    k, v = kv[:, :, 0], kv[:, :, 1]
    # AMP-exact placement (torch autocast): logits stay in compute dtype
    # (bf16 matmul output on TPU), softmax upcasts to fp32 internally.
    attn = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=x.dtype)
    attn = attn * jnp.asarray(hd**-0.5, x.dtype)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v, preferred_element_type=jnp.float32)
    return linear(p["proj"], out.astype(x.dtype).reshape(b, n, c))


def _mlp(p, x, h, w):
    b, n, c = x.shape
    y = linear(p["fc1"], x)
    hidden = y.shape[-1]
    y = y.reshape(b, h, w, hidden)
    y = conv2d(p["dwconv"], y, padding=1, feature_group_count=hidden)
    y = jax.nn.gelu(y.reshape(b, n, hidden), approximate=False)
    return linear(p["fc2"], y)


def mit_apply(params, cfg: MiTConfig, images: jax.Array, compute_dtype=jnp.bfloat16):
    """(B, H, W, 3) → {res2..res5} NHWC feature maps (stage1..4 renamed to
    the res* convention for head compatibility)."""
    x = images.astype(compute_dtype)
    outs = {}
    for s in range(4):
        p = params["stages"][s]
        k, stride = _PATCH[s]
        x = conv2d(p["patch_embed"]["proj"], x, stride=stride, padding=k // 2)
        b, h, w, dim = x.shape
        x = x.reshape(b, h * w, dim)
        x = _ln(p["patch_embed"]["norm"], x, cfg.ln_eps)
        for blk in p["blocks"]:
            x = x + _attention(
                blk["attn"], _ln(blk["norm1"], x, cfg.ln_eps), h, w,
                cfg.num_heads[s], cfg.sr_ratios[s], cfg.ln_eps,
            )
            x = x + _mlp(blk["mlp"], _ln(blk["norm2"], x, cfg.ln_eps), h, w)
        x = _ln(p["norm"], x, cfg.ln_eps)
        x = x.reshape(b, h, w, dim)
        outs[f"res{s + 2}"] = x
    return outs
