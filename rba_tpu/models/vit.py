"""ViTDet backbone (plain ViT + window blocks + SimpleFeaturePyramid) — JAX/NHWC.

Behavioral spec: /root/reference/mask2former/modeling/backbone/vit.py
(Attention with decomposed relative positions :34-91, window/global Block
:154-236, ViT.forward :353-366 returning a single "last_feat",
SimpleFeaturePyramid :433-594) and backbone/utils.py (window partition
:21-66, get_rel_pos / add_decomposed_rel_pos :69-130, get_abs_pos).
LayerNorm eps 1e-6.
"""
from __future__ import annotations

import functools
import math
from dataclasses import dataclass, field
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nn import conv2d, init_conv2d, init_layer_norm, init_linear, linear, trunc_normal


@dataclass(frozen=True)
class ViTConfig:
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    use_abs_pos: bool = True
    use_rel_pos: bool = True
    window_size: int = 14
    window_block_indexes: Tuple[int, ...] = (0, 1, 3, 4, 6, 7, 9, 10)
    residual_block_indexes: Tuple[int, ...] = ()
    pretrain_img_size: int = 224
    pretrain_use_cls_token: bool = True
    ln_eps: float = 1e-6


def _ln(p, x, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]).astype(x.dtype)


def _rel_pos_resampled(rel_pos: jax.Array, q_size: int, k_size: int) -> jax.Array:
    """get_rel_pos (utils.py:69-98): linearly resample the table to
    2·max(q,k)−1 entries, then index by clamped relative coordinates."""
    max_rel = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel:
        from ..ops.resize import _interp_coeffs

        lo, hi, frac = _interp_coeffs(rel_pos.shape[0], max_rel, align_corners=False)
        rel_pos = (
            rel_pos[jnp.asarray(lo)] * (1 - jnp.asarray(frac))[:, None]
            + rel_pos[jnp.asarray(hi)] * jnp.asarray(frac)[:, None]
        )
    q_coords = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[jnp.asarray(rel.astype(np.int64))]  # (q, k, hd)


def _attention(p, x, num_heads: int, use_rel_pos: bool):
    b, h, w, c = x.shape
    n = h * w
    hd = c // num_heads
    qkv = linear(p["qkv"], x).reshape(b, n, 3, num_heads, hd)
    q = qkv[:, :, 0].transpose(0, 2, 1, 3).reshape(b * num_heads, n, hd)
    k = qkv[:, :, 1].transpose(0, 2, 1, 3).reshape(b * num_heads, n, hd)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3).reshape(b * num_heads, n, hd)

    # AMP-exact placement (torch autocast): the qk and rel-pos einsums emit
    # compute-dtype logits (bf16 on TPU), softmax upcasts to fp32 internally.
    attn = jnp.einsum("bqd,bkd->bqk", q * (hd**-0.5), k, preferred_element_type=x.dtype)

    if use_rel_pos:
        # add_decomposed_rel_pos (utils.py:101-130)
        # resample in fp32 (torch autocast keeps F.interpolate fp32 and only
        # casts the einsum inputs), then cast the table to compute dtype
        rh = _rel_pos_resampled(p["rel_pos_h"], h, h).astype(x.dtype)  # (h, h, hd)
        rw = _rel_pos_resampled(p["rel_pos_w"], w, w).astype(x.dtype)
        r_q = q.reshape(b * num_heads, h, w, hd)
        rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, rh, preferred_element_type=x.dtype)
        rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, rw, preferred_element_type=x.dtype)
        attn = attn.reshape(b * num_heads, h, w, h, w)
        attn = attn + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
        attn = attn.reshape(b * num_heads, n, n)

    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bqk,bkd->bqd", attn, v, preferred_element_type=jnp.float32)
    out = out.astype(x.dtype).reshape(b, num_heads, h, w, hd)
    out = jnp.transpose(out, (0, 2, 3, 1, 4)).reshape(b, h, w, c)
    return linear(p["proj"], out)


def _block_apply(p, x, cfg: ViTConfig, window_size: int):
    shortcut = x
    x = _ln(p["norm1"], x, cfg.ln_eps)
    b, h, w, c = x.shape
    if window_size > 0:
        ph = (window_size - h % window_size) % window_size
        pw = (window_size - w % window_size) % window_size
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        hp, wp = h + ph, w + pw
        x = x.reshape(b, hp // window_size, window_size, wp // window_size, window_size, c)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, window_size, window_size, c)
    x = _attention(p["attn"], x, cfg.num_heads, cfg.use_rel_pos)
    if window_size > 0:
        x = x.reshape(b, hp // window_size, wp // window_size, window_size, window_size, c)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, hp, wp, c)
        x = x[:, :h, :w]
    x = shortcut + x
    y = _ln(p["norm2"], x, cfg.ln_eps)
    y = linear(p["mlp"]["fc2"], jax.nn.gelu(linear(p["mlp"]["fc1"], y), approximate=False))
    x = x + y
    if "residual" in p:
        # ResBottleneckBlock (vit.py:93-151): 1x1 → 3x3 → 1x1 with LN + GELU
        r = p["residual"]
        z = jax.nn.gelu(_ln(r["norm1"], conv2d(r["conv1"], x)), approximate=False)
        z = jax.nn.gelu(_ln(r["norm2"], conv2d(r["conv2"], z, padding=1)), approximate=False)
        z = _ln(r["norm3"], conv2d(r["conv3"], z))
        x = x + z
    return x


def vit_init(key, cfg: ViTConfig):
    keys = jax.random.split(key, cfg.depth + 2)
    params: Dict = {
        "patch_embed": {"proj": init_conv2d(keys[0], cfg.patch_size, cfg.patch_size, 3, cfg.embed_dim)}
    }
    if cfg.use_abs_pos:
        n = cfg.pretrain_img_size // cfg.patch_size
        tokens = n * n + (1 if cfg.pretrain_use_cls_token else 0)
        params["pos_embed"] = trunc_normal(keys[1], (1, tokens, cfg.embed_dim), std=0.02)
    params["blocks"] = []
    hd = cfg.embed_dim // cfg.num_heads
    for i in range(cfg.depth):
        bkeys = jax.random.split(keys[2 + i], 8)
        ws = cfg.window_size if i in cfg.window_block_indexes else 0
        size = ws if ws > 0 else cfg.pretrain_img_size // cfg.patch_size
        blk = {
            "norm1": init_layer_norm(cfg.embed_dim),
            "attn": {
                "qkv": init_linear(bkeys[0], cfg.embed_dim, 3 * cfg.embed_dim, bias=cfg.qkv_bias),
                "proj": init_linear(bkeys[1], cfg.embed_dim, cfg.embed_dim),
            },
            "norm2": init_layer_norm(cfg.embed_dim),
            "mlp": {
                "fc1": init_linear(bkeys[2], cfg.embed_dim, int(cfg.embed_dim * cfg.mlp_ratio)),
                "fc2": init_linear(bkeys[3], int(cfg.embed_dim * cfg.mlp_ratio), cfg.embed_dim),
            },
        }
        if cfg.use_rel_pos:
            blk["attn"]["rel_pos_h"] = jnp.zeros((2 * size - 1, hd))
            blk["attn"]["rel_pos_w"] = jnp.zeros((2 * size - 1, hd))
        if i in cfg.residual_block_indexes:
            d = cfg.embed_dim
            blk["residual"] = {
                "conv1": init_conv2d(bkeys[4], 1, 1, d, d // 2, bias=False),
                "norm1": init_layer_norm(d // 2),
                "conv2": init_conv2d(bkeys[5], 3, 3, d // 2, d // 2, bias=False),
                "norm2": init_layer_norm(d // 2),
                "conv3": init_conv2d(bkeys[6], 1, 1, d // 2, d, bias=False),
                "norm3": init_layer_norm(d),
            }
        params["blocks"].append(blk)
    return params


def vit_apply(params, cfg: ViTConfig, images: jax.Array, compute_dtype=jnp.bfloat16):
    """(B, H, W, 3) → {"last_feat": (B, H/16, W/16, C)} (D2ViT contract)."""
    x = images.astype(compute_dtype)
    p = cfg.patch_size
    x = conv2d(params["patch_embed"]["proj"], x, stride=p, padding="VALID")
    if cfg.use_abs_pos and "pos_embed" in params:
        pe = params["pos_embed"]
        if cfg.pretrain_use_cls_token:
            pe = pe[:, 1:]
        n = int(math.sqrt(pe.shape[1]))
        pe = pe.reshape(1, n, n, -1)
        if (x.shape[1], x.shape[2]) != (n, n):
            # torch-parity bicubic (a=-0.75, no antialias) — get_abs_pos
            # in the reference backbone/utils.py uses F.interpolate
            from ..ops.resize import resize_bicubic_nhwc

            pe = resize_bicubic_nhwc(pe, (x.shape[1], x.shape[2]))
        x = x + pe.astype(compute_dtype)
    for i, blk in enumerate(params["blocks"]):
        ws = cfg.window_size if i in cfg.window_block_indexes else 0
        x = _block_apply(blk, x, cfg, ws)
    return {"last_feat": x}


# ---------------------------------------------------------------------------
# SimpleFeaturePyramid (vit.py:433-594)
# ---------------------------------------------------------------------------

def sfp_init(key, dim: int, out_channels: int = 256,
             scale_factors: Sequence[float] = (4.0, 2.0, 1.0, 0.5)):
    keys = jax.random.split(key, 4 * len(scale_factors))
    stages = []
    for i, scale in enumerate(scale_factors):
        sk = jax.random.split(keys[i], 4)
        stage: Dict = {"scale": scale}
        if scale == 4.0:
            stage["up1"] = init_conv2d(sk[0], 2, 2, dim, dim // 2)  # conv-transpose
            stage["up1_norm"] = init_layer_norm(dim // 2)
            stage["up2"] = init_conv2d(sk[1], 2, 2, dim // 2, dim // 4)
            out_dim = dim // 4
        elif scale == 2.0:
            stage["up1"] = init_conv2d(sk[0], 2, 2, dim, dim // 2)
            out_dim = dim // 2
        elif scale == 1.0:
            out_dim = dim
        elif scale == 0.5:
            out_dim = dim
        else:
            raise NotImplementedError(scale)
        stage["lateral"] = {
            "conv": init_conv2d(sk[2], 1, 1, out_dim, out_channels, bias=False),
            "norm": init_layer_norm(out_channels),
        }
        stage["output"] = {
            "conv": init_conv2d(sk[3], 3, 3, out_channels, out_channels, bias=False),
            "norm": init_layer_norm(out_channels),
        }
        stages.append(stage)
    return {"stages": stages}


def _conv_transpose(p, x, stride=2):
    y = jax.lax.conv_transpose(
        x,
        p["kernel"].astype(x.dtype),
        strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def sfp_apply(params, features: jax.Array, ln_eps: float = 1e-6) -> Dict[str, jax.Array]:
    """last_feat (stride 16) → {res2..res5} at strides 4/8/16/32."""
    outs = {}
    names = {4.0: "res2", 2.0: "res3", 1.0: "res4", 0.5: "res5"}
    for stage in params["stages"]:
        x = features
        scale = stage["scale"]
        if scale == 4.0:
            x = _conv_transpose(stage["up1"], x)
            x = jax.nn.gelu(_ln(stage["up1_norm"], x, ln_eps), approximate=False)
            x = _conv_transpose(stage["up2"], x)
        elif scale == 2.0:
            x = _conv_transpose(stage["up1"], x)
        elif scale == 0.5:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
        x = _ln(stage["lateral"]["norm"], conv2d(stage["lateral"]["conv"], x), ln_eps)
        x = _ln(stage["output"]["norm"], conv2d(stage["output"]["conv"], x, padding=1), ln_eps)
        outs[names[scale]] = x
    return outs
