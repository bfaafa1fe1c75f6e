"""Detectron2-style ResNet backbone (R-50/R-101) — JAX/NHWC.

Behavioral spec: the reference's R50/R101 configs use detectron2's
``build_resnet_backbone`` (configs/**/Base-*.yaml: DEPTH 50/101,
STRIDE_IN_1X1 False — the torchvision convention, OUT_FEATURES res2..res5).
Math follows torchvision ResNet exactly when stride_in_1x1=False: 7×7/2 stem
conv + BN + ReLU + 3×3/2 max pool, then four stages of bottleneck blocks
(1×1 → 3×3(stride) → 1×1, projection shortcut on the first block of each
stage), golden-tested against ``torchvision.models.resnet50``.

BatchNorm runs in inference mode (running stats folded); the reference's
training-time SyncBN statistics are a training concern our AdamW/pjit stack
would handle via batch-stat plumbing if ResNet training were ever exercised
(all released RbA checkpoints are Swin).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List

import jax
import jax.numpy as jnp

from ..config import ResNetConfig
from ..ops.nn import conv2d, init_conv2d


def _init_bn(dim):
    return {
        "scale": jnp.ones((dim,)),
        "bias": jnp.zeros((dim,)),
        "mean": jnp.zeros((dim,)),
        "var": jnp.ones((dim,)),
    }


def _bn(p, x, eps=1e-5):
    x32 = x.astype(jnp.float32)
    y = (x32 - p["mean"]) * jax.lax.rsqrt(p["var"] + eps) * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def resnet_init(key, cfg: ResNetConfig):
    keys = jax.random.split(key, 5)
    params: Dict = {
        "stem": {
            "conv1": init_conv2d(keys[0], 7, 7, 3, cfg.stem_out_channels, bias=False),
            "norm1": _init_bn(cfg.stem_out_channels),
        }
    }
    in_ch = cfg.stem_out_channels
    for stage, n_blocks in enumerate(cfg.stage_blocks):
        bottleneck = 64 * 2**stage
        out_ch = 256 * 2**stage
        skeys = jax.random.split(keys[1 + stage], n_blocks)
        blocks: List[Dict] = []
        for b in range(n_blocks):
            bkeys = jax.random.split(skeys[b], 4)
            blk: Dict = {
                "conv1": init_conv2d(bkeys[0], 1, 1, in_ch, bottleneck, bias=False),
                "norm1": _init_bn(bottleneck),
                "conv2": init_conv2d(bkeys[1], 3, 3, bottleneck, bottleneck, bias=False),
                "norm2": _init_bn(bottleneck),
                "conv3": init_conv2d(bkeys[2], 1, 1, bottleneck, out_ch, bias=False),
                "norm3": _init_bn(out_ch),
            }
            if b == 0:
                blk["shortcut"] = init_conv2d(bkeys[3], 1, 1, in_ch, out_ch, bias=False)
                blk["shortcut_norm"] = _init_bn(out_ch)
            blocks.append(blk)
            in_ch = out_ch
        params[f"res{stage + 2}"] = blocks
    return params


def resnet_apply(params, cfg: ResNetConfig, images: jax.Array,
                 compute_dtype=jnp.bfloat16) -> Dict[str, jax.Array]:
    x = images.astype(compute_dtype)
    x = conv2d(params["stem"]["conv1"], x, stride=2, padding=3)
    x = jax.nn.relu(_bn(params["stem"]["norm1"], x))
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )

    outs: Dict[str, jax.Array] = {}
    for stage in range(4):
        name = f"res{stage + 2}"
        stride = 1 if stage == 0 else 2
        for b, blk in enumerate(params[name]):
            s = stride if b == 0 else 1
            s1, s2 = (s, 1) if cfg.stride_in_1x1 else (1, s)
            shortcut = x
            if "shortcut" in blk:
                shortcut = _bn(blk["shortcut_norm"], conv2d(blk["shortcut"], x, stride=s))
            y = jax.nn.relu(_bn(blk["norm1"], conv2d(blk["conv1"], x, stride=s1)))
            y = jax.nn.relu(_bn(blk["norm2"], conv2d(blk["conv2"], y, stride=s2, padding=1)))
            y = _bn(blk["norm3"], conv2d(blk["conv3"], y))
            x = jax.nn.relu(shortcut + y)
        if name in cfg.out_features:
            outs[name] = x
    return outs
