"""WiderResNet-38 A2 backbone — JAX/NHWC.

Behavioral spec: /root/reference/mask2former/modeling/backbone/
wideresnet38.py (IdentityResidualBlock :68-189 — pre-activation BN+ReLU,
2-conv wide blocks or 3-conv bottlenecks; WiderResNetA2 :271-422 — mod1
3×3 stem, max-pool downsampling for mod2/3, strided first block for mod4,
dilation 2/4/4 in mod5/6/7 when DILATION, final BN; outputs res4/res5/res6/
res7/res7_bn).  Structure "38" = (3, 3, 6, 3, 1, 1).

BatchNorm runs in inference mode (running stats folded); training this
backbone would need batch-stat plumbing, which the reference's RbA models
never exercise (all released checkpoints are Swin).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.nn import conv2d, init_conv2d

# per-module internal channels (public WiderResNet-A2 definition)
MODULE_CHANNELS: Tuple[Tuple[int, ...], ...] = (
    (128, 128),
    (256, 256),
    (512, 512),
    (512, 1024),
    (512, 1024, 2048),
    (1024, 2048, 4096),
)


@dataclass(frozen=True)
class WideResNetConfig:
    structure: Tuple[int, ...] = (3, 3, 6, 3, 1, 1)
    dilation: bool = True


def _init_bn(dim):
    return {
        "scale": jnp.ones((dim,)),
        "bias": jnp.zeros((dim,)),
        "mean": jnp.zeros((dim,)),
        "var": jnp.ones((dim,)),
    }


def _bn_relu(p, x):
    x32 = x.astype(jnp.float32)
    y = (x32 - p["mean"]) * jax.lax.rsqrt(p["var"] + 1e-5) * p["scale"] + p["bias"]
    return jax.nn.relu(y).astype(x.dtype)


def _init_block(key, in_ch: int, channels: Sequence[int], stride: int):
    keys = jax.random.split(key, 4)
    p: Dict = {"bn1": _init_bn(in_ch)}
    if len(channels) == 2:
        p["conv1"] = init_conv2d(keys[0], 3, 3, in_ch, channels[0], bias=False)
        p["bn2"] = _init_bn(channels[0])
        p["conv2"] = init_conv2d(keys[1], 3, 3, channels[0], channels[1], bias=False)
    else:
        p["conv1"] = init_conv2d(keys[0], 1, 1, in_ch, channels[0], bias=False)
        p["bn2"] = _init_bn(channels[0])
        p["conv2"] = init_conv2d(keys[1], 3, 3, channels[0], channels[1], bias=False)
        p["bn3"] = _init_bn(channels[1])
        p["conv3"] = init_conv2d(keys[2], 1, 1, channels[1], channels[2], bias=False)
    if stride != 1 or in_ch != channels[-1]:
        p["proj_conv"] = init_conv2d(keys[3], 1, 1, in_ch, channels[-1], bias=False)
    return p


def _dilated_conv(p, x, stride, dilation, k=3):
    pad = dilation if k == 3 else 0
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y


def _block_apply(p, x, stride: int, dilation: int, bottleneck: bool):
    y = _bn_relu(p["bn1"], x)
    shortcut = conv2d(p["proj_conv"], y, stride=stride) if "proj_conv" in p else x
    if bottleneck:
        z = jax.lax.conv_general_dilated(
            y, p["conv1"]["kernel"].astype(y.dtype), (stride, stride), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        z = _bn_relu(p["bn2"], z)
        z = _dilated_conv(p["conv2"], z, 1, dilation)
        z = _bn_relu(p["bn3"], z)
        z = conv2d(p["conv3"], z)
    else:
        z = _dilated_conv(p["conv1"], y, stride, dilation)
        z = _bn_relu(p["bn2"], z)
        z = _dilated_conv(p["conv2"], z, 1, dilation)
    return shortcut + z


def _first_block_stride(mod: int, dilation: bool) -> int:
    """mod4 downsamples by strided conv always; mod5/mod6 stride only when
    dilation is off (reference WiderResNetA2: dilation replaces stride)."""
    if mod == 4:
        return 2
    if mod in (5, 6) and not dilation:
        return 2
    return 1


def _dilation_of(mod: int, dilation: bool) -> int:
    if not dilation:
        return 1
    return {2: 1, 3: 1, 4: 1, 5: 2, 6: 4, 7: 4}[mod]


def wideresnet_init(key, cfg: WideResNetConfig = WideResNetConfig()):
    keys = jax.random.split(key, 8)
    params: Dict = {"mod1": init_conv2d(keys[0], 3, 3, 3, 64, bias=False)}
    in_ch = 64
    for mod in range(2, 8):
        mkeys = jax.random.split(keys[mod - 1], cfg.structure[mod - 2])
        blocks = []
        for b in range(cfg.structure[mod - 2]):
            chans = MODULE_CHANNELS[mod - 2]
            stride = _first_block_stride(mod, cfg.dilation) if b == 0 else 1
            blocks.append(_init_block(mkeys[b], in_ch, chans, stride))
            in_ch = chans[-1]
        params[f"mod{mod}"] = blocks
    params["bn_out"] = _init_bn(in_ch)
    return params


def wideresnet_apply(params, cfg: WideResNetConfig, images: jax.Array,
                     compute_dtype=jnp.bfloat16) -> Dict[str, jax.Array]:
    x = images.astype(compute_dtype)
    x = conv2d(params["mod1"], x, padding=1)

    def maxpool(x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)],
        )

    outs: Dict[str, jax.Array] = {}
    for mod in range(2, 8):
        if mod in (2, 3):  # pool2/pool3 before mod2/mod3 (reference :383-385)
            x = maxpool(x)
        chans = MODULE_CHANNELS[mod - 2]
        bottleneck = len(chans) == 3
        for b, blk in enumerate(params[f"mod{mod}"]):
            stride = _first_block_stride(mod, cfg.dilation) if b == 0 else 1
            x = _block_apply(blk, x, stride, _dilation_of(mod, cfg.dilation), bottleneck)
        if mod >= 4:
            outs[f"res{mod}"] = x
    outs["res7_bn"] = _bn_relu(params["bn_out"], x)
    return outs
