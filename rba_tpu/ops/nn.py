"""Small functional NN building blocks shared across the framework.

Parameters are plain pytrees (nested dicts of jnp arrays).  Conventions:
  * Linear kernels are stored (in, out) — JAX convention, the transpose of
    torch's (out, in).  The Detectron2 checkpoint converter transposes.
  * Conv kernels are HWIO; activations are NHWC (TPU-native layout).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def linear(params, x, precision=None):
    if "kernel_q" in params:
        # weight-only int8 (ops/quant.py): dequant inline so XLA fuses the
        # convert+scale into the matmul operand read (int8 bytes in HBM)
        k = params["kernel_q"].astype(x.dtype) * params["kscale"].astype(x.dtype)
    else:
        k = params["kernel"].astype(x.dtype)
    y = jnp.dot(x, k, precision=precision)
    if "bias" in params and params["bias"] is not None:
        y = y + params["bias"].astype(x.dtype)
    return y


def layer_norm(params, x, eps: float = 1e-5):
    """LayerNorm over the last axis, torch semantics (biased variance).

    Single-pass moments (var = E[x²] − E[x]²) — the two reductions are
    independent so XLA fuses them into ONE variadic reduce over the input
    (the dependent (x − mean)² form forces two full HBM passes; profiled ~2×
    the LN reduction cost at Swin-B 1024×2048).  This is also torch's own
    formulation, so parity improves rather than degrades."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    mean_sq = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def group_norm(params, x, num_groups: int = 32, eps: float = 1e-5):
    """GroupNorm over NHWC activations (channels last), torch semantics.
    Single-pass moments, as in layer_norm.

    The normalize is applied as a per-CHANNEL affine on the natural NHWC
    tensor — (x−μ)·r·γ + β ≡ x·(r·γ) + (β − μ·r·γ) with the group stats
    repeated to channel vectors — rather than on the (n,h,w,g,c/g) grouped
    reshape: XLA materializes the grouped normalize in a lane-split layout
    and pays two full relayout copies of the big tensor afterwards
    (profiled on v5e: ~0.8 ms per stride-4 FPN GroupNorm at Swin-B
    1024×2048).  Only the tiny (n,g) stats see the grouped view."""
    n, h, w, c = x.shape
    g = num_groups
    x32 = x.astype(jnp.float32)
    xg = x32.reshape(n, h * w, g, c // g)
    mean = jnp.mean(xg, axis=(1, 3))  # (n, g)
    mean_sq = jnp.mean(jnp.square(xg), axis=(1, 3))
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)  # (n, g)
    inv_c = jnp.repeat(inv, c // g, axis=1)  # (n, c)
    mean_c = jnp.repeat(mean, c // g, axis=1)
    scale = params["scale"].astype(jnp.float32)[None] * inv_c
    shift = params["bias"].astype(jnp.float32)[None] - mean_c * scale
    y = x32 * scale[:, None, None, :] + shift[:, None, None, :]
    return y.astype(x.dtype)


def conv2d(params, x, stride: int = 1, padding="SAME", feature_group_count: int = 1):
    """NHWC conv with HWIO kernel.

    Precision is left to XLA: A/B on v5e showed its implicit choice for f32
    convs beats both forced HIGH (+2.4 ms) and HIGHEST (+5.7 ms) on the
    fp32-pinned pixel decoder at Swin-B 1024×2048."""
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    kh, kw = params["kernel"].shape[:2]
    zero_pad = padding in ("SAME", "VALID") or padding == [(0, 0), (0, 0)]
    if kh == 1 and kw == 1 and stride == 1 and feature_group_count == 1 and zero_pad:
        # 1×1 stride-1 conv as a channel matmul: batch-1 NHWC convs hit a
        # batch-in-sublanes conv emitter that also pins degenerate
        # T(1,128)/T(2,128) output layouts on the fp32 FPN tail, dragging
        # follow-up relayout copies (profiled on v5e at Swin-B 1024×2048:
        # mask_features 1×1 conv 0.66 ms + 0.41 ms copy; the dot form takes
        # the plain matmul emitter).  Identical contraction (over C only).
        y = jnp.dot(x, params["kernel"].astype(x.dtype).reshape(x.shape[-1], -1))
        if "bias" in params and params["bias"] is not None:
            y = y + params["bias"].astype(x.dtype)
        return y
    y = jax.lax.conv_general_dilated(
        x,
        params["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
    )
    if "bias" in params and params["bias"] is not None:
        y = y + params["bias"].astype(x.dtype)
    return y


def conv2d_3x3_rowtiled(params, x, rows_per_tile: int = 8):
    """3×3 stride-1 SAME conv computed with image rows folded into the batch
    dim (manual space-to-batch, real 1-row halos — numerically identical
    arithmetic per output pixel).

    XLA's SpaceToBatchConverter performs this rewrite for batch-1 convs in
    small graphs, but in the full model it never fires on the fp32 FPN
    output convs, leaving a batch-in-sublanes emitter at ~40% of the
    space-to-batch speed (profiled on v5e at Swin-B 1024×2048: the res2
    256×512×256 conv+GN fusion runs 4.3 ms in-model vs ~1.3 ms estimated
    with the batched emitter).  Falls back to the plain conv when the shape
    doesn't tile."""
    n, h, w, c = x.shape
    if h % rows_per_tile or h <= rows_per_tile:
        return conv2d(params, x, padding=1)
    # batch images fold into the same tile axis (n·tiles conv batch): small
    # true batches (2-8) still land batch-in-sublanes emitters at <=50%
    # sublane utilization, the folded form keeps the batched emitter
    tiles = h // rows_per_tile
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    idx = (
        np.arange(tiles)[:, None] * rows_per_tile + np.arange(rows_per_tile + 2)[None, :]
    ).reshape(-1)
    xt = jnp.take(xp, jnp.asarray(idx), axis=1).reshape(
        n * tiles, rows_per_tile + 2, w, c
    )
    y = jax.lax.conv_general_dilated(
        xt,
        params["kernel"].astype(x.dtype),
        window_strides=(1, 1),
        padding=[(0, 0), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in params and params["bias"] is not None:
        y = y + params["bias"].astype(x.dtype)
    return y.reshape(n, h, w, y.shape[-1])


def mlp_apply(params, x, act=jax.nn.relu):
    """Multi-layer perceptron: relu between layers, none at the end
    (reference MLP: …/mask2former_transformer_decoder.py:200-212)."""
    n = len(params["layers"])
    for i, layer in enumerate(params["layers"]):
        x = linear(layer, x)
        if i < n - 1:
            x = act(x)
    return x


# ---------------------------------------------------------------------------
# Initializers (used for from-scratch training; converter overwrites these)
# ---------------------------------------------------------------------------

def trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    # torch trunc_normal_ truncates at ±2 std
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def xavier_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[-1]
    if len(shape) == 4:  # HWIO conv
        rf = shape[0] * shape[1]
        fan_in, fan_out = shape[2] * rf, shape[3] * rf
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def init_linear(key, d_in, d_out, bias=True, init=xavier_uniform):
    p = {"kernel": init(key, (d_in, d_out))}
    if bias:
        p["bias"] = jnp.zeros((d_out,), jnp.float32)
    return p


def init_layer_norm(dim):
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def init_conv2d(key, kh, kw, c_in, c_out, bias=True):
    # c2_msra_fill-like default (kaiming); exactness is irrelevant for eval
    fan_in = kh * kw * c_in
    std = math.sqrt(2.0 / fan_in)
    p = {"kernel": std * jax.random.normal(key, (kh, kw, c_in, c_out), jnp.float32)}
    if bias:
        p["bias"] = jnp.zeros((c_out,), jnp.float32)
    return p


def init_mlp(key, d_in, d_hidden, d_out, num_layers):
    dims = [d_in] + [d_hidden] * (num_layers - 1) + [d_out]
    keys = jax.random.split(key, num_layers)
    return {
        "layers": [init_linear(k, dims[i], dims[i + 1]) for i, k in enumerate(keys)]
    }
