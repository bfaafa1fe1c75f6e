"""Bilinear resize with exact PyTorch ``F.interpolate`` semantics.

The reference model interleaves several bilinear resizes whose sub-pixel
conventions matter for score parity (SURVEY.md §7 "hard parts"):
  * decoder attention-mask downsample — align_corners=False
    (/root/reference/mask2former/modeling/transformer_decoder/
     mask2former_transformer_decoder.py:483)
  * FPN top-down upsample — align_corners=False
    (/root/reference/mask2former/modeling/pixel_decoder/msdeformattn.py:358)
  * final mask upsample to padded input size — align_corners=False
    (/root/reference/mask2former/maskformer_model.py:294-299)
  * sem_seg_postprocess resize to original resolution — align_corners=False

PyTorch (antialias off) samples the source at
    src = (dst + 0.5) * (in/out) - 0.5            # align_corners=False
    src = dst * (in-1)/(out-1)                    # align_corners=True
then clamps the *neighbor indices* to [0, in-1] (border replicate).

Implementation: separable 1-D interpolation, each output row/col =
w0·in[lo] + w1·in[lo+1hi], expressed as two gathers + a lerp.  Bilinear is
2-sparse, so a gather is O(out) HBM traffic while a dense interp-matrix
matmul would be O(out·in) MXU work — at the final mask upsample
(Q=100 × 1024×2048 from 256×512) the dense form costs ~240 GFLOPs; the
gather form streams ~1 GB.  Indices/weights are numpy constants (shapes are
static under jit).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _interp_coeffs(in_size: int, out_size: int, align_corners: bool):
    """Per output index: (lo, hi, frac) with torch clamping semantics."""
    dst = np.arange(out_size, dtype=np.float64)
    if in_size == 1:
        lo = np.zeros(out_size, np.int32)
        return lo, lo, np.zeros(out_size, np.float32)
    if align_corners:
        src = np.zeros_like(dst) if out_size == 1 else dst * (in_size - 1) / (out_size - 1)
    else:
        src = (dst + 0.5) * (in_size / out_size) - 0.5
    src = np.clip(src, 0.0, None)
    lo = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = np.clip(src - lo, 0.0, 1.0).astype(np.float32)
    return lo.astype(np.int32), hi.astype(np.int32), frac


def _interp_axis(y: jax.Array, axis: int, in_size: int, out_size: int, align_corners: bool):
    lo, hi, frac = _interp_coeffs(in_size, out_size, align_corners)
    lo_t = jnp.take(y, jnp.asarray(lo), axis=axis)
    hi_t = jnp.take(y, jnp.asarray(hi), axis=axis)
    shape = [1] * y.ndim
    shape[axis] = out_size
    f = jnp.asarray(frac).reshape(shape)
    return lo_t * (1.0 - f) + hi_t * f


def resize_bilinear(
    x: jax.Array,
    out_hw: Tuple[int, int],
    align_corners: bool = False,
    dtype=None,
) -> jax.Array:
    """Resize the last two axes of ``x`` (…, H, W) to ``out_hw``.

    Matches ``torch.nn.functional.interpolate(mode="bilinear",
    align_corners=…, antialias=False)`` exactly (up to fp associativity).
    """
    h_in, w_in = x.shape[-2], x.shape[-1]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x if dtype is None else x.astype(dtype)
    compute_dtype = dtype or (x.dtype if x.dtype in (jnp.float32, jnp.float64) else jnp.float32)
    y = x.astype(compute_dtype)
    y = _interp_axis(y, x.ndim - 2, h_in, h_out, align_corners)
    y = _interp_axis(y, x.ndim - 1, w_in, w_out, align_corners)
    return y.astype(x.dtype) if dtype is None else y


@functools.lru_cache(maxsize=256)
def _cubic_coeffs(in_size: int, out_size: int, align_corners: bool):
    """Per output index: 4 neighbor indices + weights with torch
    ``F.interpolate(mode="bicubic", antialias=False)`` semantics: Keys cubic
    convolution kernel with a = -0.75 (torch's UpSampleKernel), neighbor
    indices clamped to the border (replicate)."""
    a = -0.75
    dst = np.arange(out_size, dtype=np.float64)
    if in_size == 1:
        idx = np.zeros((out_size, 4), np.int32)
        w = np.zeros((out_size, 4), np.float64)
        w[:, 1] = 1.0
        return idx, w.astype(np.float32)
    if align_corners:
        src = np.zeros_like(dst) if out_size == 1 else dst * (in_size - 1) / (out_size - 1)
    else:
        src = (dst + 0.5) * (in_size / out_size) - 0.5
    base = np.floor(src).astype(np.int64)
    t = src - base  # in [0, 1)

    def k(x):
        x = np.abs(x)
        return np.where(
            x <= 1.0,
            ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
            np.where(x < 2.0, ((a * x - 5.0 * a) * x + 8.0 * a) * x - 4.0 * a, 0.0),
        )

    offs = np.arange(-1, 3)
    w = k(t[:, None] - offs[None, :])  # (out, 4)
    idx = np.clip(base[:, None] + offs[None, :], 0, in_size - 1).astype(np.int32)
    return idx, w.astype(np.float32)


def _interp_axis_cubic(y, axis, in_size, out_size, align_corners):
    idx, w = _cubic_coeffs(in_size, out_size, align_corners)
    shape = [1] * y.ndim
    shape[axis] = out_size
    acc = None
    for j in range(4):
        tap = jnp.take(y, jnp.asarray(idx[:, j]), axis=axis)
        wj = jnp.asarray(w[:, j]).reshape(shape)
        acc = tap * wj if acc is None else acc + tap * wj
    return acc


def resize_bicubic(
    x: jax.Array, out_hw: Tuple[int, int], align_corners: bool = False
) -> jax.Array:
    """Resize the last two axes (…, H, W) with exact torch bicubic semantics
    (a = -0.75, antialias=False) — unlike ``jax.image.resize(\"bicubic\")``,
    which uses the Keys a = -0.5 kernel with antialiasing.  Used for
    position-embedding resizing (reference swin.py:610, vit/mvit
    ``get_abs_pos``) where the convention affects numeric parity."""
    h_in, w_in = x.shape[-2], x.shape[-1]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    compute_dtype = x.dtype if x.dtype in (jnp.float32, jnp.float64) else jnp.float32
    y = x.astype(compute_dtype)
    y = _interp_axis_cubic(y, x.ndim - 2, h_in, h_out, align_corners)
    y = _interp_axis_cubic(y, x.ndim - 1, w_in, w_out, align_corners)
    return y.astype(x.dtype)


def resize_bicubic_nhwc(
    x: jax.Array, out_hw: Tuple[int, int], align_corners: bool = False
) -> jax.Array:
    """Torch-parity bicubic on the H/W axes of (N, H, W, C) — for APE /
    position-embedding resizing in the NHWC backbones."""
    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    compute_dtype = x.dtype if x.dtype in (jnp.float32, jnp.float64) else jnp.float32
    y = x.astype(compute_dtype)
    y = _interp_axis_cubic(y, 1, h_in, h_out, align_corners)
    y = _interp_axis_cubic(y, 2, w_in, w_out, align_corners)
    return y.astype(x.dtype)


def upsample2x_bilinear_nhwc(x: jax.Array, compute_dtype=None) -> jax.Array:
    """Exact 2× bilinear (align_corners=False) upsample of (N, H, W, C) as a
    depthwise lhs-dilated convolution instead of gathers.

    Math: out[2j] = 0.25·in[j−1] + 0.75·in[j]; out[2j+1] = 0.75·in[j] +
    0.25·in[j+1] (borders replicate) — identical to the gather form, but the
    windowed op keeps the producer's tiled layout: profiled on v5e, the
    gather path forced the FPN's fp32 3×3 conv output into a degenerate
    T(1,128) layout (4.45 ms for 155 GFLOPs)."""
    n, h, w, c = x.shape
    # default: upcast low-precision inputs to fp32 (parity semantics);
    # compute_dtype=bf16 keeps the two depthwise conv passes in bf16 (fast
    # serving — the fp32 intermediates were ~0.3-0.7 ms of pure HBM traffic
    # on the stride-4 FPN level per the trace split)
    dt = compute_dtype or (
        x.dtype if x.dtype in (jnp.float32, jnp.float64) else jnp.float32
    )
    y = x.astype(dt)
    y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    k1 = jnp.asarray([0.25, 0.75, 0.75, 0.25], dt)
    kh = jnp.tile(k1.reshape(4, 1, 1, 1), (1, 1, 1, c))  # HWIO depthwise
    kw = jnp.tile(k1.reshape(1, 4, 1, 1), (1, 1, 1, c))
    # edge-padded + 2x-dilated VALID conv with a 4-tap kernel lands exactly
    # on the (i+0.5)/2-0.5 sample grid: out[2j] = .25·in[j-1]+.75·in[j],
    # out[2j+1] = .75·in[j]+.25·in[j+1], output length exactly 2H
    y = jax.lax.conv_general_dilated(
        y, kh, window_strides=(1, 1), padding=[(0, 0), (0, 0)], lhs_dilation=(2, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )  # (N, 2H, W+2, C)
    y = jax.lax.conv_general_dilated(
        y, kw, window_strides=(1, 1), padding=[(0, 0), (0, 0)], lhs_dilation=(1, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )  # (N, 2H, 2W, C)
    return y.astype(x.dtype)


def resize_nearest_nhwc(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Nearest-neighbor resize of (N, H, W, C) with torch ``mode="nearest"``
    semantics (src = floor(dst * in/out)) — the FPN baseline pixel decoder's
    top-down upsample (/root/reference/mask2former/modeling/pixel_decoder/
    fpn.py:150: "Following FPN implementation, we use nearest upsampling")."""
    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    iy = np.minimum((np.arange(h_out) * h_in // h_out), h_in - 1).astype(np.int32)
    ix = np.minimum((np.arange(w_out) * w_in // w_out), w_in - 1).astype(np.int32)
    y = jnp.take(x, jnp.asarray(iy), axis=1)
    return jnp.take(y, jnp.asarray(ix), axis=2)


def resize_bilinear_nhwc(
    x: jax.Array, out_hw: Tuple[int, int], align_corners: bool = False,
    compute_dtype=None,
) -> jax.Array:
    """Resize (N, H, W, C) images on the H/W axes.  Exact 2× upsamples
    (the FPN top-down path) route to the conv-based kernel — bit-identical
    output, TPU-friendlier layout."""
    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    if not align_corners and (h_out, w_out) == (2 * h_in, 2 * w_in):
        return upsample2x_bilinear_nhwc(x, compute_dtype=compute_dtype)
    compute_dtype = compute_dtype or (
        x.dtype if x.dtype in (jnp.float32, jnp.float64) else jnp.float32
    )
    y = x.astype(compute_dtype)
    y = _interp_axis(y, 1, h_in, h_out, align_corners)
    y = _interp_axis(y, 2, w_in, w_out, align_corners)
    return y.astype(x.dtype)
