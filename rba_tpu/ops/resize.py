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
    (detectron2.modeling.postprocessing.sem_seg_postprocess)

PyTorch (antialias off) samples the source at
    src = (dst + 0.5) * (in/out) - 0.5            # align_corners=False
    src = dst * (in-1)/(out-1)                    # align_corners=True
then clamps the *neighbor indices* to [0, in-1] (border replicate).

We implement the resize separably as two dense matmuls with precomputed
interpolation matrices.  Each output row/col depends on ≤2 input rows/cols so
the matrices are 2-sparse, but expressing them as dense (out, in) matmuls maps
straight onto the TPU MXU and lets XLA fuse the surrounding elementwise work —
this beats a gather formulation for the big final upsample (Q×H×W fp32 map).
The matrices are built in numpy at trace time (shapes are static under jit).
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense (out_size, in_size) bilinear interpolation matrix (float32)."""
    w = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        w[:, 0] = 1.0
        return w
    dst = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            src = np.zeros((1,), dtype=np.float64)
        else:
            src = dst * (in_size - 1) / (out_size - 1)
    else:
        src = (dst + 0.5) * (in_size / out_size) - 0.5
    # torch clamps src to >= 0 before splitting into floor/frac
    src = np.clip(src, 0.0, None)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float64)
    frac = np.clip(frac, 0.0, 1.0)
    np.add.at(w, (np.arange(out_size), lo), (1.0 - frac).astype(np.float32))
    np.add.at(w, (np.arange(out_size), hi), frac.astype(np.float32))
    return w


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
        return x
    compute_dtype = dtype or (x.dtype if x.dtype in (jnp.float32, jnp.float64) else jnp.float32)
    mh = jnp.asarray(_interp_matrix(h_in, h_out, align_corners), dtype=compute_dtype)
    mw = jnp.asarray(_interp_matrix(w_in, w_out, align_corners), dtype=compute_dtype)
    y = x.astype(compute_dtype)
    # (..., H_in, W_in) -> (..., H_out, W_in): contract H_in with mh^T.
    # HIGHEST precision keeps the fp32 interpolation exact on the MXU.
    y = jnp.einsum("...hw,oh->...ow", y, mh, precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("...hw,ow->...ho", y, mw, precision=jax.lax.Precision.HIGHEST)
    return y.astype(x.dtype) if dtype is None else y


def resize_bilinear_nhwc(
    x: jax.Array, out_hw: Tuple[int, int], align_corners: bool = False
) -> jax.Array:
    """Resize (N, H, W, C) images on the H/W axes."""
    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    compute_dtype = x.dtype if x.dtype in (jnp.float32, jnp.float64) else jnp.float32
    mh = jnp.asarray(_interp_matrix(h_in, h_out, align_corners), dtype=compute_dtype)
    mw = jnp.asarray(_interp_matrix(w_in, w_out, align_corners), dtype=compute_dtype)
    y = x.astype(compute_dtype)
    y = jnp.einsum("nhwc,oh->nowc", y, mh, precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("nhwc,ow->nhoc", y, mw, precision=jax.lax.Precision.HIGHEST)
    return y.astype(x.dtype)
