"""Multi-scale deformable attention sampling — TPU-native formulation.

Behavioral spec: the CUDA kernel of the reference
(/root/reference/mask2former/modeling/pixel_decoder/ops/src/cuda/
ms_deform_im2col_cuda.cuh:242-303) and its pure-PyTorch equivalent
``ms_deform_attn_core_pytorch`` (/root/reference/mask2former/modeling/
pixel_decoder/ops/functions/ms_deform_attn_func.py:52-72): for each
(batch, query, head, point, level), bilinearly sample the per-head value map
at ``loc * (W, H) - 0.5`` with zero padding outside, multiply by the softmax
attention weight, and sum over levels × points.

TPU design: irregular fp-coordinate gathers are hostile to the MXU, so we
express the bilinear sample as four integer gathers + a lerp, batched over
(query, head, level, point) with static shapes.  Gradients come free via JAX
autodiff (the reference needed ~620 LoC of handwritten CUDA backward).  This
jnp formulation is the production path: XLA fuses the gathers+lerp into a
handful of custom fusions, and at the released 1-level eval configs
(Len_q = 32×64) the op is far off the critical path (~5 ms of a ~59 ms
forward; see TODO.md perf notes for the possible Pallas VMEM-resident
follow-up).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _bilinear_gather_level(
    value: jax.Array,  # (N, H, W, M, D) one level's value map, heads split
    loc: jax.Array,  # (N, Lq, M, P, 2) normalized [0, 1] sampling locations (x, y)
) -> jax.Array:  # (N, Lq, M, P, D)
    n, h, w, m, d = value.shape
    # grid_sample(align_corners=False) semantics: pixel centers at
    # (i + 0.5)/W; sample coordinate in pixel units is loc*W - 0.5.
    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def corner(yi, xi):
        # validity BEFORE clamping (zero padding outside)
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xc = jnp.clip(xi, 0, w - 1)
        yc = jnp.clip(yi, 0, h - 1)
        flat_idx = yc * w + xc  # (N, Lq, M, P)
        vflat = value.reshape(n, h * w, m, d)
        # gather per (batch, head): take_along_axis over the HW axis
        idx = flat_idx.transpose(0, 2, 1, 3).reshape(n, m, -1)  # (N, M, Lq*P)
        v = jnp.take_along_axis(
            vflat.transpose(0, 2, 1, 3),  # (N, M, HW, D)
            idx[..., None],
            axis=2,
        )  # (N, M, Lq*P, D)
        lq = loc.shape[1]
        p = loc.shape[3]
        v = v.reshape(n, m, lq, p, d).transpose(0, 2, 1, 3, 4)  # (N, Lq, M, P, D)
        return jnp.where(valid[..., None], v, 0.0)

    w00 = ((1 - tx) * (1 - ty))[..., None]
    w01 = (tx * (1 - ty))[..., None]
    w10 = ((1 - tx) * ty)[..., None]
    w11 = (tx * ty)[..., None]

    out = (
        corner(y0i, x0i) * w00
        + corner(y0i, x0i + 1) * w01
        + corner(y0i + 1, x0i) * w10
        + corner(y0i + 1, x0i + 1) * w11
    )
    return out


def _bilinear_gather_level_patch(
    value: jax.Array,  # (N, H, W, M, D)
    loc: jax.Array,  # (N, Lq, M, P, 2)
) -> jax.Array:  # (N, Lq, M, P, D)
    """Patch-gather formulation: the 4 bilinear corners of each sample lie in
    one 2×2 patch, so a single ``lax.gather`` with slice_sizes (2, 2, D) on a
    zero-padded map fetches all of them — 4× fewer gathers and 8× larger
    contiguous payloads than per-corner ``take_along_axis`` (TPU gathers are
    row-granular).  Out-of-range corners get zero weight, so clamped starts
    never contaminate the result."""
    n, h, w, m, d = value.shape
    _, lq, _, p, _ = loc.shape
    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0)[..., None]
    ty = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # zero-pad 1px so patch [y0+1 : y0+3) covers corners y0, y0+1
    vp = jnp.pad(value, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    vp = jnp.transpose(vp, (0, 3, 1, 2, 4)).reshape(n * m, h + 2, w + 2, d)

    cy = jnp.clip(y0i + 1, 0, h)  # start of a valid 2-slice in [0, h]
    cx = jnp.clip(x0i + 1, 0, w)
    starts = jnp.stack([cy, cx], axis=-1)  # (N, Lq, M, P, 2)
    starts = jnp.transpose(starts, (0, 2, 1, 3, 4)).reshape(n * m, lq * p, 2)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )

    def g(op, st):
        return jax.lax.gather(
            op, st, dnums, slice_sizes=(2, 2, d), mode=jax.lax.GatherScatterMode.CLIP
        )

    patches = jax.vmap(g)(vp, starts)  # (N*M, Lq*P, 2, 2, D)
    patches = patches.reshape(n, m, lq, p, 2, 2, d).transpose(0, 2, 1, 3, 4, 5, 6)

    def valid(yi, xi):
        return ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)).astype(jnp.float32)[..., None]

    w00 = (1 - tx) * (1 - ty) * valid(y0i, x0i)
    w01 = tx * (1 - ty) * valid(y0i, x0i + 1)
    w10 = (1 - tx) * ty * valid(y0i + 1, x0i)
    w11 = tx * ty * valid(y0i + 1, x0i + 1)
    return (
        patches[..., 0, 0, :] * w00
        + patches[..., 0, 1, :] * w01
        + patches[..., 1, 0, :] * w10
        + patches[..., 1, 1, :] * w11
    )


def _onehot_matmul_level(
    value: jax.Array,  # (N, H, W, M, D)
    loc: jax.Array,  # (N, Lq, M, P, 2)
    attn_w: jax.Array,  # (N, Lq, M, P)
    precision=jax.lax.Precision.HIGHEST,
    a_dtype=jnp.float32,
) -> jax.Array:  # (N, Lq, M, D)
    """One-hot-matmul formulation: fold the 4P (point x corner) bilinear x
    attention weights of each query into one sparse row of a dense
    (Lq, HW) matrix and contract it against the value map on the MXU —
    out[q, d] = sum_hw A[q, hw] * V[hw, d].  Sidesteps the index-rate-bound
    gather entirely (12.8 ns/index): measured on v5e at the released 1-level
    shape (32x64, Lq=2048, M=8, P=4, D=32) the full one-hot path runs
    0.34 ms vs 1.03 ms for the patch gather (tools/perf_deform_onehot.py).
    The A-construction is 4P compare-select-accumulate VPU passes over
    (M, Lq, HW); viable when HW is modest (the 1dl eval configs' res5)."""
    n, h, w, m, d = value.shape
    _, lq, _, p, _ = loc.shape
    hw = h * w
    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx, ty = x - x0, y - y0
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)

    idxs, wgts = [], []
    for dy, dx, wt in ((0, 0, (1 - tx) * (1 - ty)), (0, 1, tx * (1 - ty)),
                       (1, 0, (1 - tx) * ty), (1, 1, tx * ty)):
        yi, xi = y0i + dy, x0i + dx
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idxs.append(jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1))
        wgts.append(jnp.where(valid, wt, 0.0) * attn_w)
    idx = jnp.stack(idxs, -1).reshape(n, lq, m, 4 * p)  # (N, Lq, M, P*4)
    wgt = jnp.stack(wgts, -1).reshape(n, lq, m, 4 * p)
    idx = jnp.transpose(idx, (0, 2, 1, 3))  # (N, M, Lq, 4P)
    wgt = jnp.transpose(wgt, (0, 2, 1, 3))

    iota = jnp.arange(hw, dtype=jnp.int32)
    a = jnp.zeros((n, m, lq, hw), jnp.float32)
    for k in range(4 * p):
        oh = (iota[None, None, None, :] == idx[..., k : k + 1]).astype(jnp.float32)
        a = a + wgt[..., k : k + 1] * oh

    vh = jnp.transpose(value.reshape(n, hw, m, d), (0, 2, 1, 3))  # (N, M, HW, D)
    if a_dtype != jnp.float32:
        # fast-serving variant: the A accumulation chain stays fp32 in
        # registers (one fused VPU kernel) but the MATERIALIZED (M, Lq, HW)
        # row matrix is written bf16, halving the dominant HBM traffic of
        # this path; the MXU matmul then runs native bf16 with fp32
        # accumulation.  Gated by PixelDecoderConfig.sampling_dtype.
        a = a.astype(a_dtype)
        out = jnp.einsum("nmqs,nmsd->nmqd", a, vh.astype(a_dtype),
                         preferred_element_type=jnp.float32)
    else:
        out = jnp.einsum("nmqs,nmsd->nmqd", a, vh, precision=precision)
    return jnp.transpose(out, (0, 2, 1, 3))  # (N, Lq, M, D)


def ms_deform_attn_core(
    value: jax.Array,  # (N, S, M, D) flattened multi-level values
    spatial_shapes: Sequence[Tuple[int, int]],  # static python list of (H, W)
    sampling_locations: jax.Array,  # (N, Lq, M, L, P, 2) in [0, 1]
    attention_weights: jax.Array,  # (N, Lq, M, L, P) softmaxed over L*P
    use_patch_gather: bool = True,
    method="auto",  # "auto" | "gather" | "onehot" | per-level tuple of those
    sampling_dtype: str = "float32",  # "bfloat16": bf16 one-hot A (fast mode)
    onehot_cap: int = 48 * 1024 * 1024,
) -> jax.Array:  # (N, Lq, M*D)
    n, s, m, d = value.shape
    _, lq, _, nlevels, p, _ = sampling_locations.shape
    assert nlevels == len(spatial_shapes)
    if method == "auto":
        # Per-level dispatch: onehot's dense (N, M, Lq, HW_l) row matrix is
        # viable whenever THIS level is small enough — the gather is
        # index-rate-bound (cost fixed per level at ~12.8 ns/index) while
        # onehot scales with HW_l, so onehot wins far beyond the released
        # 1-level shape.  Measured at the 3-level train shapes (512x1024,
        # Lq=10752, tools/perf_deform_multilevel.py, v5e): bs1 all-gather
        # 18.2 ms/layer vs 13.2 (onehot res5) vs 9.9 (onehot res4+res5);
        # bs4: 83.9 vs 64.4 (onehot res5).  The default 48M-element cap
        # (192 MB fp32) is deliberately conservative because autodiff saves
        # the A matrices as residuals (6 encoder layers x the cap, training
        # memory); inference paths raise it via ``onehot_cap`` (fast_serving
        # sets PixelDecoderConfig.sampling_onehot_cap = 256M).
        method = tuple(
            "onehot" if n * m * lq * h * w <= onehot_cap else "gather"
            for h, w in spatial_shapes
        )
    if isinstance(method, str):
        method = (method,) * nlevels
    assert len(method) == nlevels

    # compute in fp32 — the reference pins the pixel decoder to fp32 under AMP
    value = value.astype(jnp.float32)
    sampling_locations = sampling_locations.astype(jnp.float32)
    attention_weights = attention_weights.astype(jnp.float32)

    offsets = [0]
    for h, w in spatial_shapes:
        offsets.append(offsets[-1] + h * w)
    assert offsets[-1] == s

    gather_fn = _bilinear_gather_level_patch if use_patch_gather else _bilinear_gather_level
    out = jnp.zeros((n, lq, m, d), jnp.float32)
    for lid, (h, w) in enumerate(spatial_shapes):
        v = value[:, offsets[lid] : offsets[lid + 1]].reshape(n, h, w, m, d)
        if method[lid] == "onehot":
            out = out + _onehot_matmul_level(
                v, sampling_locations[:, :, :, lid], attention_weights[:, :, :, lid],
                a_dtype=jnp.bfloat16 if sampling_dtype == "bfloat16" else jnp.float32,
            )
            continue
        sampled = gather_fn(v, sampling_locations[:, :, :, lid])  # (N,Lq,M,P,D)
        out = out + jnp.einsum(
            "nqmpd,nqmp->nqmd", sampled, attention_weights[:, :, :, lid],
            precision=jax.lax.Precision.HIGHEST,
        )
    return out.reshape(n, lq, m * d)
