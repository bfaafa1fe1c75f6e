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

from functools import partial as _partial
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


def _corner_patches(
    value: jax.Array,  # (N, H, W, M, D)
    loc: jax.Array,  # (N, Lq, M, P, 2)
) -> jax.Array:  # (N, Lq, M, P, 2, 2, D) raw 2x2 corner patches
    """One ``lax.gather`` of the 2×2 patch covering a sample point's 4
    bilinear corners, on a 1px zero-padded map (clamped starts for corners
    further out of range fetch in-range garbage — callers must weight-gate
    every corner with the validity mask, as `_corner_weights` does)."""
    n, h, w, m, d = value.shape
    _, lq, _, p, _ = loc.shape
    x0i = jnp.floor(loc[..., 0] * w - 0.5).astype(jnp.int32)
    y0i = jnp.floor(loc[..., 1] * h - 0.5).astype(jnp.int32)

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
    return patches.reshape(n, m, lq, p, 2, 2, d).transpose(0, 2, 1, 3, 4, 5, 6)


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
    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0)[..., None]
    ty = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    patches = _corner_patches(value, loc)  # (N, Lq, M, P, 2, 2, D)

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


def _corner_indices(h: int, w: int, loc: jax.Array) -> jax.Array:
    """Flat HW indices of the 4 bilinear corners per sample point, clipped
    into range (out-of-range corners carry zero weight so the clip never
    contaminates results).  loc (N, Lq, M, P, 2) -> int32 (N, M, Lq, 4P)."""
    n, lq, m, p, _ = loc.shape
    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5
    x0i = jnp.floor(x).astype(jnp.int32)
    y0i = jnp.floor(y).astype(jnp.int32)
    idxs = []
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        yi, xi = y0i + dy, x0i + dx
        idxs.append(jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1))
    idx = jnp.stack(idxs, -1).reshape(n, lq, m, 4 * p)
    return jnp.transpose(idx, (0, 2, 1, 3))  # (N, M, Lq, 4P)


def _corner_weights(h: int, w: int, loc: jax.Array, attn_w: jax.Array) -> jax.Array:
    """Combined bilinear x attention weight of each of the 4P corners —
    the differentiable half of the one-hot row construction (the custom-VJP
    backward chains cotangents through this exact function with jax.vjp, so
    it must stay in lockstep with the autodiff semantics of the gather path:
    grads flow to the bilinear term only where the corner is in range).
    loc (N, Lq, M, P, 2), attn_w (N, Lq, M, P) -> fp32 (N, M, Lq, 4P)."""
    n, lq, m, p, _ = loc.shape
    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx, ty = x - x0, y - y0
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    wgts = []
    for dy, dx, wt in ((0, 0, (1 - tx) * (1 - ty)), (0, 1, tx * (1 - ty)),
                       (1, 0, (1 - tx) * ty), (1, 1, tx * ty)):
        yi, xi = y0i + dy, x0i + dx
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        wgts.append(jnp.where(valid, wt, 0.0) * attn_w)
    wgt = jnp.stack(wgts, -1).reshape(n, lq, m, 4 * p)
    return jnp.transpose(wgt, (0, 2, 1, 3))  # (N, M, Lq, 4P)


def _build_rows(idx: jax.Array, wgt: jax.Array, hw: int) -> jax.Array:
    """Accumulate the dense one-hot row matrix A (N, M, Lq, HW) fp32 from
    corner indices/weights: 4P compare-select-accumulate VPU passes."""
    iota = jnp.arange(hw, dtype=jnp.int32)
    a = jnp.zeros(idx.shape[:3] + (hw,), jnp.float32)
    for k in range(idx.shape[-1]):
        oh = (iota[None, None, None, :] == idx[..., k : k + 1]).astype(jnp.float32)
        a = a + wgt[..., k : k + 1] * oh
    return a


def _onehot_apply(value, loc, attn_w, a_dtype):
    n, h, w, m, d = value.shape
    hw = h * w
    idx = _corner_indices(h, w, loc)
    wgt = _corner_weights(h, w, loc, attn_w)
    a = _build_rows(idx, wgt, hw)
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
        out = jnp.einsum("nmqs,nmsd->nmqd", a, vh,
                         precision=jax.lax.Precision.HIGHEST)
    return jnp.transpose(out, (0, 2, 1, 3))  # (N, Lq, M, D)


@_partial(jax.custom_vjp, nondiff_argnums=(0,))
def _onehot_level(bf16: bool, value, loc, attn_w):
    return _onehot_apply(value, loc, attn_w, jnp.bfloat16 if bf16 else jnp.float32)


def _onehot_level_fwd(bf16, value, loc, attn_w):
    # Residuals are the PRIMALS ONLY — plain autodiff of _onehot_apply saves
    # the (N, M, Lq, HW) A matrix per encoder layer (~1 GB over 6 layers at
    # the 3-level train shapes), which is why the pre-r5 auto dispatch had to
    # keep *training* on the slow gather path.  The reference hand-writes a
    # CUDA backward for the same reason (ms_deform_im2col_cuda.cuh:307-926).
    return _onehot_level(bf16, value, loc, attn_w), (value, loc, attn_w)


def _onehot_level_bwd(bf16, res, g):
    """Recompute-A backward.  With dA = g @ V^T =: S,
      dV[hw, d]  = sum_q A[q, hw] * g[q, d]          (transposed MXU matmul)
      dwgt_k[q]  = S[q, idx_k[q]] = sum_hw 1[idx_k] * S   (4P VPU passes)
    and dloc/dattn follow from dwgt via jax.vjp of _corner_weights (cheap,
    elementwise).  Both matmuls run fp32 HIGHEST regardless of the bf16
    forward flag: the bf16 A-matrix is a serving-mode numerics trade
    (ABLATION.json) and making the backward *more* exact only helps the rare
    fine-tune-in-fast-mode case.  Exactness vs autodiff of the gather path is
    pinned by tests/test_deform_sampling.py::test_onehot_custom_vjp_*."""
    value, loc, attn_w = res
    n, h, w, m, d = value.shape
    hw = h * w
    hi = jax.lax.Precision.HIGHEST
    gt = jnp.transpose(g.astype(jnp.float32), (0, 2, 1, 3))  # (N, M, Lq, D)
    vh = jnp.transpose(value.reshape(n, hw, m, d), (0, 2, 1, 3))  # (N, M, HW, D)

    idx = _corner_indices(h, w, loc)
    wgt, wgt_vjp = jax.vjp(lambda l, a: _corner_weights(h, w, l, a), loc, attn_w)
    a = _build_rows(idx, wgt, hw)  # (N, M, Lq, HW)

    dvh = jnp.einsum("nmqs,nmqd->nmsd", a, gt, precision=hi)  # (N, M, HW, D)
    dvalue = jnp.transpose(dvh, (0, 2, 1, 3)).reshape(n, h, w, m, d)

    s = jnp.einsum("nmqd,nmsd->nmqs", gt, vh, precision=hi)  # (N, M, Lq, HW)
    iota = jnp.arange(hw, dtype=jnp.int32)
    dwgt = jnp.stack(
        [jnp.sum(jnp.where(iota[None, None, None, :] == idx[..., k : k + 1], s, 0.0), -1)
         for k in range(idx.shape[-1])],
        axis=-1,
    )  # (N, M, Lq, 4P)
    dloc, dattn = wgt_vjp(dwgt)
    return dvalue, dloc, dattn


_onehot_level.defvjp(_onehot_level_fwd, _onehot_level_bwd)


@_partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gather_level_matmul_bwd(n_chunks: int, value, loc, attn_w):
    """Patch-gather forward with a CHUNKED recompute-A matmul backward.

    Rationale (measured on v5e, tools/perf_deform_grad_split.py, 512x1024
    train shapes, Lq=10752): the gather forward is index-rate-bound and fine
    at any level size, but its autodiff backward is a scatter-add that costs
    ~1417 ms/level REGARDLESS of level size — while the recompute-A matmul
    backward runs 6.5 ms (res4) / 1.6 ms (res5).  Levels too big to
    materialize the full (N, M, Lq, HW) row matrix (res3 = 704M elements =
    2.8 GB fp32; the single-shot probe hard-faulted the TPU worker) get the
    same backward in ``n_chunks`` Lq-slices, bounding the transient to
    chunk-size A + S matrices accumulated with lax.scan.  The reference
    hand-writes its CUDA backward for the same scatter-avoidance reason
    (ms_deform_im2col_cuda.cuh:307-926)."""
    sampled = _bilinear_gather_level_patch(value, loc)  # (N, Lq, M, P, D)
    return jnp.einsum("nqmpd,nqmp->nqmd", sampled, attn_w,
                      precision=jax.lax.Precision.HIGHEST)


def _gather_level_matmul_bwd_fwd(n_chunks, value, loc, attn_w):
    return _gather_level_matmul_bwd(n_chunks, value, loc, attn_w), (value, loc, attn_w)


# dwgt-formulation crossover for the chunked backward: corner-gather wins at
# HW=8192, S-form at HW<=2048 (measured, see body comment); 4096 = midpoint.
_DWGT_CORNER_GATHER_MIN_HW = 4096


def _gather_level_matmul_bwd_bwd(n_chunks, res, g):
    value, loc, attn_w = res
    n, h, w, m, d = value.shape
    _, lq, _, p, _ = loc.shape
    hw = h * w
    hi = jax.lax.Precision.HIGHEST

    qc = -(-lq // n_chunks)  # ceil
    pad = n_chunks * qc - lq

    def pad_q(x):  # pad the Lq axis (axis 1) with zeros
        cfgp = [(0, 0)] * x.ndim
        cfgp[1] = (0, pad)
        return jnp.pad(x, cfgp)

    # zero attention weights on pad rows -> zero contributions everywhere
    loc_p = pad_q(loc).reshape(n, n_chunks, qc, m, p, 2)
    attn_p = pad_q(attn_w).reshape(n, n_chunks, qc, m, p)
    g_p = pad_q(g.astype(jnp.float32)).reshape(n, n_chunks, qc, m, d)

    def body(dvh, xs):
        loc_c, attn_c, g_c = xs  # (N, qc, M, P, 2) / (N, qc, M, P) / (N, qc, M, D)
        gt = jnp.transpose(g_c, (0, 2, 1, 3))  # (N, M, qc, D)
        idx = _corner_indices(h, w, loc_c)
        wgt, wgt_vjp = jax.vjp(
            lambda l, a: _corner_weights(h, w, l, a), loc_c, attn_c
        )
        a = _build_rows(idx, wgt, hw)  # (N, M, qc, HW)
        dvh = dvh + jnp.einsum("nmqs,nmqd->nmsd", a, gt, precision=hi)
        # dwgt_k[q] = (g @ V^T)[q, idx_k[q]] = <g[q], V[idx_k[q]]>.  Two
        # exact formulations, dispatched on the static HW (A/B on v5e,
        # perf_deform_grad_split bs4 512x1024 fwd+bwd ms/layer):
        #   corner-gather — fetch the corner VALUES with the same 2x2 patch
        #     gather as the forward (index-rate-bound, cost ~ Lq only):
        #     res3/HW=8192 111.5 vs 119.3 for S-form;
        #   S-form — materialize S = g V^T (N, M, qc, HW) and reduce it
        #     under 4P one-hot masks (cost ~ qc*HW): res4/HW=2048 42.8 vs
        #     55.2, res5/HW=512 28.4 vs 33.8 for corner-gather.
        # Invalid corners in the patch gather fetch clamped garbage, but
        # wgt_vjp zero-gates them exactly as the gather path's autodiff does.
        if hw >= _DWGT_CORNER_GATHER_MIN_HW:
            qc_ = loc_c.shape[1]
            patches = _corner_patches(value, loc_c)  # (N, qc, M, P, 2, 2, D)
            corners = patches.reshape(n, qc_, m, p * 4, d)
            dwgt = jnp.einsum("nqmd,nqmkd->nmqk", g_c, corners, precision=hi)
        else:
            vh = jnp.transpose(value.reshape(n, hw, m, d), (0, 2, 1, 3))
            s = jnp.einsum("nmqd,nmsd->nmqs", gt, vh, precision=hi)
            iota = jnp.arange(hw, dtype=jnp.int32)
            dwgt = jnp.stack(
                [jnp.sum(jnp.where(iota[None, None, None, :] == idx[..., k : k + 1],
                                   s, 0.0), -1)
                 for k in range(idx.shape[-1])],
                axis=-1,
            )
        dloc_c, dattn_c = wgt_vjp(dwgt)
        return dvh, (dloc_c, dattn_c)

    xs = (
        jnp.moveaxis(loc_p, 1, 0),
        jnp.moveaxis(attn_p, 1, 0),
        jnp.moveaxis(g_p, 1, 0),
    )
    dvh0 = jnp.zeros((n, m, hw, d), jnp.float32)
    if n_chunks == 1:
        dvh, (dloc_s, dattn_s) = body(dvh0, jax.tree.map(lambda x: x[0], xs))
        dloc_s, dattn_s = dloc_s[None], dattn_s[None]
    else:
        dvh, (dloc_s, dattn_s) = jax.lax.scan(body, dvh0, xs)
    dvalue = jnp.transpose(dvh, (0, 2, 1, 3)).reshape(n, h, w, m, d)
    dloc = jnp.moveaxis(dloc_s, 0, 1).reshape(n, n_chunks * qc, m, p, 2)[:, :lq]
    dattn = jnp.moveaxis(dattn_s, 0, 1).reshape(n, n_chunks * qc, m, p)[:, :lq]
    return dvalue, dloc, dattn


_gather_level_matmul_bwd.defvjp(_gather_level_matmul_bwd_fwd, _gather_level_matmul_bwd_bwd)


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
    (M, Lq, HW).  Wrapped in a recompute-A custom VJP (no A residual), so
    since r5 the auto dispatch can pick it for TRAINING shapes too."""
    del precision  # fp32 path is always HIGHEST
    return _onehot_level(a_dtype != jnp.float32, value, loc, attn_w)


def ms_deform_attn_core(
    value: jax.Array,  # (N, S, M, D) flattened multi-level values
    spatial_shapes: Sequence[Tuple[int, int]],  # static python list of (H, W)
    sampling_locations: jax.Array,  # (N, Lq, M, L, P, 2) in [0, 1]
    attention_weights: jax.Array,  # (N, Lq, M, L, P) softmaxed over L*P
    use_patch_gather: bool = True,
    method="auto",  # "auto" | "gather" | "onehot" | "gather_scatter" | per-level tuple
    sampling_dtype: str = "float32",  # "bfloat16": bf16 one-hot A (fast mode)
    onehot_cap: int = 192 * 1024 * 1024,
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
        # bs4: 83.9 vs 64.4 (onehot res5).  Since r5 the onehot path carries
        # a recompute-A custom VJP, so NO (N, M, Lq, HW) residual is saved
        # for training — the cap bounds *transient* memory (fwd: 4B x cap
        # for A; bwd: 2 x 4B x cap for A + the S = g @ V^T cotangent
        # matrix), not per-layer residuals.  fast_serving raises it to 256M
        # via PixelDecoderConfig.sampling_onehot_cap.
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
        if method[lid] == "gather" and use_patch_gather:
            # patch-gather forward, chunked matmul BACKWARD: autodiff of the
            # gather is a scatter-add measured at ~1417 ms/level on v5e (any
            # level size) vs single-digit ms for the recompute-A matmul form
            n_chunks = max(1, -(-(n * m * lq * h * w) // onehot_cap))
            out = out + _gather_level_matmul_bwd(
                n_chunks, v, sampling_locations[:, :, :, lid],
                attention_weights[:, :, :, lid],
            )
            continue
        # "gather_scatter": the plain-autodiff gather path (kept for probes
        # and as the use_patch_gather=False fallback)
        sampled = gather_fn(v, sampling_locations[:, :, :, lid])  # (N,Lq,M,P,D)
        out = out + jnp.einsum(
            "nqmpd,nqmp->nqmd", sampled, attention_weights[:, :, :, lid],
            precision=jax.lax.Precision.HIGHEST,
        )
    return out.reshape(n, lq, m * d)
