"""Fused window attention kernel (Pallas/TPU) for the Swin backbone.

The XLA path of window attention (rba_tpu/models/swin.py:_window_attention)
materializes the (B·nW, nh, 144, 144) fp32 score tensor in HBM three-plus
times per block (QKᵀ out, +bias/mask, softmax) — at Swin-B stage 3 that is
~90 MB × several passes × 18 blocks.  This kernel computes
    softmax(q·kᵀ·scale + rel_bias [+ shift_mask]) · v
entirely in VMEM per (batch·window) grid step: only q/k/v (bf16) stream in
and the attention output streams out.

Behavioral spec matched: reference WindowAttention
(/root/reference/mask2former/modeling/backbone/swin.py:74-171) — fp32
softmax, additive relative-position bias per head, additive -100 shift mask
per window.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref, *, scale):
    q = q_ref[0].astype(jnp.float32)  # (nh, N, hd)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]

    scores = jax.lax.dot_general(
        q * scale,
        k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (nh, N, N)
    scores = scores + bias_ref[...]
    scores = scores + mask_ref[0][None, :, :]
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jax.lax.dot_general(
        probs,
        v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (nh, N, hd)
    out_ref[0] = out.astype(out_ref.dtype)


def window_attention_fused(
    q: jax.Array,  # (B, nW, nh, N, hd) — scale NOT yet applied
    k: jax.Array,
    v: jax.Array,
    rel_bias: jax.Array,  # (nh, N, N) fp32
    mask: Optional[np.ndarray],  # (nW, N, N) additive or None
    scale: float,
    interpret: bool = False,
) -> jax.Array:  # (B, nW, nh, N, hd)
    b, nw, nh, n, hd = q.shape
    qf = q.reshape(b * nw, nh, n, hd)
    kf = k.reshape(b * nw, nh, n, hd)
    vf = v.reshape(b * nw, nh, n, hd)

    if mask is None:
        mask_arr = jnp.zeros((1, n, n), jnp.float32)
        nmask = 1
    else:
        mask_arr = jnp.asarray(mask, jnp.float32)
        nmask = mask_arr.shape[0]

    qkv_spec = pl.BlockSpec((1, nh, n, hd), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * nw, nh, n, hd), q.dtype),
        grid=(b * nw,),
        in_specs=[
            qkv_spec,
            qkv_spec,
            qkv_spec,
            pl.BlockSpec((nh, n, n), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, n), lambda i: (i % nmask, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=qkv_spec,
        interpret=interpret,
    )(qf, kf, vf, rel_bias.astype(jnp.float32), mask_arr)
    return out.reshape(b, nw, nh, n, hd)


# ---------------------------------------------------------------------------
# v2: consumes the fused qkv tensor in its natural post-linear layout
# (B·nW, N, 3C); groups G windows per grid step; head split + transpose
# happen in VMEM.  Avoids the two HBM-level (N, nh) transposes of v1.
#
# STATUS: interpret-mode correct, but current Mosaic rejects the in-kernel
# lane split (G, N, 3C) -> (..., nh, hd=32) ("unsupported shape cast") —
# sub-128 lane retiling is not supported, so this variant cannot compile on
# hardware until heads are pre-split (which is exactly v1).  Kept as the
# reference for when Mosaic gains small-lane reshapes.
# ---------------------------------------------------------------------------

def _kernel_v2(qkv_ref, bias_ref, mask_ref, out_ref, *, scale, nh):
    g, n, c3 = qkv_ref.shape
    c = c3 // 3
    hd = c // nh
    qkv = qkv_ref[...].reshape(g, n, 3, nh, hd)
    # (G, N, nh, hd) -> (G·nh, N, hd)  (Mosaic matmul: max one batch dim)
    q = jnp.transpose(qkv[:, :, 0], (0, 2, 1, 3)).reshape(g * nh, n, hd).astype(jnp.float32)
    k = jnp.transpose(qkv[:, :, 1], (0, 2, 1, 3)).reshape(g * nh, n, hd).astype(jnp.float32)
    v = jnp.transpose(qkv[:, :, 2], (0, 2, 1, 3)).reshape(g * nh, n, hd)

    scores = jax.lax.dot_general(
        q * scale, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(g, nh, n, n)
    scores = scores + bias_ref[...][None]
    scores = scores + mask_ref[...][:, None]
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype).reshape(g * nh, n, n)
    out = jax.lax.dot_general(
        probs, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (G·nh, N, hd)
    out = jnp.transpose(out.reshape(g, nh, n, hd), (0, 2, 1, 3)).reshape(g, n, c)
    out_ref[...] = out.astype(out_ref.dtype)


def window_attention_fused_v2(
    qkv: jax.Array,  # (B, nW, N, 3C) fused qkv, natural post-linear layout
    rel_bias: jax.Array,  # (nh, N, N) fp32
    mask,  # (nW, N, N) additive or None
    nh: int,
    scale: float,
    interpret: bool = False,
) -> jax.Array:  # (B, nW, N, C)
    b, nw, n, c3 = qkv.shape
    c = c3 // 3
    qkv_f = qkv.reshape(b * nw, n, c3)

    if mask is None:
        mask_arr = jnp.zeros((1, n, n), jnp.float32)
        nmask = 1
    else:
        mask_arr = jnp.asarray(mask, jnp.float32)
        nmask = mask_arr.shape[0]

    # group size: largest divisor of nW within the VMEM budget for the fp32
    # score tensor (+ qkv/out streams).  G | nW keeps groups phase-aligned
    # with the per-window shift masks.
    budget = 9 * 1024 * 1024
    g_max = max(1, budget // (nh * n * n * 4 + 6 * n * c3))
    g = 1
    for cand in range(1, min(g_max, nw) + 1):
        if nw % cand == 0:
            g = cand
    grid = ((b * nw) // g,)

    if nmask == 1:
        mask_in = jnp.broadcast_to(mask_arr, (g, n, n))
        mask_spec = pl.BlockSpec((g, n, n), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    else:
        assert nmask == nw, "mask count must equal windows per image"
        mask_in = mask_arr
        mask_spec = pl.BlockSpec(
            (g, n, n), lambda i: (i % (nw // g), 0, 0), memory_space=pltpu.VMEM
        )

    out = pl.pallas_call(
        functools.partial(_kernel_v2, scale=scale, nh=nh),
        out_shape=jax.ShapeDtypeStruct((b * nw, n, c), qkv.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((g, n, c3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, n, n), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            mask_spec,
        ],
        out_specs=pl.BlockSpec((g, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qkv_f, rel_bias.astype(jnp.float32), mask_in)
    return out.reshape(b, nw, n, c)


# ---------------------------------------------------------------------------
# v3: grouped windows per grid step + single batched dot over (G·nh).
# Fixes v1's two inefficiencies — one-window-per-step grid overhead and
# per-step tiny dots — while keeping the pre-split head layout that Mosaic
# compiles (block last-two dims equal the array's (N, hd)).  Scores live in
# VMEM for the whole qkᵀ→bias/mask→softmax→v chain; only bf16 q/k/v stream
# in and bf16 attention outputs stream out.
# ---------------------------------------------------------------------------

def _kernel_v3(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref, *, scale, nh):
    g, _, n, hd = q_ref.shape
    q = q_ref[...].reshape(g * nh, n, hd).astype(jnp.float32) * scale
    k = k_ref[...].reshape(g * nh, n, hd).astype(jnp.float32)
    v = v_ref[...].reshape(g * nh, n, hd)

    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(g, nh, n, n)
    scores = scores + bias_ref[...][None]
    scores = scores + mask_ref[...][:, None]
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype).reshape(g * nh, n, n)
    out = jax.lax.dot_general(
        probs, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    out_ref[...] = out.reshape(g, nh, n, hd).astype(out_ref.dtype)


def window_attention_fused_v3(
    q: jax.Array,  # (B, nW, nh, N, hd) — scale NOT yet applied
    k: jax.Array,
    v: jax.Array,
    rel_bias: jax.Array,  # (nh, N, N) fp32
    mask,  # (nW, N, N) additive np array or None
    scale: float,
    interpret: bool = False,
    vmem_budget: int = 10 * 1024 * 1024,
    group: int = 0,  # 0 = auto
) -> jax.Array:  # (B, nW, nh, N, hd)
    b, nw, nh, n, hd = q.shape
    qf = q.reshape(b * nw, nh, n, hd)
    kf = k.reshape(b * nw, nh, n, hd)
    vf = v.reshape(b * nw, nh, n, hd)

    if mask is None:
        mask_arr = jnp.zeros((1, n, n), jnp.float32)
        nmask = 1
    else:
        mask_arr = jnp.asarray(mask, jnp.float32)
        nmask = mask_arr.shape[0]

    # group size: scores fp32 + probs bf16 + 2x-buffered qkv/out streams;
    # batched-dot batch count (g·nh) capped at 32 — larger batches have been
    # observed to crash the Mosaic compiler (g=11, nh=4)
    per_g = nh * n * n * 6 + 8 * nh * n * hd * q.dtype.itemsize
    g_max = max(1, (vmem_budget - nh * n * n * 4) // per_g)
    g_max = min(g_max, max(1, 32 // nh))
    g = group
    if g == 0:
        g = 1
        for cand in range(1, min(g_max, nw) + 1):
            if nw % cand == 0:
                g = cand
    grid = ((b * nw) // g,)

    qkv_spec = pl.BlockSpec((g, nh, n, hd), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    if nmask == 1:
        mask_in = jnp.broadcast_to(mask_arr, (g, n, n))
        mask_spec = pl.BlockSpec((g, n, n), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    else:
        assert nmask == nw, "mask count must equal windows per image"
        mask_in = mask_arr
        mask_spec = pl.BlockSpec(
            (g, n, n), lambda i: (i % (nw // g), 0, 0), memory_space=pltpu.VMEM
        )

    out = pl.pallas_call(
        functools.partial(_kernel_v3, scale=scale, nh=nh),
        out_shape=jax.ShapeDtypeStruct((b * nw, nh, n, hd), q.dtype),
        grid=grid,
        in_specs=[
            qkv_spec,
            qkv_spec,
            qkv_spec,
            pl.BlockSpec((nh, n, n), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            mask_spec,
        ],
        out_specs=qkv_spec,
        interpret=interpret,
    )(qf, kf, vf, rel_bias.astype(jnp.float32), mask_in)
    return out.reshape(b, nw, nh, n, hd)
