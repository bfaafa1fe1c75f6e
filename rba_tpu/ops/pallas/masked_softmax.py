"""Fused (scores + rel_bias [+ shift_mask]) → fp32 softmax → bf16 probs.

The XLA window-attention pipeline materializes the fp32 score tensor from
the qkᵀ matmul and then runs FOUR more full passes over it (bias/mask add:
read+write; max-reduce: read; exp+sum: read; normalize: read+write-bf16) —
at Swin-B stage 1 (1024×2048) that is ~1.5 GB of HBM traffic per block on a
314 MB tensor.  This kernel does the add and the full fp32 softmax in VMEM:
one fp32 read of the scores, one bf16 write of the probabilities.  The
arithmetic is bit-identical to the XLA parity path (fp32 adds, fp32
max-subtracted softmax, bf16 cast at the end), so it is a pure traffic
optimization, not a precision trade.

Unlike the full attention kernels (window_attention.py v1-v3), the operand
layouts here are exactly what the surrounding matmuls produce/consume —
profiled end-to-end this is the fusion that actually wins on v5e.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(s_ref, bias_ref, mask_ref, out_ref):
    s = s_ref[...]  # (G, nh, n, n) fp32
    s = s + bias_ref[...][None]
    s = s + mask_ref[...][:, None]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    out_ref[...] = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(out_ref.dtype)


def _kernel_nomask(s_ref, bias_ref, out_ref):
    s = s_ref[...] + bias_ref[...][None]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    out_ref[...] = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(out_ref.dtype)


def masked_softmax_bf16(
    scores: jax.Array,  # (B, nW, nh, N, N) fp32 (qkᵀ·scale output)
    rel_bias: jax.Array,  # (nh, N, N) fp32
    mask: Optional[np.ndarray],  # (nW, N, N) additive or None
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    vmem_budget: int = 9 * 1024 * 1024,
) -> jax.Array:  # (B, nW, nh, N, N) out_dtype
    b, nw, nh, n, _ = scores.shape
    sf = scores.reshape(b * nw, nh, n, n)

    # split heads onto the grid so Mosaic's kernel temporaries stay well
    # under the 16 MB scoped-vmem limit (the softmax chain holds several
    # block-sized fp32 intermediates at once)
    nh_blk = nh
    while nh_blk > 4:
        nh_blk //= 2
    per_g = nh_blk * n * n * 24  # in/out double-buffered + ~4 temporaries
    g_max = max(1, (vmem_budget - nh_blk * n * n * 4) // per_g)
    g = 1
    for cand in range(1, min(g_max, nw) + 1):
        if nw % cand == 0:
            g = cand
    grid = ((b * nw) // g, nh // nh_blk)

    s_spec = pl.BlockSpec(
        (g, nh_blk, n, n), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    bias_spec = pl.BlockSpec(
        (nh_blk, n, n), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM
    )
    if mask is None:
        out = pl.pallas_call(
            _kernel_nomask,
            out_shape=jax.ShapeDtypeStruct((b * nw, nh, n, n), out_dtype),
            grid=grid,
            in_specs=[s_spec, bias_spec],
            out_specs=s_spec,
            interpret=interpret,
        )(sf, rel_bias.astype(jnp.float32))
    else:
        mask_arr = jnp.asarray(mask, jnp.float32)
        assert mask_arr.shape[0] == nw
        mask_spec = pl.BlockSpec(
            (g, n, n), lambda i, j: (i % (nw // g), 0, 0), memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            _kernel,
            out_shape=jax.ShapeDtypeStruct((b * nw, nh, n, n), out_dtype),
            grid=grid,
            in_specs=[s_spec, bias_spec, mask_spec],
            out_specs=s_spec,
            interpret=interpret,
        )(sf, rel_bias.astype(jnp.float32), mask_arr)
    return out.reshape(b, nw, nh, n, n)
