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
