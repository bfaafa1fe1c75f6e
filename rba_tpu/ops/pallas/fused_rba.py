"""Fused RbA scoring kernel (Pallas/TPU).

The reference inference tail (maskformer_model.py:294-299, :381-386 +
evaluate_ood.py:150) is:
    up   = bilinear_upsample_x4(mask_logits)        # (Q, H, W)  ~840 MB fp32
    sem  = softmax(cls)[:, :K] ᵀ· sigmoid(up)        # (K, H, W)
    rba  = -Σ_K tanh(sem)                            # (H, W)
On GPU the (Q, H, W) full-resolution tensor round-trips memory; on TPU we
fuse the whole tail into one Pallas kernel so only the low-res (Q, h, w)
masks stream in and the (H, W) score map streams out — ~0.2 GB of traffic
instead of ~2.5 GB (the north-star fusion from PROGRESS.jsonl).

Key trick: the model's upsample is always an exact ×4 (mask stride 4 → the
32-divisible padded input), so align_corners=False bilinear weights cycle
with period 4:  src(4k+r) = k + (2r−3)/8, giving per-phase constant weight
triples over (P[k], P[k+1], P[k+2]) of the 1-replicate-padded input.  Each
of the 16 (ry, rx) phases is a static blend — pure VPU code — and the class
contraction becomes a (tile_pixels, Q≤128) × (Q, K) MXU matmul.  The kernel
emits phase-planar (4, 4, h, w) tiles; one cheap XLA transpose
de-interleaves to (H, W).

Row halos are provided as three row-shifted input streams (plain BlockSpec
pipelining; the axon TPU tunnel's AOT compiler faults on manual HBM→VMEM
DMA, so the kernel is deliberately halo-free).  Column halos stay inside the
block: each program processes full-width rows.  Layout puts Q on the lane
axis (Q=100 → 128).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# phase weights over (P[k], P[k+1], P[k+2]) for output row 4k+r,
# derived from src = (dst+0.5)/4 - 0.5 (torch align_corners=False)
PHASE_W = (
    (0.375, 0.625, 0.0),
    (0.125, 0.875, 0.0),
    (0.0, 0.875, 0.125),
    (0.0, 0.625, 0.375),
)


# two-tap row weights per phase pair: pair 0 covers output rows 4k+{0,1}
# from (P[k], P[k+1]); pair 1 covers 4k+{2,3} from (P[k+1], P[k+2])
ROW_PAIR_W = (
    ((0.375, 0.625), (0.125, 0.875)),
    ((0.875, 0.125), (0.625, 0.375)),
)

TH = 8  # out-block second-minor dim must be a multiple of 8


def _make_pair_kernel(wp: int, row_w):
    def kernel(cls_ref, lo_ref, hi_ref, out_ref):
        cls = cls_ref[0]  # (Qp, K)
        lo = lo_ref[0]  # (TH, wp+2, Qp)
        hi = hi_ref[0]
        qp = lo.shape[-1]
        for ri, (a_lo, a_hi) in enumerate(row_w):
            r = a_lo * lo + a_hi * hi  # (TH, wp+2, Qp)
            for rx in range(4):
                b0, b1, b2 = PHASE_W[rx]
                pxy = b0 * r[:, 0:wp] + b1 * r[:, 1 : wp + 1] + b2 * r[:, 2 : wp + 2]
                s = jax.nn.sigmoid(pxy).reshape(TH * wp, qp)
                sem = jnp.dot(s, cls, preferred_element_type=jnp.float32)  # (TH·wp, K)
                rba = -jnp.sum(jnp.tanh(sem), axis=1).reshape(TH, wp)
                out_ref[0, ri, rx] = rba

    return kernel


def fused_rba_score(
    mask_cls: jax.Array,  # (B, Q, K+1) class logits
    mask_pred: jax.Array,  # (B, Q, h, w) or (B, h, w, Q) low-res mask logits
    interpret: bool = False,
    masks_layout: str = "bqhw",  # "bhwq" skips the HBM transpose entirely
) -> jax.Array:  # (B, 4h, 4w) RbA score
    if masks_layout == "bqhw":
        b, q, h, w = mask_pred.shape
    else:
        b, h, w, q = mask_pred.shape
    k = mask_cls.shape[-1] - 1
    qp = max(128, ((q + 127) // 128) * 128)

    cls = jax.nn.softmax(mask_cls.astype(jnp.float32), axis=-1)[..., :k]  # (B, Q, K)
    cls = jnp.pad(cls, ((0, 0), (0, qp - q), (0, 0))).reshape(b, qp, k)

    hp = ((h + TH - 1) // TH) * TH

    # (B, h, w, Q): Q on lanes; 1-px replicate border (torch index clamping)
    m = mask_pred.astype(jnp.float32)
    if masks_layout == "bqhw":
        m = jnp.transpose(m, (0, 2, 3, 1))
    m = jnp.pad(m, ((0, 0), (1, 1 + hp - h), (1, 1), (0, qp - q)), mode="edge")
    streams = (m[:, 0:hp], m[:, 1 : hp + 1], m[:, 2 : hp + 2])  # P[k], P[k+1], P[k+2]

    grid = (b, hp // TH)
    row_spec = pl.BlockSpec(
        (1, TH, w + 2, qp), lambda bb, i: (bb, i, 0, 0), memory_space=pltpu.VMEM
    )
    halves = []
    for pair in range(2):
        kern = _make_pair_kernel(w, ROW_PAIR_W[pair])
        halves.append(
            pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((b, 2, 4, hp, w), jnp.float32),
                grid=grid,
                in_specs=[
                    pl.BlockSpec((1, qp, k), lambda bb, i: (bb, 0, 0), memory_space=pltpu.VMEM),
                    row_spec,
                    row_spec,
                ],
                out_specs=pl.BlockSpec(
                    (1, 2, 4, TH, w), lambda bb, i: (bb, 0, 0, i, 0), memory_space=pltpu.VMEM
                ),
                interpret=interpret,
            )(cls, streams[pair], streams[pair + 1])
        )
    out = jnp.concatenate(halves, axis=1)  # (B, 4, 4, hp, w)

    # de-interleave phases: out[b, ry, rx, y, x] -> (b, 4h, 4w)
    full = jnp.transpose(out, (0, 3, 1, 4, 2)).reshape(b, 4 * hp, 4 * w)
    return full[:, : 4 * h, : 4 * w]


def fused_rba_score_reference(mask_cls: jax.Array, mask_pred: jax.Array) -> jax.Array:
    """Pure-jnp reference of the same math (upsample ×4 → sigmoid → class
    einsum → -Σ tanh), for parity tests and non-TPU fallback."""
    from ...models.maskformer import rba_score, semantic_inference
    from ..resize import resize_bilinear

    b, q, h, w = mask_pred.shape
    up = resize_bilinear(mask_pred.astype(jnp.float32), (4 * h, 4 * w), align_corners=False)
    sem = semantic_inference(mask_cls, up)
    return rba_score(sem)
