"""Swin Transformer backbone — TPU-native JAX implementation.

Behavioral spec: /root/reference/mask2former/modeling/backbone/swin.py
(D2SwinTransformer, :686-770; SwinTransformer.forward :651-678; blocks
:174-295; WindowAttention :74-171; PatchMerging :298-337; BasicLayer
:340-453; PatchEmbed :456-495).

Design differences from the reference (deliberate, TPU-first):
  * NHWC activations end-to-end; feature maps stay (B, H, W, C) rather than
    flattened (B, L, C) token lists — window partitioning is a pure
    reshape/transpose, which XLA lowers to free layout changes.
  * The shifted-window attention mask and the relative-position-bias index
    are computed in numpy at trace time (shapes are static under jit) and
    folded into the graph as constants.
  * LayerNorm statistics and attention softmax run in fp32; matmuls run in
    the configured compute dtype (bf16 on TPU → MXU native).
  * Stochastic depth is a functional argument (rng + rate), not module state.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SwinConfig
from ..ops.nn import (
    init_conv2d,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
    trunc_normal,
)


# ---------------------------------------------------------------------------
# Static (numpy) helpers — computed once per shape and cached
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def relative_position_index(ws: int) -> np.ndarray:
    """(ws², ws²) index into the (2ws-1)² relative-position-bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))  # 2, ws, ws
    flat = coords.reshape(2, -1)  # 2, ws²
    rel = flat[:, :, None] - flat[:, None, :]  # 2, ws², ws²
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # ws², ws²


@functools.lru_cache(maxsize=256)
def _resident_keep_mask(h, w, hp, wp, ws, shift):
    """(nHw, nWw, ws²) float32 1=real/0=pad token indicator for the resident
    window layout (canvas rolled by -shift, then partitioned), or None when
    the stage needs no padding.  Multiplying the post-norm1 activations by
    this restores the exact zeros the reference creates by re-padding after
    norm1 every block (swin.py:241-244) — the one invariant the resident
    layout must maintain so that pad-token k/v equal qkv(0) + bias."""
    if hp == h and wp == w:
        return None
    m = np.zeros((hp, wp), np.float32)
    m[:h, :w] = 1.0
    if shift:
        m = np.roll(m, (-shift, -shift), (0, 1))
    m = m.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3)
    return np.ascontiguousarray(m.reshape(hp // ws, wp // ws, ws * ws))


@functools.lru_cache(maxsize=256)
def shifted_window_mask(hp: int, wp: int, ws: int, shift: int) -> np.ndarray:
    """(nW, ws², ws²) additive mask (0 / -100) for SW-MSA.

    Mirrors the 9-region image mask of the reference (swin.py:413-440).
    """
    img_mask = np.zeros((hp, wp), dtype=np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[hs, wsl] = cnt
            cnt += 1
    # partition into windows
    m = img_mask.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_window_attention(key, dim: int, ws: int, num_heads: int, qkv_bias: bool):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "relative_position_bias_table": trunc_normal(
            k1, ((2 * ws - 1) * (2 * ws - 1), num_heads), std=0.02
        ),
        "qkv": init_linear(k2, dim, 3 * dim, bias=qkv_bias, init=lambda k, s: trunc_normal(k, s, 0.02)),
        "proj": init_linear(k3, dim, dim, init=lambda k, s: trunc_normal(k, s, 0.02)),
    }


def init_block(key, dim: int, ws: int, num_heads: int, mlp_ratio: float, qkv_bias: bool):
    k1, k2, k3 = jax.random.split(key, 3)
    hidden = int(dim * mlp_ratio)
    return {
        "norm1": init_layer_norm(dim),
        "attn": init_window_attention(k1, dim, ws, num_heads, qkv_bias),
        "norm2": init_layer_norm(dim),
        "mlp": {
            "fc1": init_linear(k2, dim, hidden, init=lambda k, s: trunc_normal(k, s, 0.02)),
            "fc2": init_linear(k3, hidden, dim, init=lambda k, s: trunc_normal(k, s, 0.02)),
        },
    }


def swin_init(key, cfg: SwinConfig):
    keys = jax.random.split(key, 16)
    params: Dict = {}
    params["patch_embed"] = {
        "proj": init_conv2d(keys[0], cfg.patch_size, cfg.patch_size, 3, cfg.embed_dim)
    }
    if cfg.patch_norm:
        params["patch_embed"]["norm"] = init_layer_norm(cfg.embed_dim)
    if cfg.ape:
        n = cfg.pretrain_img_size // cfg.patch_size
        params["absolute_pos_embed"] = trunc_normal(keys[1], (1, n, n, cfg.embed_dim), std=0.02)

    layers = []
    for i in range(cfg.num_layers):
        dim = cfg.stage_dim(i)
        bkeys = jax.random.split(keys[2 + i], cfg.depths[i] + 1)
        layer = {
            "blocks": [
                init_block(bkeys[j], dim, cfg.window_size, cfg.num_heads[i], cfg.mlp_ratio, cfg.qkv_bias)
                for j in range(cfg.depths[i])
            ]
        }
        if i < cfg.num_layers - 1:
            layer["downsample"] = {
                "norm": init_layer_norm(4 * dim),
                "reduction": init_linear(bkeys[-1], 4 * dim, 2 * dim, bias=False),
            }
        layers.append(layer)
    params["layers"] = layers

    for i in range(cfg.num_layers):
        if f"res{i + 2}" in cfg.out_features:
            params[f"norm{i}"] = init_layer_norm(cfg.stage_dim(i))
    return params


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def _use_fused_attention() -> bool:
    """Opt-in (RBA_TPU_FUSED_ATTENTION=1): the grouped v3 Pallas kernel
    (ops/pallas/window_attention.py) wins on ISOLATED attention ops on v5e
    (per masked block-equivalent at 1024×2048: 3.6 vs 6.1 ms stage1, 1.8 vs
    3.3 stage2, 1.2 vs 2.1 stage3) but LOSES in-model (94 vs 60 ms full
    Swin-B inference): inside the model XLA fuses the qkv-output layout into
    the attention pipeline, while the kernel boundary forces explicit
    (nh, N, hd) relayouts whose HBM traffic exceeds the VMEM-score savings.
    Kept for experimentation; the XLA path is the production default."""
    import os

    return bool(os.environ.get("RBA_TPU_FUSED_ATTENTION")) and jax.default_backend() == "tpu"


def _window_attention(
    attn_params,
    x: jax.Array,  # (B, nHw, nWw, N, C) windowed tokens (or None w/ qkv_pre)
    num_heads: int,
    ws: int,
    mask: Optional[np.ndarray],  # (nW, N, N) or None
    qk_scale: Optional[float],
    fast_math: bool = False,
    apply_proj: bool = True,  # False: return pre-proj tokens (proj_canvas)
    qkv_pre: Optional[jax.Array] = None,  # (B, nHw, nWw, N, 3C) precomputed
) -> jax.Array:
    if qkv_pre is not None:
        # qkv_canvas layout: the projection already ran position-wise on the
        # un-partitioned canvas; identical math (linear commutes with the
        # window permutation row-by-row).
        qkv = qkv_pre
        b, nhw, nww, n, c3 = qkv.shape
        c = c3 // 3
        x = qkv  # dtype carrier only below
    else:
        b, nhw, nww, n, c = x.shape
    hd = c // num_heads
    scale = qk_scale or hd**-0.5

    if qkv_pre is None:
        qkv = linear(attn_params["qkv"], x)  # (B, nHw, nWw, N, 3C)

    bias_table = attn_params["relative_position_bias_table"].astype(jnp.float32)
    idx = relative_position_index(ws)
    rel_bias = bias_table[idx.reshape(-1)].reshape(n, n, num_heads)
    rel_bias = jnp.transpose(rel_bias, (2, 0, 1))  # (nh, N, N)

    if _use_fused_attention():
        # fused Pallas path: scores never materialize in HBM
        from ..ops.pallas.window_attention import window_attention_fused_v3

        qkv5 = qkv.reshape(b, nhw * nww, n, 3, num_heads, hd)
        q5, k5, v5 = qkv5[..., 0, :, :], qkv5[..., 1, :, :], qkv5[..., 2, :, :]
        qh = jnp.transpose(q5, (0, 1, 3, 2, 4))  # (B, nW, nh, N, hd)
        kh = jnp.transpose(k5, (0, 1, 3, 2, 4))
        vh = jnp.transpose(v5, (0, 1, 3, 2, 4))
        out = window_attention_fused_v3(qh, kh, vh, rel_bias, mask, scale)
        out = jnp.transpose(out, (0, 1, 3, 2, 4)).reshape(b, nhw, nww, n, c)
        if not apply_proj:
            return out
        return linear(attn_params["proj"], out)

    # The batch dim is FOLDED into the window axis for the whole XLA
    # attention chain (einsums see ONE merged W = B·nW axis; the mask/bias
    # adds run on a free leading-dim reshape view).  With a separate batch
    # axis, layout assignment orders the qkv tensor's major dims
    # (B, nW, qkv, heads) differently on the matmul-output and slice sides:
    # at B = 1 the reorder is a bitcast (moving a size-1 axis is free), but
    # at B >= 2 it materializes as explicit qkv copies (~1.1 ms per stage-0
    # block in the batch-2 trace).  Measured outcome (Swin-B 1024×2048 fast,
    # batch 2): the copies disappear from the HLO but the direct-call trace
    # split is near-neutral (formatting 26.7 vs 27.3 ms/inference — the
    # attn-bias fusion absorbs most of the relayout), and devtime reads
    # 54.3 ms/img (batch 1: 40.35, unchanged — the B=1 graph is identical).
    # Kept: identical arithmetic, simpler einsums, never worse, and batched
    # TRAINING (bs4 sweet spot) shares this path.
    qkv = qkv.reshape(b * nhw * nww, n, 3, num_heads, hd)
    q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]  # (W, N, nh, hd)

    # XLA reference path.
    #
    # Dtype placement mirrors torch autocast (the reference's AMP mode,
    # SOLVER.AMP.ENABLED, ckpts/*/config.yaml): the qk matmul emits
    # compute-dtype logits (cublas bf16 gemm writes bf16), the fp32
    # rel-pos-bias add upcasts, softmax runs fp32, and the probs round back
    # to compute dtype for the @v matmul.  RBA_TPU_STRICT_SCORES=1 restores
    # fp32-materialized logits — *stricter* than the reference's own AMP
    # execution.  (Measured on v5e at Swin-B 1024x2048: end-to-end device
    # time is the same either way — XLA materializes the fp32 biased scores
    # for the softmax passes regardless, because the upcast+bias-add has
    # three reduce consumers — so the default is chosen for reference
    # fidelity, not speed.)
    import os

    fast = fast_math  # cfg.fast_math, threaded via swin_apply
    strict = bool(os.environ.get("RBA_TPU_STRICT_SCORES"))  # debug-only knob
    fused = (
        not fast
        and jax.default_backend() == "tpu"
        and bool(os.environ.get("RBA_TPU_FUSED_SOFTMAX"))
    )
    # the fused kernel's math assumes fp32 score input (it does the max/exp
    # in fp32 and writes bf16) — keep its logits fp32 even though the
    # default factorized path materializes compute-dtype logits
    score_t = jnp.float32 if (strict and not fast) or fused else x.dtype
    attn = jnp.einsum("wqhd,wkhd->whqk", q * scale, k, preferred_element_type=score_t)

    if fused:
        # fused add+softmax kernel (opt-in): identical fp32 math, one read
        # of the fp32 scores + one bf16 write instead of XLA's four passes.
        # Measured SLOWER in-model (83 vs 59 ms full inference) despite the
        # traffic win.  Root cause (consistent across v1/v3 attention and
        # this kernel): ~30 µs Mosaic grid-STEP overhead — window-granular
        # blocks are a few µs of real work each, and growing blocks enough
        # to amortize the overhead exceeds the 16 MB scoped-VMEM limit
        # (softmax holds several block-sized fp32 temporaries), while
        # manual-DMA streaming inside a step hard-faults this tunnel's AOT
        # worker (CLAUDE.md).  The single-call fused_rba tail kernel wins
        # because its blocks are large and its per-step work is ~ms-scale.
        from ..ops.pallas.masked_softmax import masked_softmax_bf16

        attn = masked_softmax_bf16(
            attn.reshape(b, nhw * nww, num_heads, n, n), rel_bias, mask,
            out_dtype=x.dtype,
        ).reshape(b * nhw * nww, num_heads, n, n)
    elif fast or strict:
        sm_t = x.dtype if fast else jnp.float32
        a5 = attn.astype(sm_t).reshape(b, nhw * nww, num_heads, n, n)
        a5 = a5 + rel_bias[None, None].astype(sm_t)
        if mask is not None:
            a5 = a5 + jnp.asarray(mask, sm_t)[None, :, None]
        attn = (
            jax.nn.softmax(a5, axis=-1)
            .astype(x.dtype)
            .reshape(b * nhw * nww, num_heads, n, n)
        )
    else:
        # Factorized fp32 softmax:
        #   softmax(s + b + mask) = exp(s − max_k s) · exp(b − max_k b)
        #                           · 1[mask = 0] / Σ_k (…)
        # Identical real-valued math (the row-wise max shifts cancel in the
        # normalization; the only fp difference is one extra exp/multiply
        # rounding, ~1 ulp before the bf16 cast), but the fp32 *biased*
        # score tensor never exists: the bias becomes a small per-head
        # multiplicative constant and the shift mask an exact 0/1 constant
        # (reference adds −100, i.e. a ~1e−44 factor after exp).  XLA
        # materializes the biased fp32 scores in the additive form (the
        # upcast+add feeds three reduce consumers), which at 1024×2048 is
        # 87–314 MB of extra HBM write+read per block; measured on v5e this
        # form runs the attention chain 3× faster at stage 3 (0.157 vs
        # 0.490 ms/block) and ~20% faster at stage 1.
        s32 = attn.astype(jnp.float32)
        m = jnp.max(s32, axis=-1, keepdims=True)
        eb = jnp.exp(rel_bias - jnp.max(rel_bias, axis=-1, keepdims=True))
        num = jnp.exp(s32 - m) * eb[None]  # (W, nh, N, N)
        if mask is not None:
            # Invariant: every attention row keeps >= 1 unmasked key (Swin
            # shift masks always leave the diagonal at 0), else num sums to
            # 0 and this form yields NaN where the reference's additive -100
            # degrades to uniform.  swin_attention_mask guarantees this by
            # construction (mask[q, q] == 0 for all q).
            keep = jnp.asarray((mask == 0).astype(np.float32))
            num = (
                num.reshape(b, nhw * nww, num_heads, n, n) * keep[None, :, None]
            ).reshape(b * nhw * nww, num_heads, n, n)
        attn = (num / jnp.sum(num, axis=-1, keepdims=True)).astype(x.dtype)
    out = jnp.einsum("whqk,wkhd->wqhd", attn, v, preferred_element_type=jnp.float32)
    out = out.astype(x.dtype).reshape(b, nhw, nww, n, c)
    if not apply_proj:
        return out
    return linear(attn_params["proj"], out)


def _window_attention_nested(
    attn_params,
    x: jax.Array,  # (B, nHw, ws, nWw, ws, C) — the un-transposed window view
    num_heads: int,
    ws: int,
    mask: Optional[np.ndarray],  # (nW, N, N) or None
    qk_scale: Optional[float],
    fast_math: bool = False,
) -> jax.Array:
    """Transpose-free window attention: identical math to _window_attention
    but computed directly on the nested (B, nHw, ws, nWw, ws, C) view, so the
    two big partition/reverse transposes per block never materialize — the
    within-window token axes stay split as (p, q̃)/(P, Q̃) pairs and the
    einsums carry them as free/contract dims (perf experiment; select with
    SwinConfig.attn_layout="nested").

    MEASURED RESULT (v5e, Swin-B 1024x2048 parity inference): 163.4 ms vs
    43.4 ms for the partition layout — a 3.8x LOSS.  XLA lowers the 8-D
    score einsums by materializing the nested tensors in layouts far worse
    than the explicit transposes it was meant to avoid (the ws=12 axes land
    in sublane/lane positions with 12/128 utilization).  Kept for the
    record; "partition" stays the production default."""
    b, nhw, _, nww, _, c = x.shape
    n = ws * ws
    nh = num_heads
    hd = c // nh
    scale = qk_scale or hd**-0.5

    qkv = linear(attn_params["qkv"], x)  # (B, nHw, ws, nWw, ws, 3C)
    qkv = qkv.reshape(b, nhw, ws, nww, ws, 3, nh, hd)
    q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]

    bias_table = attn_params["relative_position_bias_table"].astype(jnp.float32)
    idx = relative_position_index(ws)
    rel_bias = bias_table[idx.reshape(-1)].reshape(n, n, nh)
    rel_bias = jnp.transpose(rel_bias, (2, 0, 1)).reshape(nh, ws, ws, ws, ws)

    # scores: (B, nHw, nWw, nh, p, q̃, P, Q̃) — y/x are window-grid batch dims
    attn = jnp.einsum(
        "bypxqnd,byPxQnd->byxnpqPQ", q * scale, k, preferred_element_type=x.dtype
    )
    s32 = attn.astype(jnp.float32)
    m = jnp.max(s32, axis=(-2, -1), keepdims=True)
    eb = jnp.exp(rel_bias - jnp.max(rel_bias, axis=(-2, -1), keepdims=True))
    num = jnp.exp(s32 - m) * eb[None, None, None]
    if mask is not None:
        keep = np.asarray((mask == 0), np.float32).reshape(nhw, nww, ws, ws, ws, ws)
        num = num * jnp.asarray(keep)[None, :, :, None]
    attn = (num / jnp.sum(num, axis=(-2, -1), keepdims=True)).astype(x.dtype)
    out = jnp.einsum(
        "byxnpqPQ,byPxQnd->bypxqnd", attn, v, preferred_element_type=jnp.float32
    )
    out = out.astype(x.dtype).reshape(b, nhw, ws, nww, ws, c)
    return linear(attn_params["proj"], out)


def _drop_path(x, rate: float, rng, deterministic: bool):
    if deterministic or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def swin_block_apply(
    params,
    x: jax.Array,  # (B, H, W, C)
    num_heads: int,
    ws: int,
    shift: int,
    qk_scale: Optional[float],
    drop_path_rate: float = 0.0,
    rng=None,
    deterministic: bool = True,
    fast_math: bool = False,
    attn_layout: str = "partition",
    mlp_impl: str = "xla",
) -> jax.Array:
    b, h, w, c = x.shape
    shortcut = x
    x = layer_norm(params["norm1"], x)

    pad_b = (ws - h % ws) % ws
    pad_r = (ws - w % ws) % ws
    if pad_b or pad_r:
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    hp, wp = h + pad_b, w + pad_r

    if shift > 0:
        x = jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))
        mask = shifted_window_mask(hp, wp, ws, shift)
    else:
        mask = None

    if attn_layout == "nested":
        # transpose-free: attention directly on the nested window view
        x6 = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
        x6 = _window_attention_nested(params["attn"], x6, num_heads, ws, mask,
                                      qk_scale, fast_math=fast_math)
        x = x6.reshape(b, hp, wp, c)
    elif attn_layout == "qkv_canvas":
        # VERDICT-r4 item-5 probe: run the qkv projection position-wise on
        # the un-partitioned (B, Hp, Wp, C) canvas and window-partition the
        # 3C output ONCE, placing the partition transpose directly on a
        # matmul output so XLA's dot/fusion machinery gets the chance to
        # absorb it (the partition-then-qkv order leaves a standalone
        # pre-matmul relayout copy in the trace).  Bit-identical math: the
        # projection is row-wise, so it commutes with the token permutation.
        # On paper this moves 3C bytes through the transpose instead of C —
        # it only wins if the transpose fuses.  See the measured result in
        # the qkv_canvas note below (config.py SwinConfig.attn_layout).
        qkv = linear(params["attn"]["qkv"], x)  # (B, Hp, Wp, 3C)
        qw = qkv.reshape(b, hp // ws, ws, wp // ws, ws, 3 * c)
        qw = jnp.transpose(qw, (0, 1, 3, 2, 4, 5)).reshape(
            b, hp // ws, wp // ws, ws * ws, 3 * c
        )
        xw = _window_attention(params["attn"], None, num_heads, ws, mask,
                               qk_scale, fast_math=fast_math, qkv_pre=qw)
        x = xw.reshape(b, hp // ws, wp // ws, ws, ws, c)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, hp, wp, c)
    else:
        # "proj_canvas": commute the (position-wise) output projection past
        # the window-reverse permutation — proj(reverse(x)) == reverse(
        # proj(x)) exactly (verified bit-identical on CPU) — hoping XLA
        # folds the reverse transpose into the proj matmul operand instead
        # of the standalone copy+reshape pair the trace shows after proj
        # (trace_split: 0.104+0.228 ms per stage-0 block), with proj also
        # skipping pad tokens on the cropped canvas.  MEASURED (v5e, Swin-B
        # 1024x2048 fast): 44.0 ms vs 41.2 partition — a 2.8 ms LOSS.  The
        # reverse does NOT fold into the matmul; instead moving proj out of
        # the attention neighborhood breaks the attn@v->proj fusion XLA
        # builds in the windowed layout.  Kept opt-in for the record.
        proj_canvas = attn_layout == "proj_canvas"
        # partition: (B, Hp/ws, ws, Wp/ws, ws, C) -> (B, nHw, nWw, ws*ws, C)
        xw = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
        xw = jnp.transpose(xw, (0, 1, 3, 2, 4, 5)).reshape(b, hp // ws, wp // ws, ws * ws, c)

        xw = _window_attention(params["attn"], xw, num_heads, ws, mask, qk_scale,
                               fast_math=fast_math, apply_proj=not proj_canvas)

        # reverse
        x = xw.reshape(b, hp // ws, wp // ws, ws, ws, c)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, hp, wp, c)

    if shift > 0:
        x = jnp.roll(x, shift=(shift, shift), axis=(1, 2))
    if pad_b or pad_r:
        x = x[:, :h, :w]
    if attn_layout == "proj_canvas":
        x = linear(params["attn"]["proj"], x)

    rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
    x = shortcut + _drop_path(x, drop_path_rate, rngs[0], deterministic)

    # inference-only: the Pallas kernel has no VJP rule, and training needs
    # the drop-path branch anyway
    if mlp_impl == "fused" and deterministic and jax.default_backend() == "tpu":
        from ..ops.pallas.fused_mlp import beneficial, fused_mlp_residual

        if beneficial(b * h * w, c):
            return fused_mlp_residual(
                x, params["norm2"], params["mlp"]["fc1"], params["mlp"]["fc2"]
            )

    y = layer_norm(params["norm2"], x)
    y = linear(params["mlp"]["fc2"], jax.nn.gelu(linear(params["mlp"]["fc1"], y), approximate=False))
    x = x + _drop_path(y, drop_path_rate, rngs[1], deterministic)
    return x


# ---------------------------------------------------------------------------
# Resident window layout (attn_layout="resident"): the whole stage runs in
# the partitioned (B, nHw, nWw, ws², C) token layout.  LayerNorm / MLP /
# residual adds are position-wise and commute with the partition, so the
# per-block reverse → crop → … → pad → roll → partition round-trips of the
# reference layout collapse to ONE contiguous permutation per shift change
# (and none at all between same-shift neighbors).  In the reference layout
# the two big transposes are separated by the MLP matmuls, so XLA must
# materialize a relayout copy on each side of every block; here the
# transpose→roll→transpose chain is adjacent and fuses.  Exactness: the pad
# region is re-zeroed after norm1 each block (see _resident_keep_mask), so
# real-token values are bit-identical to the partition layout; the price is
# that pad tokens also flow through the MLP (+4–27% tokens per stage at
# 1024×2048, ws=12).  MEASURED (Swin-B 1024×2048 fast mode, devtime):
# 43.8 ms vs 41.2 ms partition — the pad-token MLP FLOPs and the per-block
# keep-mask multiply cost more than the saved relayout copies, so this
# LOSES in-model and stays opt-in (SwinConfig.attn_layout="resident").
# ---------------------------------------------------------------------------

def _stage_attn_layout(attn_layout: str, stage: int) -> str:
    """Per-stage layout selection: ``"resident:0,1"`` runs the resident
    window layout on the listed stages and the default partition layout on
    the rest.  Rationale: the resident trade (pad-token MLP FLOPs + keep
    mask vs saved per-block relayout copies) flips sign per stage — pad
    overhead at 1024×2048 / ws=12 is 3.9 / 6.3 / 16 / 27 % of tokens for
    stages 0–3, while the relayout copies are largest at stage 0/1 where
    the spatial extent is biggest.  Measurements: see the module-level
    resident-layout comment block above."""
    if ":" in attn_layout:
        base, idxs = attn_layout.split(":", 1)
        return base if stage in {int(t) for t in idxs.split(",")} else "partition"
    return attn_layout


def _resident_transition(xw, hp, wp, ws, from_shift, to_shift):
    """Move (B, nHw, nWw, ws², C) tokens from the from_shift window layout to
    the to_shift layout: reverse ∘ roll(from−to) ∘ partition, contiguous."""
    b, nhw, nww, _, c = xw.shape
    x = xw.reshape(b, nhw, nww, ws, ws, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, hp, wp, c)
    d = from_shift - to_shift
    if d:
        x = jnp.roll(x, shift=(d, d), axis=(1, 2))
    x = x.reshape(b, nhw, ws, nww, ws, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, nhw, nww, ws * ws, c)


def _resident_block(
    blk,
    xw: jax.Array,  # (B, nHw, nWw, ws², C) in this block's window layout
    keep,  # np (nHw, nWw, ws²) or None
    mask,  # np (nW, ws², ws²) additive or None
    num_heads: int,
    ws: int,
    qk_scale,
    drop_path_rate: float = 0.0,
    rng=None,
    deterministic: bool = True,
    fast_math: bool = False,
) -> jax.Array:
    shortcut = xw
    y = layer_norm(blk["norm1"], xw)
    if keep is not None:
        # restore exact zeros at pad tokens (the elementwise multiply fuses
        # into the norm/qkv neighborhood, unlike a relayout copy)
        y = y * jnp.asarray(keep, y.dtype)[None, :, :, :, None]
    y = _window_attention(blk["attn"], y, num_heads, ws, mask, qk_scale,
                          fast_math=fast_math)
    rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
    x = shortcut + _drop_path(y, drop_path_rate, rngs[0], deterministic)
    z = layer_norm(blk["norm2"], x)
    z = linear(blk["mlp"]["fc2"], jax.nn.gelu(linear(blk["mlp"]["fc1"], z), approximate=False))
    return x + _drop_path(z, drop_path_rate, rngs[1], deterministic)


def _run_stage_resident(
    blocks,
    x: jax.Array,  # (B, H, W, C)
    num_heads: int,
    ws: int,
    qk_scale,
    dprs,  # per-block drop-path rates
    rng,
    deterministic: bool,
    fast_math: bool,
    use_checkpoint: bool,
) -> jax.Array:
    b, h, w, c = x.shape
    shift = ws // 2
    pad_b = (ws - h % ws) % ws
    pad_r = (ws - w % ws) % ws
    hp, wp = h + pad_b, w + pad_r
    if pad_b or pad_r:
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    nhw, nww = hp // ws, wp // ws
    xw = x.reshape(b, nhw, ws, nww, ws, c)
    xw = jnp.transpose(xw, (0, 1, 3, 2, 4, 5)).reshape(b, nhw, nww, ws * ws, c)

    cur = 0
    for j, blk in enumerate(blocks):
        s = 0 if j % 2 == 0 else shift
        if s != cur:
            xw = _resident_transition(xw, hp, wp, ws, cur, s)
            cur = s
        if rng is not None:
            rng, sub = jax.random.split(rng)
        else:
            sub = None
        fn = functools.partial(
            _resident_block,
            keep=_resident_keep_mask(h, w, hp, wp, ws, s),
            mask=shifted_window_mask(hp, wp, ws, shift) if s else None,
            num_heads=num_heads,
            ws=ws,
            qk_scale=qk_scale,
            drop_path_rate=float(dprs[j]),
            rng=sub,
            deterministic=deterministic,
            fast_math=fast_math,
        )
        if use_checkpoint:
            fn = jax.checkpoint(fn)
        xw = fn(blk, xw)

    if cur:
        xw = _resident_transition(xw, hp, wp, ws, cur, 0)
    x = xw.reshape(b, nhw, nww, ws, ws, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, hp, wp, c)
    return x[:, :h, :w] if (pad_b or pad_r) else x


def _patch_merging(params, x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, ⌈H/2⌉, ⌈W/2⌉, 2C); concat order [ee, oe, eo, oo]
    matching reference PatchMerging (swin.py:327-331)."""
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
    h2, w2 = x.shape[1] // 2, x.shape[2] // 2
    # space-to-depth via reshape/transpose instead of 4 strided slices +
    # concat: identical values — concat([ee, oe, eo, oo], -1) is the
    # (dx, dy, c)-major flatten, dx = column parity outer, dy = row parity
    # inner — in one layout-friendly op.
    x = x.reshape(b, h2, 2, w2, 2, c)          # (b, h2, dy, w2, dx, c)
    x = jnp.transpose(x, (0, 1, 3, 4, 2, 5))   # (b, h2, w2, dx, dy, c)
    x = x.reshape(b, h2, w2, 4 * c)
    x = layer_norm(params["norm"], x)
    return linear(params["reduction"], x)


def swin_apply(
    params,
    cfg: SwinConfig,
    images: jax.Array,  # (B, H, W, 3) normalized
    compute_dtype=jnp.bfloat16,
    rng=None,
    deterministic: bool = True,
    fast_math: bool = False,
) -> Dict[str, jax.Array]:
    """Returns {res2..res5: (B, H/s, W/s, C_s)} feature maps (NHWC)."""
    x = images.astype(compute_dtype)
    p = cfg.patch_size
    b, h, w, _ = x.shape
    if h % p or w % p:
        x = jnp.pad(x, ((0, 0), (0, (p - h % p) % p), (0, (p - w % p) % p), (0, 0)))

    # Patch embed as space-to-depth + matmul: a stride-p conv with C_in=3
    # hits a degenerate batch-in-sublanes conv emitter on v5e (measured
    # 1.24 ms vs 0.31 ms at 1024×2048); p strided row-slices reshape W into
    # (W/p, p·C) groups so the concat lands in exact (dy, dx, c) HWIO
    # flatten order — bit-identical to the conv (reference swin.py:475-478).
    pe = params["patch_embed"]
    b2, hp2, wp2, ci = x.shape
    rows = [
        x[:, dy::p].reshape(b2, hp2 // p, wp2 // p, p * ci) for dy in range(p)
    ]
    x = jnp.concatenate(rows, axis=-1)
    kmat = pe["proj"]["kernel"].astype(compute_dtype).reshape(p * p * ci, -1)
    x = jnp.dot(x, kmat) + pe["proj"]["bias"].astype(compute_dtype)
    if "norm" in pe:
        x = layer_norm(pe["norm"], x)

    if cfg.ape and "absolute_pos_embed" in params:
        # bicubic APE resize with torch kernel semantics a=-0.75, no
        # antialias (reference swin.py:655-659 uses F.interpolate)
        from ..ops.resize import resize_bicubic_nhwc

        ape = params["absolute_pos_embed"]
        ape = resize_bicubic_nhwc(ape, (x.shape[1], x.shape[2]))
        x = x + ape.astype(compute_dtype)

    # stochastic depth schedule: linear over total depth (reference swin.py:569)
    total_depth = sum(cfg.depths)
    dpr = np.linspace(0, cfg.drop_path_rate, total_depth)

    outs: Dict[str, jax.Array] = {}
    blk_idx = 0
    for i in range(cfg.num_layers):
        layer = params["layers"][i]

        stage_layout = _stage_attn_layout(cfg.attn_layout, i)
        if stage_layout == "resident":
            depth = cfg.depths[i]
            if rng is not None:
                rng, stage_rng = jax.random.split(rng)
            else:
                stage_rng = None
            x_out = _run_stage_resident(
                layer["blocks"],
                x,
                num_heads=cfg.num_heads[i],
                ws=cfg.window_size,
                qk_scale=cfg.qk_scale,
                dprs=dpr[blk_idx : blk_idx + depth],
                rng=stage_rng,
                deterministic=deterministic,
                fast_math=fast_math,
                use_checkpoint=cfg.use_checkpoint,
            )
            blk_idx += depth
            if f"res{i + 2}" in cfg.out_features:
                outs[f"res{i + 2}"] = layer_norm(params[f"norm{i}"], x_out)
            if "downsample" in layer:
                x = _patch_merging(layer["downsample"], x_out)
            else:
                x = x_out
            continue

        def run_blocks(x):
            nonlocal blk_idx, rng
            for j, blk in enumerate(layer["blocks"]):
                shift = 0 if j % 2 == 0 else cfg.window_size // 2
                if rng is not None:
                    rng, sub = jax.random.split(rng)
                else:
                    sub = None
                block_fn = functools.partial(
                    swin_block_apply,
                    num_heads=cfg.num_heads[i],
                    ws=cfg.window_size,
                    shift=shift,
                    qk_scale=cfg.qk_scale,
                    drop_path_rate=float(dpr[blk_idx]),
                    rng=sub,
                    deterministic=deterministic,
                    fast_math=fast_math,
                    attn_layout=stage_layout,
                    mlp_impl=cfg.mlp_impl,
                )
                if cfg.use_checkpoint:
                    # remat per block (MODEL.SWIN.USE_CHECKPOINT →
                    # torch.utils.checkpoint in the reference, swin.py:444-445)
                    block_fn = jax.checkpoint(block_fn)
                x = block_fn(blk, x)
                blk_idx += 1
            return x

        x_out = run_blocks(x)

        if f"res{i + 2}" in cfg.out_features:
            outs[f"res{i + 2}"] = layer_norm(params[f"norm{i}"], x_out)

        if "downsample" in layer:
            x = _patch_merging(layer["downsample"], x_out)
        else:
            x = x_out

    return outs
