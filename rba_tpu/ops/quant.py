"""Weight-only int8 quantization (serving experiment, VERDICT r3 task 6).

Symmetric per-output-channel int8 for 2-D linear kernels: each linear param
dict ``{"kernel": (din, dout), "bias"?}`` becomes ``{"kernel_q": int8,
"kscale": f32 (dout,), "bias"?}``; ``ops.nn.linear`` dequantizes inline
(``kernel_q.astype(x.dtype) * kscale``) so XLA can fuse the convert+scale
into the matmul operand read and the weight bytes halve in HBM.

Expected-value arithmetic (recorded BEFORE measuring, so the measurement is
an honest check): Swin-B + decoders hold ~107M params ≈ 214 MB bf16, i.e.
~0.27 ms of one-pass HBM traffic at the v5e's ~800 GB/s — the model's HBM
pressure at 1024×2048 is *activation*-dominated (stage-0 MLP: 0.13 MB of
weights vs ~170 MB of activations per layer), so weight-only int8 can move
end-to-end device time by at most ~0.13 ms.  The experiment exists to
confirm that arithmetic and to record the AUROC cost of int8 weights
through the ablation harness (tools/ablation.py --modes ...,fast_int8).

Reference analogue: none (the reference serves fp16/fp32 torch); this is a
TPU-serving experiment gated behind ``RbAConfig.weight_quant``.
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

# param-dict keys that are accessed as raw ``["kernel"]`` outside
# ops.nn.linear (fused qkv in transformer_decoder, conv kernels are 4-D and
# excluded by ndim anyway) — never quantized
_SKIP_NAMES = frozenset({"in_proj", "patch_embed"})


def config_skip_names(cfg) -> frozenset:
    """Config-dependent raw-``["kernel"]`` access sites (ADVICE r4): MViT's
    pooling-attention projection reads ``p["proj"]["kernel"]`` directly
    (models/mvit.py) and the opt-in fused-MLP Pallas kernel reads
    fc1/fc2 kernels (ops/pallas/fused_mlp.py) — quantizing those dicts
    would KeyError at trace time, so they stay fp."""
    extra = set()
    if cfg is None:
        return frozenset()
    if getattr(cfg, "backbone_name", "") == "mvit":
        extra.add("proj")
    swin = getattr(cfg, "swin", None)
    if swin is not None and getattr(swin, "mlp_impl", "xla") == "fused":
        extra.update(("fc1", "fc2"))
    return frozenset(extra)


def quantize_linear_int8(p: Dict[str, Any]) -> Dict[str, Any]:
    """Symmetric per-output-channel int8 for one ``{"kernel", "bias"?}``."""
    k = np.asarray(p["kernel"], np.float32)  # (din, dout)
    amax = np.abs(k).max(axis=0)  # (dout,)
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.rint(k / scale), -127, 127).astype(np.int8)
    out = {"kernel_q": jnp.asarray(q), "kscale": jnp.asarray(scale)}
    if p.get("bias") is not None:
        out["bias"] = p["bias"]
    return out


def quantize_params_int8(params, min_dim: int = 64, cfg=None):
    """Walk a param pytree, replacing eligible linear kernels with int8.

    Eligible = a dict whose keys ⊆ {kernel, bias}, kernel.ndim == 2, and
    min(kernel.shape) >= min_dim (tiny heads such as class_embed keep fp32
    — their bytes are negligible and their logits feed the score path).
    Pass ``cfg`` (RbAConfig) so config-dependent raw-kernel access sites
    (MViT proj, fused-MLP fc1/fc2) are skipped too."""
    skip = _SKIP_NAMES | config_skip_names(cfg)

    def walk(node, name=""):
        if isinstance(node, dict):
            if (
                name not in skip
                and set(node) <= {"kernel", "bias"}
                and "kernel" in node
                and hasattr(node["kernel"], "ndim")
                and node["kernel"].ndim == 2
                and min(node["kernel"].shape) >= min_dim
            ):
                return quantize_linear_int8(node)
            return {k: walk(v, k) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, name) for v in node)
        return node

    return walk(params)


def count_quantized(params) -> Dict[str, int]:
    """{"quantized": n_kernels, "int8_params": n, "skipped_linear": n}."""
    stats = {"quantized": 0, "int8_params": 0, "fp_linear": 0}

    def walk(node):
        if isinstance(node, dict):
            if "kernel_q" in node:
                stats["quantized"] += 1
                stats["int8_params"] += int(np.prod(node["kernel_q"].shape))
                return
            if "kernel" in node and getattr(node["kernel"], "ndim", 0) == 2:
                stats["fp_linear"] += 1
            for v in node.values():
                walk(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                walk(v)

    walk(params)
    return stats
