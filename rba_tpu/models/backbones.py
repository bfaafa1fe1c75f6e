"""Backbone registry: name → (init, apply, out_channels).

Mirrors the reference's BACKBONE_REGISTRY dispatch
(/root/reference/mask2former/modeling/backbone/*: D2SwinTransformer, D2ViT,
D2MViT, mit_b0..b5, WiderResNetA2) with plain functions instead of a
metaclass registry.
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax.numpy as jnp

from ..config import RbAConfig


def build_backbone(cfg: RbAConfig):
    """Returns (init_fn(key), apply_fn(params, images, compute_dtype),
    out_channels: Dict[str, int])."""
    name = cfg.backbone_name

    if name == "swin":
        from .swin import swin_apply, swin_init

        return (
            lambda key: swin_init(key, cfg.swin),
            lambda p, x, dtype: swin_apply(
                p, cfg.swin, x, compute_dtype=dtype, fast_math=cfg.fast_math
            ),
            cfg.swin.out_channels,
        )

    if name == "mix_transformer" or name.startswith("mit_"):
        from .mix_transformer import MIT_VARIANTS, mit_apply, mit_init

        variant = name if name.startswith("mit_") else "mit_b0"
        mcfg = MIT_VARIANTS[variant]
        channels = {f"res{i + 2}": mcfg.embed_dims[i] for i in range(4)}
        return (
            lambda key: mit_init(key, mcfg),
            lambda p, x, dtype: mit_apply(p, mcfg, x, compute_dtype=dtype),
            channels,
        )

    if name == "vit":
        from .vit import ViTConfig, vit_apply, vit_init

        vcfg = ViTConfig()
        return (
            lambda key: vit_init(key, vcfg),
            lambda p, x, dtype: vit_apply(p, vcfg, x, compute_dtype=dtype),
            {"last_feat": vcfg.embed_dim},
        )

    if name == "vit_sfp":
        import jax

        from .vit import ViTConfig, sfp_apply, sfp_init, vit_apply, vit_init

        vcfg = ViTConfig()
        out_ch = cfg.pixel_decoder.conv_dim

        def init(key):
            k1, k2 = jax.random.split(key)
            return {"vit": vit_init(k1, vcfg), "sfp": sfp_init(k2, vcfg.embed_dim, out_ch)}

        def apply(p, x, dtype):
            feats = vit_apply(p["vit"], vcfg, x, compute_dtype=dtype)
            return sfp_apply(p["sfp"], feats["last_feat"])

        return init, apply, {f"res{i}": out_ch for i in range(2, 6)}

    if name == "mvit":
        from .mvit import MViTConfig, mvit_apply, mvit_init

        mcfg = MViTConfig()
        dims = [mcfg.embed_dim * 2**i for i in range(4)]
        return (
            lambda key: mvit_init(key, mcfg),
            lambda p, x, dtype: mvit_apply(p, mcfg, x, compute_dtype=dtype),
            {f"scale{i + 2}": dims[i] for i in range(4)},
        )

    if name == "resnet":
        from .resnet import resnet_apply, resnet_init

        rcfg = cfg.resnet
        return (
            lambda key: resnet_init(key, rcfg),
            lambda p, x, dtype: resnet_apply(p, rcfg, x, compute_dtype=dtype),
            dict(rcfg.out_channels),
        )

    if name == "wideresnet38":
        from .wideresnet import WideResNetConfig, wideresnet_apply, wideresnet_init

        wcfg = WideResNetConfig()
        return (
            lambda key: wideresnet_init(key, wcfg),
            lambda p, x, dtype: wideresnet_apply(p, wcfg, x, compute_dtype=dtype),
            {"res4": 512, "res5": 1024, "res6": 2048, "res7": 4096, "res7_bn": 4096},
        )

    raise NotImplementedError(f"backbone {name}")
