"""Checkpoint conversion CLIs.

Covers the reference's converter tooling in both directions:
  * D2 `model_final.pth`/`.pkl` → native `params.npz`
    (the reverse of what DetectionCheckpointer consumed)
  * timm Swin pretraining `.pth` → native backbone tree — the equivalent of
    /root/reference/tools/convert-pretrained-swin-model-to-d2.py, for
    starting training from ImageNet-pretrained weights.

Usage:
    python -m rba_tpu.tools.convert_checkpoint d2 \
        --config ckpts/swin_b_1dl/config.yaml \
        --checkpoint ckpts/swin_b_1dl/model_final.pth --out params.npz
    python -m rba_tpu.tools.convert_checkpoint timm-swin \
        --config ckpts/swin_b_1dl/config.yaml \
        --checkpoint swin_base_patch4_window12_384_22k.pth --out backbone.npz
    python -m rba_tpu.tools.convert_checkpoint torchvision \
        --config configs/cityscapes/semantic-segmentation/maskformer2_R50_bs16_90k.yaml \
        --checkpoint resnet50-0676ba61.pth --out backbone.npz
"""
from __future__ import annotations

import argparse
from typing import Dict

import numpy as np


def convert_timm_swin(sd: Dict[str, np.ndarray], cfg) -> Dict:
    """timm Swin state dict (keys like ``layers.0.blocks.1.attn.qkv.weight``,
    possibly under a ``model`` wrapper and without the ``backbone.`` prefix)
    → our backbone param tree.  Head/classifier keys are dropped, matching
    the reference converter's "matching_heuristics" behavior."""
    from ..convert.d2_mapping import convert_swin_backbone

    prefixed = {}
    for k, v in sd.items():
        if k.startswith(("head.", "norm.")):  # classifier head + final norm
            continue
        if "attn_mask" in k or "relative_position_index" in k:
            continue  # regenerated statically
        prefixed["backbone." + k] = np.asarray(v)
    # timm checkpoints lack the per-output norms (norm0..norm3) — D2 loads
    # them via matching heuristics as missing; keep whatever init provides.
    import jax

    from ..models.swin import swin_init

    init = jax.tree.map(np.asarray, swin_init(jax.random.PRNGKey(0), cfg.swin))
    for i in range(cfg.swin.num_layers):
        key = f"backbone.norm{i}.weight"
        if key not in prefixed and f"norm{i}" in init:
            prefixed[key] = init[f"norm{i}"]["scale"]
            prefixed[f"backbone.norm{i}.bias"] = init[f"norm{i}"]["bias"]
    return convert_swin_backbone(prefixed, cfg)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("mode", choices=["d2", "timm-swin", "torchvision"])
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    from ..config import load_d2_config
    from ..convert.checkpoint import read_state_dict, save_params

    cfg = load_d2_config(args.config)
    sd = read_state_dict(args.checkpoint)
    if args.mode == "d2":
        from ..convert.d2_mapping import convert_d2_state_dict

        params = convert_d2_state_dict(sd, cfg)
    elif args.mode == "torchvision":
        # torchvision ResNet .pth → D2 names → native backbone tree (the
        # reference performs the first hop offline with
        # tools/convert-torchvision-to-d2.py and loads the result via
        # DetectionCheckpointer)
        from ..convert.d2_mapping import convert_resnet_backbone, torchvision_resnet_to_d2

        params = convert_resnet_backbone(torchvision_resnet_to_d2(sd), cfg)
    else:
        params = convert_timm_swin(sd, cfg)
    save_params(args.out, params)
    n = sum(int(np.prod(x.shape)) for x in __import__("jax").tree.leaves(params))
    print(f"wrote {args.out}: {n / 1e6:.2f}M parameters")


if __name__ == "__main__":
    main()
