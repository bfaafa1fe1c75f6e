"""Translate the reference Detectron2 config corpus into the rba-tpu native
format (compact YAML of non-default RbAConfig fields).

Usage:
    python -m rba_tpu.tools.translate_configs \
        --src /root/reference/configs --dst configs/

One output file per input YAML, mirroring the directory layout.  Base YAMLs
(Base-*.yaml) are skipped as standalone outputs — their content is folded
into every child by the _BASE_ merge.  (Reference config pipeline:
train_net.py:352-366.)
"""
from __future__ import annotations

import argparse
import glob
import os

from ..config import config_to_dict, load_d2_config, save_config


def translate_corpus(src: str, dst: str, verbose: bool = True) -> int:
    n = 0
    for path in sorted(glob.glob(os.path.join(src, "**", "*.yaml"), recursive=True)):
        rel = os.path.relpath(path, src)
        if os.path.basename(path).startswith("Base-"):
            continue
        cfg = load_d2_config(path)
        out_path = os.path.join(dst, rel)
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        save_config(out_path, cfg)
        if verbose:
            print(f"{rel}: backbone={cfg.backbone_name} "
                  f"levels={len(cfg.pixel_decoder.transformer_in_features)} "
                  f"dec_layers={cfg.decoder.dec_layers}")
        n += 1
    return n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/reference/configs")
    ap.add_argument("--dst", default="configs")
    args = ap.parse_args()
    n = translate_corpus(args.src, args.dst)
    print(f"translated {n} configs -> {args.dst}")


if __name__ == "__main__":
    main()
