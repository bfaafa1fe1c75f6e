"""Cityscapes-style semantic segmentation evaluation CLI (mIoU).

The reference runs D2's SemSegEvaluator during training/eval
(train_net.py:98-102) to produce the Cityscapes-val mIoU numbers in its
MODEL_ZOO (82.25 for swin_b_1dl).  This CLI reproduces that evaluation for
a converted checkpoint.

Usage:
    python -m rba_tpu.evalx.eval_semseg --model-dir ckpts/swin_b_1dl \
        --data-root datasets/cityscapes [--split val] [--limit N]
"""
from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-dir", required=True)
    p.add_argument("--data-root", required=True)
    p.add_argument("--split", default="val")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--out", default=None, help="write metrics JSON here")
    args = p.parse_args(argv)

    from ..data.ood_datasets import CityscapesSemSeg
    from .evaluator import prefetch
    from .seg_evaluators import SemSegEvaluator
    from .sweep import load_model

    cfg, params = load_model(args.model_dir)
    ds = CityscapesSemSeg(args.data_root, split=args.split)
    limit = args.limit or len(ds)
    ev = SemSegEvaluator(cfg, params)
    for i, sample in enumerate(prefetch(ds, limit)):
        ev.process(sample.image, sample.label)
        if (i + 1) % 50 == 0:
            print(f"{i + 1}/{limit}")
    res = ev.evaluate()
    print(json.dumps({k: v for k, v in res.items() if k != "IoU_per_class"}, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
