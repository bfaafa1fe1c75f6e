"""PQ evaluation for semantic-segmentation predictions.

Behavioral spec: /root/reference/tools/evaluate_pq_for_semantic_segmentation.py
(245 LoC): treat each class's region in a semantic map as one segment and
compute panoptic quality against the ground truth — a region-quality view
of semantic predictions.

Library use:
    from rba_tpu.tools.evaluate_pq_semseg import semseg_to_panoptic, evaluate
CLI:
    python -m rba_tpu.tools.evaluate_pq_semseg --pred-dir preds/ --gt-dir gts/
(*.png integer class maps with matching filenames; 255 = ignore)
"""
from __future__ import annotations

import argparse
import os
from typing import Dict, List, Tuple

import numpy as np

from ..evalx.panoptic import pq_compute

IGNORE = 255


def semseg_to_panoptic(sem: np.ndarray) -> Tuple[np.ndarray, List[Dict]]:
    """Class map → (panoptic ids, segments): one segment per present class;
    id = class + 1 (0 stays void)."""
    pan = np.zeros_like(sem, dtype=np.int32)
    segments = []
    for cls in np.unique(sem):
        if cls == IGNORE:
            continue
        pan[sem == cls] = int(cls) + 1
        segments.append({"id": int(cls) + 1, "category_id": int(cls), "isthing": False})
    return pan, segments


def evaluate(pred_maps, gt_maps) -> Dict:
    pairs = []
    for pred, gt in zip(pred_maps, gt_maps):
        pan_p, seg_p = semseg_to_panoptic(pred)
        pan_g, seg_g = semseg_to_panoptic(gt)
        pairs.append((pan_p, seg_p, pan_g, seg_g))
    return pq_compute(pairs)


def main(argv=None):
    from PIL import Image

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pred-dir", required=True)
    p.add_argument("--gt-dir", required=True)
    args = p.parse_args(argv)

    names = sorted(f for f in os.listdir(args.pred_dir) if f.endswith(".png"))
    preds, gts = [], []
    for n in names:
        preds.append(np.asarray(Image.open(os.path.join(args.pred_dir, n))).astype(np.int32))
        gts.append(np.asarray(Image.open(os.path.join(args.gt_dir, n))).astype(np.int32))
    res = evaluate(preds, gts)
    print(f"PQ: {res['All']['pq'] * 100:.2f}  SQ: {res['All']['sq'] * 100:.2f}  "
          f"RQ: {res['All']['rq'] * 100:.2f}  (n={res['All']['n']})")


if __name__ == "__main__":
    main()
