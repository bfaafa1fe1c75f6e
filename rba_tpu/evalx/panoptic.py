"""Panoptic Quality (PQ) evaluation, including the open-world known/unknown
split.

Behavioral spec: /root/reference/mask2former/evaluation/evaluation.py
(PQStat :41-109 with known/unknown aggregation, pq_compute_single_core
:113-236) and coco_panoptic_open_evaluator.py:42-483 — standard
COCO-panoptic PQ: segments match when IoU > 0.5 (void-excluded), per
category PQ = Σ IoU / (TP + FP/2 + FN/2); the open variant adds an
"unknown" category id (255) whose PQ is reported separately.

Pure numpy; the per-image confusion is one bincount over the combined
(pred_id · OFFSET + gt_id) encoding.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

VOID = 0
OFFSET = 256 * 256 * 256
UNKNOWN_CATEGORY = 255


@dataclass
class PQStatCat:
    iou: float = 0.0
    tp: int = 0
    fp: int = 0
    fn: int = 0

    def __iadd__(self, other: "PQStatCat"):
        self.iou += other.iou
        self.tp += other.tp
        self.fp += other.fp
        self.fn += other.fn
        return self


class PQStat:
    def __init__(self):
        self.per_cat: Dict[int, PQStatCat] = {}

    def __getitem__(self, cat: int) -> PQStatCat:
        return self.per_cat.setdefault(cat, PQStatCat())

    def __setitem__(self, cat: int, value: PQStatCat) -> None:
        self.per_cat[cat] = value

    def __iadd__(self, other: "PQStat"):
        for cat, s in other.per_cat.items():
            self[cat] += s
        return self

    def pq_average(
        self,
        categories: Optional[Sequence[int]] = None,
        isthing: Optional[Dict[int, bool]] = None,
        thing: Optional[bool] = None,
    ) -> Tuple[Dict[str, float], Dict[int, Dict[str, float]]]:
        cats = categories if categories is not None else sorted(self.per_cat)
        pq_sum = sq_sum = rq_sum = 0.0
        n = 0
        per_class = {}
        for cat in cats:
            if isthing is not None and thing is not None:
                if cat not in isthing or isthing[cat] != thing:
                    continue
            s = self.per_cat.get(cat, PQStatCat())
            denom = s.tp + 0.5 * s.fp + 0.5 * s.fn
            if denom == 0:
                per_class[cat] = {"pq": 0.0, "sq": 0.0, "rq": 0.0}
                continue
            n += 1
            pq = s.iou / denom
            sq = s.iou / s.tp if s.tp else 0.0
            rq = s.tp / denom
            per_class[cat] = {"pq": pq, "sq": sq, "rq": rq}
            pq_sum += pq
            sq_sum += sq
            rq_sum += rq
        if n == 0:
            return {"pq": 0.0, "sq": 0.0, "rq": 0.0, "n": 0}, per_class
        return {"pq": pq_sum / n, "sq": sq_sum / n, "rq": rq_sum / n, "n": n}, per_class


def pq_compute_single(
    pan_pred: np.ndarray,  # (H, W) int segment ids, 0 = void
    segments_pred: List[Dict],  # [{"id", "category_id", ...}]
    pan_gt: np.ndarray,
    segments_gt: List[Dict],
) -> PQStat:
    stat = PQStat()
    pred_cat = {s["id"]: s["category_id"] for s in segments_pred}
    gt_cat = {s["id"]: s["category_id"] for s in segments_gt}
    # panopticapi crowd rules (reference evaluation.py:158-198): crowd gt
    # segments never match and are not FNs; their area joins the void pool
    # for the FP filter of same-category predictions
    gt_crowd = {s["id"] for s in segments_gt if s.get("iscrowd", 0) == 1}

    pan_pred = pan_pred.astype(np.int64)
    pan_gt = pan_gt.astype(np.int64)

    pred_areas = dict(zip(*np.unique(pan_pred, return_counts=True)))
    gt_areas = dict(zip(*np.unique(pan_gt, return_counts=True)))

    combined = pan_pred * OFFSET + pan_gt
    pairs, counts = np.unique(combined, return_counts=True)
    inter: Dict[Tuple[int, int], int] = {}
    for pair, cnt in zip(pairs, counts):
        inter[(int(pair // OFFSET), int(pair % OFFSET))] = int(cnt)

    matched_pred, matched_gt = set(), set()
    for (pid, gid), cnt in inter.items():
        if pid == VOID or gid == VOID or gid in gt_crowd:
            continue
        if pred_cat.get(pid) != gt_cat.get(gid):
            continue
        # standard PQ union excludes the pred segment's void overlap
        union = pred_areas[pid] + gt_areas[gid] - cnt - inter.get((pid, VOID), 0)
        iou = cnt / union if union > 0 else 0.0
        if iou > 0.5:
            cat = gt_cat[gid]
            stat[cat].tp += 1
            stat[cat].iou += iou
            matched_pred.add(pid)
            matched_gt.add(gid)

    for gid, cat in gt_cat.items():
        if gid in matched_gt or gid not in gt_areas or gid in gt_crowd:
            continue
        stat[cat].fn += 1

    crowd_by_cat = {gt_cat[g]: g for g in gt_crowd}
    for pid, cat in pred_cat.items():
        if pid in matched_pred or pid not in pred_areas:
            continue
        # predictions mostly covered by void (+ same-category crowd) don't
        # count as FP (panopticapi rule, reference evaluation.py:190-198)
        void_overlap = inter.get((pid, VOID), 0)
        if cat in crowd_by_cat:
            void_overlap += inter.get((pid, crowd_by_cat[cat]), 0)
        if pred_areas[pid] > 0 and void_overlap / pred_areas[pid] > 0.5:
            continue
        stat[cat].fp += 1
    return stat


def pq_compute(
    pairs: Sequence[Tuple[np.ndarray, List[Dict], np.ndarray, List[Dict]]],
    isthing: Optional[Dict[int, bool]] = None,
    num_workers: int = 0,
) -> Dict[str, Dict]:
    """Aggregate PQ over (pred, pred_segments, gt, gt_segments) image tuples.
    Returns All/Things/Stuff plus Known/Unknown splits (open-world).
    ``num_workers`` > 0 fans the per-image confusion out over a process pool
    (the reference's pq_compute_multi_core, evaluation.py:201-236)."""
    total = PQStat()
    if num_workers > 0 and len(pairs) > 1:
        import multiprocessing as mp

        with mp.get_context("spawn").Pool(num_workers) as pool:
            for stat in pool.starmap(pq_compute_single, pairs):
                total += stat
    else:
        for pan_pred, seg_pred, pan_gt, seg_gt in pairs:
            total += pq_compute_single(pan_pred, seg_pred, pan_gt, seg_gt)

    results: Dict[str, Dict] = {}
    results["All"], per_class = total.pq_average()
    results["per_class"] = per_class
    if isthing is not None:
        results["Things"], _ = total.pq_average(isthing=isthing, thing=True)
        results["Stuff"], _ = total.pq_average(isthing=isthing, thing=False)
    known = [c for c in sorted(total.per_cat) if c != UNKNOWN_CATEGORY]
    results["Known"], _ = total.pq_average(categories=known)
    if UNKNOWN_CATEGORY in total.per_cat:
        results["Unknown"], _ = total.pq_average(categories=[UNKNOWN_CATEGORY])
    return results
