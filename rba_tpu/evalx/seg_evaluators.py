"""Semantic / panoptic / instance evaluation harnesses.

Behavioral spec:
  * SemSegEvaluator (D2) as used by the reference for Cityscapes mIoU
    (/root/reference/train_net.py:98-102) — aggregate confusion matrix over
    the dataset, mIoU/fwIoU/pACC; distributed=True becomes a psum-able
    confusion-matrix reduction.
  * SemSegOpenEvaluator / COCOPanopticOpenEvaluator
    (/root/reference/mask2former/evaluation/coco_panoptic_open_evaluator.py:
    42-483) — panoptic inference (optionally the open-world RbA branch) fed
    into PQ with known/unknown splits (rba_tpu/evalx/panoptic.py).
  * InstanceEvaluator (/root/reference/mask2former/evaluation/
    instance_evaluation.py:30-107) — COCO-style mask AP tolerant of
    non-contiguous ids; implemented as a numpy mask-AP over IoU thresholds.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RbAConfig
from ..models.inference import CITYSCAPES_THING_IDS, instance_inference, panoptic_inference
from ..models.maskformer import maskformer_infer, rba_score
from .panoptic import pq_compute


class SemSegEvaluator:
    """Aggregate-confusion-matrix mIoU (plus per-class IoU, pixel acc)."""

    def __init__(self, cfg: RbAConfig, params):
        self.cfg = cfg
        self.params = params
        k = cfg.num_classes
        self.conf = np.zeros((k, k), np.int64)

        @functools.lru_cache(maxsize=16)
        def for_shape(shape):
            def fn(params, images, labels):
                sem = maskformer_infer(params, cfg, images)["sem_seg"]
                pred = jnp.argmax(sem, axis=1)
                valid = labels != 255
                idx = jnp.where(valid, labels * k + pred, k * k)
                return jnp.bincount(idx.reshape(-1), length=k * k + 1)[: k * k]

            return jax.jit(fn)

        self._fn = for_shape

    def process(self, image: np.ndarray, label: np.ndarray):
        counts = self._fn(tuple(image.shape))(
            self.params,
            jnp.asarray(image[None], jnp.float32),
            jnp.asarray(label[None].astype(np.int32)),
        )
        self.conf += np.asarray(counts, np.int64).reshape(self.cfg.num_classes, -1)

    def evaluate(self) -> Dict[str, float]:
        conf = self.conf.astype(np.float64)
        inter = np.diag(conf)
        union = conf.sum(0) + conf.sum(1) - inter
        iou = inter / np.maximum(union, 1)
        present = union > 0
        freq = conf.sum(1) / max(conf.sum(), 1)
        return {
            "mIoU": float(iou[present].mean()) if present.any() else float("nan"),
            "fwIoU": float((iou * freq).sum()),
            "pACC": float(inter.sum() / max(conf.sum(), 1)),
            "IoU_per_class": iou.tolist(),
        }


class OpenPanopticEvaluator:
    """Run (open-)panoptic inference over a dataset with panoptic GT and
    aggregate PQ, including the Unknown (category 255) split."""

    def __init__(self, cfg: RbAConfig, params, thing_ids: Sequence[int] = CITYSCAPES_THING_IDS,
                 open_panoptic: Optional[bool] = None, ood_threshold: float = -0.1,
                 pixel_min: int = 300):
        self.cfg = cfg
        self.params = params
        self.thing_ids = tuple(thing_ids)
        self.open_panoptic = cfg.test.panoptic_on if open_panoptic is None else open_panoptic
        self.ood_threshold = ood_threshold
        self.pixel_min = pixel_min
        self.pairs: List = []

        from ..models.maskformer import maskformer_forward, preprocess
        from ..ops.resize import resize_bilinear

        # one jitted raw-outputs fn per input shape: an eager forward here
        # dispatches thousands of ops per image (minutes through the ~26 ms
        # tunnel RTT vs ~50 ms jitted)
        @functools.lru_cache(maxsize=16)
        def raw_for_shape(shape):
            def fn(params, images):
                x = preprocess(cfg, images)
                outputs = maskformer_forward(params, cfg, x)
                mask_pred = resize_bilinear(
                    outputs["pred_masks"], (x.shape[1], x.shape[2]),
                    align_corners=False,
                )
                return outputs["pred_logits"], mask_pred

            return jax.jit(fn)

        self._raw = raw_for_shape

    def _raw_outputs(self, image: np.ndarray):
        logits, mask_pred = self._raw((1,) + tuple(image.shape))(
            self.params, jnp.asarray(image[None], jnp.float32)
        )
        # crop the divisibility padding on host (shape-dependent slice)
        mask_pred = np.asarray(mask_pred[0])[:, : image.shape[0], : image.shape[1]]
        return np.asarray(logits[0]), mask_pred

    def process(self, image: np.ndarray, pan_gt: np.ndarray, segments_gt: List[Dict]):
        mask_cls, mask_pred = self._raw_outputs(image)
        pan_pred, segments_pred = panoptic_inference(
            self.cfg, mask_cls, mask_pred, thing_ids=self.thing_ids,
            open_panoptic=self.open_panoptic, ood_threshold=self.ood_threshold,
            pixel_min=self.pixel_min,
        )
        self.pairs.append((pan_pred, segments_pred, pan_gt, segments_gt))

    def evaluate(self) -> Dict:
        # full thing/stuff assignment over the contiguous class range (a
        # things-only map would make pq_average(thing=False) skip every
        # stuff category and report a structurally-zero Stuff split);
        # unknown segments (category 255) are instance proposals → things
        from .panoptic import UNKNOWN_CATEGORY

        things = set(self.thing_ids)
        isthing = {c: c in things for c in range(self.cfg.num_classes)}
        isthing[UNKNOWN_CATEGORY] = True
        return pq_compute(self.pairs, isthing=isthing)


def _mask_iou_matrix(
    pred_masks: np.ndarray, gt_masks: np.ndarray, iscrowd=None
) -> np.ndarray:
    """(P, H, W) × (G, H, W) binary masks → (P, G) IoU.  For crowd gt
    columns the denominator is the detection area alone (pycocotools
    maskUtils.iou iscrowd semantics)."""
    p = pred_masks.reshape(len(pred_masks), -1).astype(bool)
    g = gt_masks.reshape(len(gt_masks), -1).astype(bool)
    inter = p.astype(np.float64) @ g.T.astype(np.float64)
    union = p.sum(1)[:, None] + g.sum(1)[None, :] - inter
    if iscrowd is not None and np.any(iscrowd):
        parea = np.broadcast_to(p.sum(1)[:, None], union.shape)
        union = np.where(np.asarray(iscrowd, bool)[None, :], parea, union)
    return inter / np.maximum(union, 1)


def mask_average_precision(
    predictions: List[Dict[str, np.ndarray]],  # per image: pred_masks, scores, pred_classes
    ground_truths: List[Dict[str, np.ndarray]],  # per image: masks, classes, [iscrowd]
    num_classes: int,
    # linspace, not arange: pycocotools' exact grid — arange's 0.60000…01
    # would reject an exactly-0.6 IoU at the 0.6 threshold
    iou_thresholds: Sequence[float] = tuple(np.linspace(0.5, 0.95, 10)),
) -> Dict[str, float]:
    """COCO-style mask AP (mean over IoU 0.5:0.95), numpy implementation
    replicating pycocotools' evaluateImg/accumulate branch for branch
    (as vendored at reference evaluation.py:385-468, :560-640):

    * detections sort by descending score with **mergesort** (stable) both
      per image and across the concatenated record list — score ties keep
      insertion order, the documented Matlab-compat behavior;
    * gt segments with ``iscrowd`` are ignore-gts: sorted last, never
      counted in n_gt, matchable by leftover detections (crowd IoU =
      intersection / det area, maskUtils.iou semantics) and such matches
      mark the detection ignored — excluded from BOTH TP and FP cumsums;
    * within the gt loop an EQUAL IoU replaces the running best (the
      reference's ``if ious < iou: continue``), so among tied gts the last
      in (regular-first) order wins; the loop breaks at the first ignore
      gt once a regular match exists.
    """
    ap_per_thr = []
    for thr in iou_thresholds:
        aps = []
        for cls in range(num_classes):
            records = []  # (score, insertion_idx, is_tp, is_ignored)
            n_gt = 0
            for pred, gt in zip(predictions, ground_truths):
                gsel = gt["classes"] == cls
                gmasks = gt["masks"][gsel]
                crowd = (
                    gt["iscrowd"][gsel].astype(bool)
                    if "iscrowd" in gt
                    else np.zeros(len(gmasks), bool)
                )
                n_gt += int((~crowd).sum())
                psel = pred["pred_classes"] == cls
                pmasks = pred["pred_masks"][psel]
                scores = pred["scores"][psel]
                # ignore-gts (crowd) last, detections by descending score;
                # both stable (pycocotools kind='mergesort')
                gorder = np.argsort(crowd, kind="mergesort")
                gmasks, crowd = gmasks[gorder], crowd[gorder]
                dorder = np.argsort(-scores, kind="mergesort")
                iou = (
                    _mask_iou_matrix(pmasks, gmasks, iscrowd=crowd)
                    if len(pmasks) and len(gmasks)
                    else None
                )
                matched = np.zeros(len(gmasks), bool)
                for pi in dorder:
                    m = -1
                    best = min(thr, 1 - 1e-10)
                    if iou is not None:
                        for gi in range(len(gmasks)):
                            if matched[gi] and not crowd[gi]:
                                continue
                            # matched to a regular gt already, and the
                            # remaining gts are all ignore: stop
                            if m > -1 and not crowd[m] and crowd[gi]:
                                break
                            if iou[pi, gi] < best:
                                continue
                            best = iou[pi, gi]
                            m = gi
                    if m == -1:
                        records.append((scores[pi], len(records), False, False))
                    else:
                        matched[m] = True
                        # a crowd match marks the detection ignored
                        records.append(
                            (scores[pi], len(records), not crowd[m], bool(crowd[m]))
                        )
                del iou
            if n_gt == 0:
                continue
            if not records:
                aps.append(0.0)
                continue
            # stable descending-score sort of the concatenated records
            records.sort(key=lambda r: (-r[0], r[1]))
            is_tp = np.array([r[2] for r in records])
            is_ig = np.array([r[3] for r in records])
            tps = np.cumsum(is_tp & ~is_ig)
            fps = np.cumsum(~is_tp & ~is_ig)
            recall = tps / n_gt
            precision = tps / (tps + fps + np.spacing(1))
            # 101-point interpolated AP (COCO)
            rc = np.linspace(0, 1, 101)
            prec_interp = np.zeros_like(rc)
            # precision envelope
            for i in range(len(precision) - 2, -1, -1):
                precision[i] = max(precision[i], precision[i + 1])
            idx = np.searchsorted(recall, rc, side="left")
            valid = idx < len(precision)
            prec_interp[valid] = precision[idx[valid]]
            aps.append(float(prec_interp.mean()))
        ap_per_thr.append(float(np.mean(aps)) if aps else float("nan"))
    ap50 = ap_per_thr[0]
    return {
        "AP": float(np.nanmean(ap_per_thr)),
        "AP50": ap50,
        "AP75": ap_per_thr[5] if len(ap_per_thr) > 5 else float("nan"),
    }


def open_world_ap(
    predictions: List[Dict[str, np.ndarray]],
    ground_truths: List[Dict[str, np.ndarray]],
    unknown_class: int,
) -> Dict[str, float]:
    """Open-world instance AP split (reference COCOOpeneval,
    evaluation.py:352-730): AP over the known classes (unknown instances
    removed from both sides) and class-agnostic AP over the unknown
    instances alone."""

    def select(items, keep_unknown):
        out = []
        for it in items:
            cls_key = "pred_classes" if "pred_classes" in it else "classes"
            mask_key = "pred_masks" if "pred_masks" in it else "masks"
            cls = it[cls_key]
            sel = (cls == unknown_class) if keep_unknown else (cls != unknown_class)
            d = {mask_key: it[mask_key][sel], cls_key: np.zeros(sel.sum(), np.int64)
                 if keep_unknown else cls[sel]}
            if "scores" in it:
                d["scores"] = it["scores"][sel]
            out.append(d)
        return out

    # max over KNOWN ids only: the unknown class (often 255) would inflate
    # the known-AP loop to 256 classes of mostly empty work
    n_known = int(
        max(
            [g["classes"][g["classes"] != unknown_class].max(initial=-1)
             for g in ground_truths]
            + [p["pred_classes"][p["pred_classes"] != unknown_class].max(initial=-1)
               for p in predictions]
        )
    ) + 1
    known = mask_average_precision(
        select(predictions, False), select(ground_truths, False), num_classes=n_known
    )
    unknown = mask_average_precision(
        select(predictions, True), select(ground_truths, True), num_classes=1
    )
    return {
        "AP_known": known["AP"], "AP50_known": known["AP50"],
        "AP_unknown": unknown["AP"], "AP50_unknown": unknown["AP50"],
    }


class InstanceEvaluator:
    """Mask-AP evaluator over a dataset (reference instance_evaluation.py)."""

    def __init__(self, cfg: RbAConfig, params, topk: int = 100):
        self.cfg = cfg
        self.params = params
        self.topk = topk
        self.preds: List[Dict] = []
        self.gts: List[Dict] = []
        # reuse ONE forward-fn cache across images (a per-image evaluator
        # would retrace/recompile the model every call)
        self._fwd = OpenPanopticEvaluator(self.cfg, self.params)

    def process(self, image: np.ndarray, gt_masks: np.ndarray, gt_classes: np.ndarray):
        mask_cls, mask_pred = self._fwd._raw_outputs(image)
        out = instance_inference(self.cfg, mask_cls, mask_pred, topk=self.topk)
        self.preds.append(out)
        self.gts.append({"masks": gt_masks, "classes": gt_classes})

    def evaluate(self) -> Dict[str, float]:
        return mask_average_precision(self.preds, self.gts, self.cfg.num_classes)
