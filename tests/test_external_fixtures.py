"""External-validation fixtures for PQ and mask AP.

The expected numbers below are hand-executed through the *reference*
algorithms — panopticapi's pq_compute (as vendored in
/root/reference/mask2former/evaluation/evaluation.py:113-236) and
pycocotools COCOeval's 101-point AP — on fixtures small enough that every
intermediate (IoU, union, envelope) is exact by construction.  Neither
package is installed in this image, so the values are derived on paper and
hard-coded; each derivation is spelled out next to its assert.
"""
import numpy as np

from rba_tpu.evalx.panoptic import pq_compute, pq_compute_single
from rba_tpu.evalx.seg_evaluators import mask_average_precision


def _rect(h, w, r0, r1, c0, c1, value, base=None):
    m = np.zeros((h, w), np.int64) if base is None else base
    m[r0:r1, c0:c1] = value
    return m


def test_pq_panopticapi_fixture():
    """Two 20×20 images, one thing class (1), one stuff class (2).

    Image 1:
      gt:  g1 cat1 rows0-10 cols0-10 (100px), g2 cat2 rows10-20 (200px),
           void elsewhere (rows0-10 cols10-20).
      pred: p1 cat1 rows0-10 cols0-8 (80px)  -> inter 80, union 100, IoU .8 TP
            p2 cat2 rows10-20 cols0-10 (100px) -> IoU 100/200 = .5, NOT > .5
            => p2 FP, g2 FN.
    Image 2 (void-exclusion + void-FP rules):
      gt:  g1 cat1 rows0-10 cols0-10, void elsewhere.
      pred: p1 cat1 rows0-10 cols0-15 (150px): inter 100, void∩p1 = 50,
            union = 150+100-100-50 = 100 -> IoU 1.0 TP (void excluded)
            p2 cat2 rows10-20 cols0-10 entirely on void -> void frac 1.0 > .5
            -> NOT an FP.

    panopticapi totals: cat1 TP=2 iou=1.8; cat2 TP=0 FP=1 FN=1.
      PQ1 = 1.8/2 = 0.9, SQ1 = 0.9, RQ1 = 1.0; PQ2 = SQ2 = RQ2 = 0.
      All: PQ 0.45, SQ 0.45, RQ 0.5, n=2; Things PQ 0.9; Stuff PQ 0.0.
    """
    h = w = 20
    gt1 = _rect(h, w, 0, 10, 0, 10, 1)
    gt1 = _rect(h, w, 10, 20, 0, 20, 2, gt1)
    pred1 = _rect(h, w, 0, 10, 0, 8, 1)
    pred1 = _rect(h, w, 10, 20, 0, 10, 2, pred1)

    gt2 = _rect(h, w, 0, 10, 0, 10, 1)
    pred2 = _rect(h, w, 0, 10, 0, 15, 1)
    pred2 = _rect(h, w, 10, 20, 0, 10, 2, pred2)

    seg = lambda ids_cats: [{"id": i, "category_id": c} for i, c in ids_cats]
    pairs = [
        (pred1, seg([(1, 1), (2, 2)]), gt1, seg([(1, 1), (2, 2)])),
        (pred2, seg([(1, 1), (2, 2)]), gt2, seg([(1, 1)])),
    ]
    res = pq_compute(pairs, isthing={1: True, 2: False})

    np.testing.assert_allclose(res["per_class"][1]["pq"], 0.9, atol=1e-12)
    np.testing.assert_allclose(res["per_class"][1]["sq"], 0.9, atol=1e-12)
    np.testing.assert_allclose(res["per_class"][1]["rq"], 1.0, atol=1e-12)
    np.testing.assert_allclose(res["per_class"][2]["pq"], 0.0, atol=1e-12)
    np.testing.assert_allclose(res["All"]["pq"], 0.45, atol=1e-12)
    np.testing.assert_allclose(res["All"]["sq"], 0.45, atol=1e-12)
    np.testing.assert_allclose(res["All"]["rq"], 0.5, atol=1e-12)
    np.testing.assert_allclose(res["Things"]["pq"], 0.9, atol=1e-12)
    np.testing.assert_allclose(res["Stuff"]["pq"], 0.0, atol=1e-12)


def test_pq_crowd_rules():
    """panopticapi crowd semantics (evaluation.py:158-198): a crowd gt never
    matches and is not an FN; an unmatched pred of the same category whose
    area is mostly crowd+void is not an FP."""
    h = w = 10
    gt = _rect(h, w, 0, 10, 0, 5, 7)  # crowd region cat 1
    pred = _rect(h, w, 0, 10, 0, 5, 3)  # pred cat 1 exactly on the crowd
    stat = pq_compute_single(
        pred, [{"id": 3, "category_id": 1}],
        gt, [{"id": 7, "category_id": 1, "iscrowd": 1}],
    )
    s = stat[1]
    assert (s.tp, s.fp, s.fn) == (0, 0, 0)

    # different category -> crowd does not shield the FP
    stat = pq_compute_single(
        pred, [{"id": 3, "category_id": 2}],
        gt, [{"id": 7, "category_id": 1, "iscrowd": 1}],
    )
    assert stat[2].fp == 1


def test_mask_ap_cocoeval_fixture():
    """One class, one 20×20 image, 2 gts and 3 detections.

    d1 (score .9) == g1 exactly: IoU 1.0.
    d2 (score .8) covers 60 of g2's 100 px and nothing else: IoU 0.6.
    d3 (score .7) hits no gt: FP everywhere.

    COCOeval, per IoU threshold:
      t ∈ {.50,.55,.60} (d2 counts, IoU ≥ t): ranked TP,TP,FP ->
        P=[1,1,2/3] R=[.5,1,1]; envelope keeps 1 up to recall 1 -> AP = 1.
      t ∈ {.65... .95} (7 thresholds): ranked TP,FP,FP ->
        P=[1,.5,1/3] R=[.5,.5,.5]; envelope [1,.5,1/3]; 101-point recall grid
        0,.01,...,1: the 51 points ≤ .5 read precision 1, the rest 0 ->
        AP = 51/101.
      AP@[.5:.95] = (3·1 + 7·51/101)/10 = 0.65346534...
      AP50 = 1.0, AP75 = 51/101 = 0.50495049...
    """
    h = w = 20
    g1 = np.zeros((h, w), bool); g1[0:10, 0:10] = True
    g2 = np.zeros((h, w), bool); g2[0:10, 10:20] = True
    d1 = g1.copy()
    d2 = np.zeros((h, w), bool); d2[0:10, 10:16] = True  # 60 px inside g2
    d3 = np.zeros((h, w), bool); d3[15:20, 0:5] = True  # on nothing

    preds = [{
        "pred_masks": np.stack([d1, d2, d3]).astype(np.float32),
        "scores": np.array([0.9, 0.8, 0.7], np.float32),
        "pred_classes": np.zeros(3, np.int64),
    }]
    gts = [{"masks": np.stack([g1, g2]).astype(np.float32),
            "classes": np.zeros(2, np.int64)}]

    res = mask_average_precision(preds, gts, num_classes=1)
    expected_ap = (3 * 1.0 + 7 * (51 / 101)) / 10
    np.testing.assert_allclose(res["AP50"], 1.0, atol=1e-12)
    np.testing.assert_allclose(res["AP75"], 51 / 101, atol=1e-12)
    np.testing.assert_allclose(res["AP"], expected_ap, atol=1e-12)


def test_pq_multiprocessing_matches_serial():
    h = w = 20
    gt = _rect(h, w, 0, 10, 0, 10, 1)
    pred = _rect(h, w, 0, 10, 0, 8, 1)
    seg = [{"id": 1, "category_id": 1}]
    pairs = [(pred, seg, gt, seg)] * 4
    serial = pq_compute(pairs)
    par = pq_compute(pairs, num_workers=2)
    assert serial["All"] == par["All"]


def test_open_world_ap_split():
    from rba_tpu.evalx.seg_evaluators import open_world_ap

    h = w = 16
    g_known = np.zeros((h, w), bool); g_known[:8, :8] = True
    g_unknown = np.zeros((h, w), bool); g_unknown[8:, 8:] = True
    gts = [{"masks": np.stack([g_known, g_unknown]).astype(np.float32),
            "classes": np.array([2, 255])}]
    preds = [{
        "pred_masks": np.stack([g_known, g_unknown]).astype(np.float32),
        "scores": np.array([0.9, 0.8], np.float32),
        "pred_classes": np.array([2, 255]),
    }]
    res = open_world_ap(preds, gts, unknown_class=255)
    np.testing.assert_allclose(res["AP_known"], 1.0)
    np.testing.assert_allclose(res["AP_unknown"], 1.0)

    # unknown prediction misplaced -> unknown AP drops, known unaffected
    bad = np.zeros((h, w), bool); bad[:4, 8:] = True
    preds[0]["pred_masks"] = np.stack([g_known, bad]).astype(np.float32)
    res = open_world_ap(preds, gts, unknown_class=255)
    np.testing.assert_allclose(res["AP_known"], 1.0)
    assert res["AP_unknown"] == 0.0
