import numpy as np

from rba_tpu.evalx.panoptic import PQStat, pq_compute, pq_compute_single


def _seg(id_, cat, isthing=True):
    return {"id": id_, "category_id": cat, "isthing": isthing}


def test_perfect_match():
    pan = np.zeros((10, 10), np.int32)
    pan[:, :5] = 1
    pan[:, 5:] = 2
    segs = [_seg(1, 3), _seg(2, 7)]
    res = pq_compute([(pan, segs, pan, segs)])
    assert res["All"]["pq"] == 1.0
    assert res["All"]["sq"] == 1.0
    assert res["All"]["rq"] == 1.0


def test_partial_overlap_iou():
    gt = np.zeros((10, 10), np.int32)
    gt[:, :6] = 1
    pred = np.zeros((10, 10), np.int32)
    pred[:, :4] = 1  # IoU = 40/60 = 0.667 > 0.5 -> TP
    stat = pq_compute_single(pred, [_seg(1, 2)], gt, [_seg(1, 2)])
    assert stat[2].tp == 1
    np.testing.assert_allclose(stat[2].iou, 40 / 60)
    # remaining pred pixels are void(0) in pred, gt id 1 unmatched? no — matched
    assert stat[2].fn == 0


def test_wrong_category_is_fp_fn():
    gt = np.zeros((8, 8), np.int32)
    gt[:4] = 1
    pred = np.zeros((8, 8), np.int32)
    pred[:4] = 1
    stat = pq_compute_single(pred, [_seg(1, 5)], gt, [_seg(1, 6)])
    assert stat[6].fn == 1  # gt category missed
    assert stat[5].fp == 1  # pred category spurious


def test_void_dominated_pred_not_fp():
    gt = np.zeros((8, 8), np.int32)  # all void
    pred = np.zeros((8, 8), np.int32)
    pred[:2] = 1  # fully inside void gt
    stat = pq_compute_single(pred, [_seg(1, 4)], gt, [])
    assert stat[4].fp == 0


def test_unknown_split():
    gt = np.zeros((10, 10), np.int32)
    gt[:, :5] = 1
    gt[:, 5:] = 2
    gt_segs = [_seg(1, 3), _seg(2, 255)]  # one known, one unknown (open-world)
    pred = gt.copy()
    pred_segs = [_seg(1, 3), _seg(2, 255)]
    res = pq_compute([(pred, pred_segs, gt, gt_segs)], isthing={3: False, 255: True})
    assert res["Known"]["pq"] == 1.0
    assert res["Unknown"]["pq"] == 1.0
    assert res["Things"]["n"] == 1 and res["Stuff"]["n"] == 1


def test_pqstat_accumulation():
    a, b = PQStat(), PQStat()
    a[1].tp = 2
    a[1].iou = 1.5
    b[1].fp = 1
    b[2].fn = 3
    a += b
    assert a[1].tp == 2 and a[1].fp == 1 and a[2].fn == 3
