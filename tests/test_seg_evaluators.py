import numpy as np

import jax

from rba_tpu.config import tiny_test_config
from rba_tpu.evalx.seg_evaluators import (
    InstanceEvaluator,
    OpenPanopticEvaluator,
    SemSegEvaluator,
    mask_average_precision,
)
from rba_tpu.models.maskformer import maskformer_init


def test_semseg_evaluator(rng):
    cfg = tiny_test_config()
    params = maskformer_init(jax.random.PRNGKey(0), cfg)
    ev = SemSegEvaluator(cfg, params)
    for _ in range(2):
        img = (rng.rand(32, 48, 3) * 255).astype(np.uint8)
        lab = rng.randint(0, cfg.num_classes, (32, 48)).astype(np.int32)
        lab[:4] = 255
        ev.process(img, lab)
    res = ev.evaluate()
    assert 0.0 <= res["mIoU"] <= 1.0
    assert 0.0 <= res["pACC"] <= 1.0
    assert len(res["IoU_per_class"]) == cfg.num_classes


def test_mask_ap_perfect():
    masks = np.zeros((2, 16, 16), np.float32)
    masks[0, :8] = 1
    masks[1, 8:] = 1
    preds = [{"pred_masks": masks, "scores": np.array([0.9, 0.8]),
              "pred_classes": np.array([0, 1])}]
    gts = [{"masks": masks.copy(), "classes": np.array([0, 1])}]
    res = mask_average_precision(preds, gts, num_classes=2)
    # pycocotools' epsilon denominator (tp/(tp+fp+np.spacing(1))) puts a
    # perfect AP a few ulps under 1.0 — replicated exactly
    np.testing.assert_allclose(res["AP"], 1.0, atol=1e-12)
    np.testing.assert_allclose(res["AP50"], 1.0, atol=1e-12)


def test_mask_ap_mismatch():
    pm = np.zeros((1, 16, 16), np.float32)
    pm[0, :4] = 1
    gm = np.zeros((1, 16, 16), np.float32)
    gm[0, 8:] = 1  # no overlap
    preds = [{"pred_masks": pm, "scores": np.array([0.9]), "pred_classes": np.array([0])}]
    gts = [{"masks": gm, "classes": np.array([0])}]
    res = mask_average_precision(preds, gts, num_classes=1)
    assert res["AP"] == 0.0


def test_open_panoptic_evaluator_runs(rng):
    cfg = tiny_test_config()
    params = maskformer_init(jax.random.PRNGKey(0), cfg)
    ev = OpenPanopticEvaluator(cfg, params, thing_ids=(6,), open_panoptic=False)
    img = (rng.rand(32, 48, 3) * 255).astype(np.uint8)
    pan_gt = np.zeros((32, 48), np.int32)
    pan_gt[:, :24] = 1
    segs_gt = [{"id": 1, "category_id": 2, "isthing": False}]
    ev.process(img, pan_gt, segs_gt)
    res = ev.evaluate()
    assert "All" in res and "Known" in res


def test_instance_evaluator_runs(rng):
    cfg = tiny_test_config()
    params = maskformer_init(jax.random.PRNGKey(0), cfg)
    ev = InstanceEvaluator(cfg, params, topk=5)
    img = (rng.rand(32, 48, 3) * 255).astype(np.uint8)
    gm = np.zeros((1, 32, 48), np.float32)
    gm[0, :, :24] = 1
    ev.process(img, gm, np.array([3]))
    res = ev.evaluate()
    assert set(res) == {"AP", "AP50", "AP75"}
