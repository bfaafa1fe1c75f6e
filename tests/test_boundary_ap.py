import json
import os

import numpy as np

from rba_tpu.tools.boundary_ap import (
    boundary_iou,
    boundary_mask_average_precision,
    mask_to_boundary,
)


def test_mask_to_boundary_is_band():
    m = np.zeros((64, 64), bool)
    m[16:48, 16:48] = True
    band = mask_to_boundary(m, dilation_ratio=0.02)
    assert band[16, 16] and band[16, 30]  # edge pixels in the band
    assert not band[32, 32]  # interior eroded away
    assert band.sum() < m.sum()


def test_boundary_iou_identity_and_shift():
    m = np.zeros((64, 64), bool)
    m[16:48, 16:48] = True
    assert boundary_iou(m, m) == 1.0
    shifted = np.roll(m, 4, axis=1)
    v = boundary_iou(m, shifted)
    assert 0.0 < v < 1.0
    # boundary IoU penalizes the shift more than plain IoU
    plain = (m & shifted).sum() / (m | shifted).sum()
    assert v < plain


def test_boundary_ap():
    m = np.zeros((1, 32, 32), np.float32)
    m[0, 8:24, 8:24] = 1
    preds = [{"pred_masks": m, "scores": np.array([0.9]), "pred_classes": np.array([0])}]
    gts = [{"masks": m.copy(), "classes": np.array([0])}]
    res = boundary_mask_average_precision(preds, gts, num_classes=1)
    # pycocotools puts np.spacing(1) in the precision denominator
    # (seg_evaluators.py:247), so a perfect match reads 1 - 2.2e-16
    assert abs(res["AP"] - 1.0) < 1e-12


def test_prepare_coco_semseg(tmp_path, rng):
    from PIL import Image

    from rba_tpu.tools.prepare_coco_semseg import main

    pan = np.zeros((16, 16, 3), np.uint8)
    pan[:, :8] = [7, 0, 0]  # id 7
    pan[:, 8:] = [1, 1, 0]  # id 257
    os.makedirs(tmp_path / "pan", exist_ok=True)
    Image.fromarray(pan).save(tmp_path / "pan" / "img0.png")
    meta = {
        "categories": [{"id": 10}, {"id": 20}],
        "annotations": [{
            "file_name": "img0.png",
            "segments_info": [
                {"id": 7, "category_id": 10},
                {"id": 257, "category_id": 20},
            ],
        }],
    }
    with open(tmp_path / "pan.json", "w") as f:
        json.dump(meta, f)
    main([
        "--panoptic-json", str(tmp_path / "pan.json"),
        "--panoptic-root", str(tmp_path / "pan"),
        "--out-dir", str(tmp_path / "sem"),
    ])
    sem = np.asarray(Image.open(tmp_path / "sem" / "img0.png"))
    assert (sem[:, :8] == 0).all()  # category 10 -> contiguous 0
    assert (sem[:, 8:] == 1).all()


def test_unseen_label_filter(rng):
    from rba_tpu.data.mappers import MapperConfig, SemanticDatasetMapper

    cfg = MapperConfig(min_sizes=(64,), crop_hw=(48, 64), max_instances=8, color_aug=False)
    m = SemanticDatasetMapper(cfg, seed=0, unseen_label_set=(2,))
    img = (rng.rand(100, 120, 3) * 255).astype(np.uint8)
    seg = np.zeros((100, 120), np.int32)
    seg[:, 60:] = 2  # unseen class
    out = m(img, seg)
    valid = out["gt_valid"] > 0
    assert 2 not in out["gt_labels"][valid]
    assert (out["sem_seg"] == 255).any()  # unseen region became ignore
