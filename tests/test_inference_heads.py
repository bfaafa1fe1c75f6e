import numpy as np
import pytest

import jax

from rba_tpu.config import tiny_test_config
from rba_tpu.models.inference import instance_inference, panoptic_inference
from rba_tpu.models.tta import resize_shortest_edge_size, tta_inference


def _fake_predictions(rng, q=8, k=7, h=32, w=48):
    """Construct predictions with two confident non-overlapping segments."""
    mask_cls = rng.randn(q, k + 1).astype(np.float32)
    mask_pred = rng.randn(q, h, w).astype(np.float32) - 3.0  # mostly off
    # query 0: class 2 (stuff), left half
    mask_cls[0] = -5.0
    mask_cls[0, 2] = 5.0
    mask_pred[0, :, : w // 2] = 5.0
    # query 1: class 6 (thing-ish in tiny cfg there are no metadata things;
    # pass thing_ids explicitly), right half
    mask_cls[1] = -5.0
    mask_cls[1, 6] = 5.0
    mask_pred[1, :, w // 2 :] = 5.0
    return mask_cls, mask_pred


def test_panoptic_inference_basic(rng):
    cfg = tiny_test_config()
    mask_cls, mask_pred = _fake_predictions(rng)
    pan, segs = panoptic_inference(cfg, mask_cls, mask_pred, thing_ids=(6,))
    assert pan.shape == mask_pred.shape[1:]
    cats = sorted(s["category_id"] for s in segs)
    assert 2 in cats and 6 in cats
    # two segments cover the two halves
    ids = {s["category_id"]: s["id"] for s in segs}
    assert (pan[:, :10] == ids[2]).all()
    assert (pan[:, -10:] == ids[6]).all()
    thing_flags = {s["category_id"]: s["isthing"] for s in segs}
    assert thing_flags[6] and not thing_flags[2]


def test_panoptic_stuff_merging(rng):
    cfg = tiny_test_config()
    q, k, h, w = 6, 7, 16, 24
    mask_cls = np.full((q, k + 1), -5.0, np.float32)
    mask_pred = np.full((q, h, w), -5.0, np.float32)
    # two queries, same stuff class, disjoint regions → one merged segment id
    mask_cls[0, 3] = 5.0
    mask_pred[0, :, :8] = 5.0
    mask_cls[1, 3] = 5.0
    mask_pred[1, :, 16:] = 5.0
    pan, segs = panoptic_inference(cfg, mask_cls, mask_pred, thing_ids=())
    seg_ids = {s["id"] for s in segs}
    assert len(segs) == 1
    assert (pan[:, :8] == 1).all() and (pan[:, 16:] == 1).all()


def test_panoptic_empty(rng):
    cfg = tiny_test_config()
    mask_cls = np.full((4, 8), 0.0, np.float32)  # low confidence → nothing kept
    mask_pred = rng.randn(4, 8, 8).astype(np.float32)
    pan, segs = panoptic_inference(cfg, mask_cls, mask_pred)
    assert segs == [] and (pan == 0).all()


def test_open_panoptic_unknown_segments(rng):
    cfg = tiny_test_config()
    mask_cls, mask_pred = _fake_predictions(rng, h=40, w=60)
    # remove random speckle so the unassigned strip is exactly clean
    # (keep only the constructed 5.0 halves, not noise pixels above 0)
    mask_pred = np.where(mask_pred >= 4.9, 5.0, -5.0).astype(np.float32)
    # synthetic RbA map: a blob of high anomaly in an unassigned region is
    # impossible here (halves covered), so free the middle strip
    mask_pred[0, :, 25:30] = -5.0
    mask_pred[1, :, 30:35] = -5.0
    rba = np.full((40, 60), -10.0, np.float32)
    rba[5:35, 26:34] = 5.0
    pan, segs = panoptic_inference(
        cfg, mask_cls, mask_pred, thing_ids=(6,), open_panoptic=True,
        ood_threshold=0.0, pixel_min=20, rba_map=rba,
    )
    unknown = [s for s in segs if s["category_id"] == 255]
    assert len(unknown) == 1
    assert (pan[10:30, 28:32] == unknown[0]["id"]).all()


def test_instance_inference(rng):
    cfg = tiny_test_config()
    mask_cls, mask_pred = _fake_predictions(rng)
    out = instance_inference(cfg, mask_cls, mask_pred, topk=5)
    assert out["pred_masks"].shape == (5, 32, 48)
    assert out["scores"].shape == (5,)
    assert set(np.unique(out["pred_masks"])) <= {0.0, 1.0}
    # the two confident queries should dominate the top-k
    top2 = set(out["pred_classes"][np.argsort(-out["scores"])][:2].tolist())
    assert top2 == {2, 6}


def test_resize_shortest_edge():
    assert resize_shortest_edge_size(1024, 2048, 512, 4096) == (512, 1024)
    assert resize_shortest_edge_size(1024, 2048, 1536, 2048) == (1024, 2048)


def test_tta_inference_runs(rng):
    from rba_tpu.models.maskformer import maskformer_init

    cfg = tiny_test_config()
    params = maskformer_init(jax.random.PRNGKey(0), cfg)
    img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    sem = tta_inference(params, cfg, img, min_sizes=(32, 48), flip=True)
    assert sem.shape == (cfg.num_classes, 48, 64)
    assert np.isfinite(np.asarray(sem)).all()
    # probabilities-ish range after averaging softmax*sigmoid products
    assert float(sem.min()) >= 0.0
