import numpy as np
import random

from rba_tpu.data.mappers import (
    InstanceDatasetMapper,
    MapperConfig,
    PanopticDatasetMapper,
    lsj_augment,
    rgb2id,
)


def test_rgb2id():
    color = np.zeros((2, 2, 3), np.uint8)
    color[0, 0] = [5, 1, 0]  # 5 + 256
    assert rgb2id(color)[0, 0] == 5 + 256
    assert rgb2id(color)[1, 1] == 0


def test_panoptic_mapper(rng):
    cfg = MapperConfig(min_sizes=(128,), crop_hw=(96, 128), max_instances=8, color_aug=False)
    m = PanopticDatasetMapper(cfg, seed=0)
    img = (rng.rand(200, 300, 3) * 255).astype(np.uint8)
    pan = np.zeros((200, 300), np.int32)
    pan[:, :150] = 1001
    pan[:, 150:] = 2002
    segs = [
        {"id": 1001, "category_id": 3},
        {"id": 2002, "category_id": 12},
        {"id": 9999, "category_id": 5},  # absent id -> skipped
    ]
    out = m(img, pan, segs)
    assert out["images"].shape == (96, 128, 3)
    assert out["gt_masks"].shape == (8, 96, 128)
    n = int(out["gt_valid"].sum())
    assert n == 2
    assert set(out["gt_labels"][:n].tolist()) == {3, 12}
    # masks partition the crop (up to the two segments)
    total = out["gt_masks"][:n].sum(0)
    assert (total <= 1.0).all() and total.sum() == 96 * 128


def test_instance_mapper(rng):
    cfg = MapperConfig(min_sizes=(128,), crop_hw=(96, 128), max_instances=4, color_aug=False)
    m = InstanceDatasetMapper(cfg, seed=0)
    img = (rng.rand(200, 300, 3) * 255).astype(np.uint8)
    masks = np.zeros((2, 200, 300), np.uint8)
    masks[0, 50:150, 50:150] = 1
    masks[1, 20:80, 200:280] = 1
    out = m(img, masks, np.array([4, 7]))
    assert out["images"].shape == (96, 128, 3)
    assert out["gt_masks"].shape == (4, 96, 128)
    assert int(out["gt_valid"].sum()) >= 1  # at least one survives the crop


def test_lsj_augment(rng):
    r = random.Random(0)
    img = (rng.rand(123, 456, 3) * 255).astype(np.uint8)
    seg = rng.randint(0, 5, (123, 456)).astype(np.int32)
    out_img, out_seg = lsj_augment(r, img, seg, image_size=256)
    assert out_img.shape == (256, 256, 3)
    assert out_seg.shape == (256, 256)
    assert set(np.unique(out_seg)) <= set(range(5)) | {255}


def test_catalog(tmp_path):
    from rba_tpu.data import catalog

    catalog.register("toy_ds", lambda: [1, 2, 3], classes=["a"])
    assert catalog.get("toy_ds") == [1, 2, 3]
    assert catalog.metadata("toy_ds")["classes"] == ["a"]
    assert "toy_ds" in catalog.registered()
    catalog.register_standard_datasets(str(tmp_path))  # registers names only
    assert "cityscapes_fine_sem_seg_val" in catalog.registered()

def test_panoptic_lsj_mapper(rng):
    from rba_tpu.data.mappers import PanopticLSJDatasetMapper

    cfg = MapperConfig(max_instances=8, color_aug=False)
    m = PanopticLSJDatasetMapper(cfg, seed=0, image_size=128)
    img = (rng.rand(200, 300, 3) * 255).astype(np.uint8)
    pan = np.zeros((200, 300), np.int32)
    pan[:, :150] = 70001  # ids beyond uint8 must survive the resize
    pan[:, 150:] = 2002
    segs = [
        {"id": 70001, "category_id": 3},
        {"id": 2002, "category_id": 12},
        {"id": 2002, "category_id": 255},  # LSJ skips the ignore class
        {"id": 70001, "category_id": 5, "iscrowd": 1},  # crowd skipped
    ]
    out = m(img, pan, segs)
    assert out["images"].shape == (128, 128, 3)
    assert out["gt_masks"].shape == (8, 128, 128)
    n = int(out["gt_valid"].sum())
    assert set(out["gt_labels"][:n].tolist()) <= {3, 12} and 1 <= n <= 2
    # padded area (pan id 0) belongs to no target mask
    assert (out["gt_masks"][:n].sum(0) <= 1.0).all()

    # scale range is honored: with min=max=1.0 the long side fills the canvas
    m1 = PanopticLSJDatasetMapper(cfg, seed=1, image_size=128,
                                  min_scale=1.0, max_scale=1.0)
    out1 = m1(img, pan, segs[:2])
    assert out1["images"].shape == (128, 128, 3)
    n1 = int(out1["gt_valid"].sum())
    # aspect preserved: 200x300 -> 85x128, rows >=86 are padding
    assert out1["gt_masks"][:n1, 86:, :].sum() == 0


def test_panoptic_unseen_filter(rng):
    cfg = MapperConfig(min_sizes=(128,), crop_hw=(96, 128), max_instances=8,
                       color_aug=False)
    m = PanopticDatasetMapper(cfg, seed=0, unseen_label_set=[12])
    img = (rng.rand(200, 300, 3) * 255).astype(np.uint8)
    pan = np.zeros((200, 300), np.int32)
    pan[:, :150] = 1001
    pan[:, 150:] = 2002
    segs = [{"id": 1001, "category_id": 3}, {"id": 2002, "category_id": 12}]
    out = m(img, pan, segs)
    n = int(out["gt_valid"].sum())
    assert n == 1 and out["gt_labels"][0] == 3


def test_instance_lsj_mapper(rng):
    from rba_tpu.data.mappers import InstanceLSJDatasetMapper

    cfg = MapperConfig(max_instances=4, color_aug=False)
    m = InstanceLSJDatasetMapper(cfg, seed=3, image_size=128,
                                 min_scale=0.8, max_scale=1.2)
    img = (rng.rand(200, 300, 3) * 255).astype(np.uint8)
    masks = np.zeros((2, 200, 300), np.uint8)
    masks[0, 20:180, 20:280] = 1
    masks[1, 90:110, 140:160] = 1
    out = m(img, masks, np.array([4, 7]))
    assert out["images"].shape == (128, 128, 3)
    assert out["gt_masks"].shape == (4, 128, 128)
    n = int(out["gt_valid"].sum())
    assert n >= 1 and out["gt_labels"][0] in (4, 7)


def test_load_unseen_label_set(tmp_path):
    from rba_tpu.data.mappers import load_unseen_label_set

    p = tmp_path / "unknown.txt"
    p.write_text("car\nbanana\n7\n")
    ids = load_unseen_label_set(str(p), ["person", "car", "dog", "banana"])
    assert ids == [1, 3, 7]

import contextlib


@contextlib.contextmanager
def _catalog_snapshot():
    """Restore the ENTIRE catalog module state afterwards — tests that call
    register_standard_datasets(tmp_path) must not leave standard names
    pointed at a deleted tmp dir for later tests in the same process."""
    from rba_tpu.data import catalog

    saved = (dict(catalog._REGISTRY), dict(catalog._METADATA),
             set(catalog._STANDARD_OWNED), catalog._STANDARD_ROOT)
    try:
        yield catalog
    finally:
        catalog._REGISTRY.clear(); catalog._REGISTRY.update(saved[0])
        catalog._METADATA.clear(); catalog._METADATA.update(saved[1])
        catalog._STANDARD_OWNED.clear(); catalog._STANDARD_OWNED.update(saved[2])
        catalog._STANDARD_ROOT = saved[3]


def test_panoptic_reader_converts_category_ids(tmp_path):
    """Catalog panoptic factories convert raw JSON category ids to contiguous
    training ids (reference applies _convert_category_id at registration,
    register_coco_open_panoptic.py:110-121)."""
    import json
    import os

    from PIL import Image

    coco = tmp_path / "coco"
    for d in ("train2017", "panoptic_train2017", "annotations"):
        os.makedirs(coco / d)
    img = np.zeros((16, 16, 3), np.uint8)
    Image.fromarray(img).save(coco / "train2017" / "000000000000.jpg")
    pan_rgb = np.zeros((16, 16, 3), np.uint8)
    pan_rgb[:, :8] = (1, 0, 0)   # id 1
    pan_rgb[:, 8:] = (2, 0, 0)   # id 2
    Image.fromarray(pan_rgb).save(coco / "panoptic_train2017" / "000000000000.png")
    with open(coco / "annotations" / "panoptic_train2017.json", "w") as f:
        json.dump({
            "images": [{"id": 0, "file_name": "000000000000.jpg"}],
            "annotations": [{
                "image_id": 0, "file_name": "000000000000.png",
                "segments_info": [
                    {"id": 1, "category_id": 5, "iscrowd": 0},   # airplane (raw)
                    {"id": 2, "category_id": 2, "iscrowd": 0},   # bicycle: unknown
                ],
            }],
        }, f)

    with _catalog_snapshot() as catalog:
        catalog._REGISTRY.pop("coco_2017_train_panoptic_open", None)
        catalog._STANDARD_OWNED.discard("coco_2017_train_panoptic_open")
        catalog._STANDARD_ROOT = None
        catalog.register_standard_datasets(str(tmp_path))
        ds = catalog.get("coco_2017_train_panoptic_open")
        _, _, segments = ds[0]
    by_id = {s["id"]: s for s in segments}
    assert by_id[1]["category_id"] == 2 and by_id[1]["isthing"]  # airplane contiguous
    assert by_id[2]["category_id"] == 255  # unknown thing → sentinel

    # the 255-sentinel segment is excluded from supervision by BOTH panoptic
    # mappers (the open-world protocol: unknowns are never trained on)
    from rba_tpu.data.mappers import PanopticLSJDatasetMapper

    img = np.zeros((16, 16, 3), np.uint8)
    pan = np.zeros((16, 16), np.int32); pan[:, :8] = 1; pan[:, 8:] = 2
    for m in (
        PanopticDatasetMapper(
            MapperConfig(min_sizes=(16,), crop_hw=(16, 16), max_instances=4,
                         color_aug=False), seed=0),
        PanopticLSJDatasetMapper(
            MapperConfig(max_instances=4, color_aug=False), seed=0, image_size=16),
    ):
        out = m(img, pan, segments)
        n = int(out["gt_valid"].sum())
        assert n == 1 and out["gt_labels"][0] == 2, type(m).__name__


def test_register_standard_refresh_keeps_user_names(tmp_path):
    marker = object()
    name = "road_anomaly"
    with _catalog_snapshot() as catalog:
        catalog._REGISTRY.pop(name, None)
        catalog._METADATA.pop(name, None)
        catalog._STANDARD_OWNED.discard(name)
        catalog._STANDARD_ROOT = None
        catalog._REGISTRY[name] = lambda: marker
        catalog._METADATA[name] = {"mine": True}
        catalog.register_standard_datasets(str(tmp_path / "a"))
        catalog.register_standard_datasets(str(tmp_path / "b"))  # refresh
        assert catalog.get(name) is marker
        assert catalog.metadata(name) == {"mine": True}


def test_panoptic_mapper_color_aug(rng):
    """COLOR_AUG_SSD applies to the panoptic/instance mappers (the reference
    includes ColorAugSSDTransform in both aug lists)."""
    cfg = MapperConfig(min_sizes=(128,), crop_hw=(96, 128), max_instances=4,
                       color_aug=True)
    m = PanopticDatasetMapper(cfg, seed=0)
    img = (rng.rand(200, 300, 3) * 255).astype(np.uint8)
    pan = np.ones((200, 300), np.int32)
    out = m(img, pan, [{"id": 1, "category_id": 3}])
    assert np.isfinite(out["images"]).all() and out["images"].shape == (96, 128, 3)
    mi = InstanceDatasetMapper(cfg, seed=0)
    masks = np.ones((1, 200, 300), np.uint8)
    out = mi(img, masks, np.array([4]))
    assert np.isfinite(out["images"]).all()


def test_mapillary_panoptic_reader_and_mapper(tmp_path):
    """mapillary_vistas_panoptic_train resolves to a converted PanopticDataset
    (ids 1..65 → contiguous 0..64) whose tuples flow through the
    mask_former_panoptic mapper (reference register_mapillary_vistas_panoptic
    + MaskFormerPanopticDatasetMapper)."""
    import json
    import os

    from PIL import Image

    mapi = tmp_path / "mapillary_vistas" / "training"
    os.makedirs(mapi / "images")
    os.makedirs(mapi / "panoptic")
    img = np.zeros((32, 48, 3), np.uint8)
    Image.fromarray(img).save(mapi / "images" / "a.jpg")
    pan_rgb = np.zeros((32, 48, 3), np.uint8)
    pan_rgb[:, :24] = (9, 0, 0)
    Image.fromarray(pan_rgb).save(mapi / "panoptic" / "a.png")
    with open(mapi / "panoptic" / "panoptic_2018.json", "w") as f:
        json.dump({
            "images": [{"id": "a", "file_name": "a.jpg"}],
            "annotations": [{
                "image_id": "a", "file_name": "a.png",
                "segments_info": [{"id": 9, "category_id": 9, "iscrowd": 0}],
            }],
        }, f)

    name = "mapillary_vistas_panoptic_train"
    with _catalog_snapshot() as catalog:
        catalog._REGISTRY.pop(name, None)
        catalog._STANDARD_OWNED.discard(name)
        catalog._STANDARD_ROOT = None
        catalog.register_standard_datasets(str(tmp_path))
        ds = catalog.get(name)
        image, pan, segments = ds[0]
    assert segments[0]["category_id"] == 8  # dataset id 9 → contiguous 8
    assert segments[0]["isthing"]
    cfg = MapperConfig(min_sizes=(32,), max_size=64, crop_hw=(32, 48),
                       max_instances=4, color_aug=False)
    out = PanopticDatasetMapper(cfg, seed=0)(image, pan, segments)
    n = int(out["gt_valid"].sum())
    assert n == 1 and out["gt_labels"][0] == 8


def test_stuff_pq_split_not_structurally_zero(rng):
    """Stuff PQ must count stuff categories (regression: a things-only
    isthing map made pq_average(thing=False) skip every category)."""
    import jax

    from rba_tpu.config import tiny_test_config
    from rba_tpu.evalx.seg_evaluators import OpenPanopticEvaluator
    from rba_tpu.models.maskformer import maskformer_init

    cfg = tiny_test_config()
    params = maskformer_init(jax.random.PRNGKey(0), cfg)
    ev = OpenPanopticEvaluator(cfg, params, thing_ids=(6,), open_panoptic=False)
    # bypass the model: inject a perfect prediction pair directly
    pan = np.zeros((16, 16), np.int32)
    pan[:, :8] = 1
    segs = [{"id": 1, "category_id": 2, "isthing": False}]  # class 2 = stuff
    ev.pairs.append((pan, segs, pan.copy(), [dict(s) for s in segs]))
    res = ev.evaluate()
    assert res["Stuff"]["n"] == 1 and res["Stuff"]["pq"] == 1.0
    assert res["Things"]["n"] == 0
