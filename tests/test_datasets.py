import json
import os

import numpy as np
import pytest

from PIL import Image

from rba_tpu.data.ood_datasets import (
    FishyscapesLAF,
    RoadAnomaly,
    RoadAnomaly21,
    SyntheticAnomaly,
    get_datasets,
)


def test_synthetic_dataset():
    ds = SyntheticAnomaly(n=3, hw=(64, 96))
    assert len(ds) == 3
    s = ds[0]
    assert s.image.shape == (64, 96, 3) and s.image.dtype == np.uint8
    assert s.label.shape == (64, 96)
    assert set(np.unique(s.label)) <= {0, 1, 255}


def _write_png(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def test_road_anomaly_layout(tmp_path, rng):
    root = str(tmp_path / "RoadAnomaly_jpg")
    frames = ["img_a.jpg", "img_b.jpg"]
    os.makedirs(os.path.join(root, "frames"), exist_ok=True)
    with open(os.path.join(root, "frame_list.json"), "w") as f:
        json.dump(frames, f)
    for fname in frames:
        img = (rng.rand(20, 30, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(root, "frames", fname), quality=95)
        # label 2 should remap to 1
        lab = np.zeros((20, 30), np.uint8)
        lab[5:10, 5:10] = 2
        _write_png(os.path.join(root, "frames", fname[:-4] + ".labels", "labels_semantic.png"), lab)

    ds = RoadAnomaly(root)
    assert len(ds) == 2
    s = ds[0]
    assert s.image.shape == (20, 30, 3)
    assert set(np.unique(s.label)) == {0, 1}  # 2 remapped to 1


def test_fishyscapes_laf_pairing(tmp_path, rng):
    root = str(tmp_path / "Fishyscapes")
    lbl_name = "0000_city_000000_000019_leftImg8bit.png"  # label file
    img_name = lbl_name[5:-10] + "leftImg8bit.png"
    _write_png(os.path.join(root, "fishyscapes_lostandfound", lbl_name),
               np.zeros((16, 16), np.uint8))
    _write_png(os.path.join(root, "laf_images", img_name),
               (rng.rand(16, 16, 3) * 255).astype(np.uint8))
    ds = FishyscapesLAF(root)
    assert len(ds) == 1
    s = ds[0]
    assert s.image.shape == (16, 16, 3)


def test_smiyc_val_filter_and_resize(tmp_path, rng):
    root = str(tmp_path / "dataset_AnomalyTrack")
    _write_png(os.path.join(root, "images", "validation_0000.jpg".replace("jpg", "png"))
               if False else os.path.join(root, "images", "validation_0000.jpg"),
               (rng.rand(32, 48, 3) * 255).astype(np.uint8))
    _write_png(os.path.join(root, "images", "test_0001.jpg"),
               (rng.rand(32, 48, 3) * 255).astype(np.uint8))
    _write_png(os.path.join(root, "labels_masks", "validation_0000_labels_semantic.png"),
               np.ones((32, 48), np.uint8))
    ds = RoadAnomaly21(root, mode="val", resize_to=(24, 36))
    assert len(ds) == 1  # test file excluded in val mode
    s = ds[0]
    assert s.image.shape == (24, 36, 3)
    assert s.label.shape == (24, 36)


def test_get_datasets_skips_missing(tmp_path):
    out = get_datasets(str(tmp_path))
    assert out == {}  # nothing present, nothing crashes
