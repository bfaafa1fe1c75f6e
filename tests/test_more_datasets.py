import os

import numpy as np
from PIL import Image

from rba_tpu.data.ood_datasets import (
    CityscapesC,
    CityscapesIncremental,
    CityscapesSemSeg,
    MapillarySemSeg,
    SmallObstacles,
)


def _png(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def test_small_obstacles(tmp_path, rng):
    root = str(tmp_path / "so")
    for seq in ("seq0",):
        for i in range(2):
            img = (rng.rand(24, 32, 3) * 255).astype(np.uint8)
            lab = np.zeros((24, 32, 3), np.uint8)
            lab[:, :16] = [128, 0, 0]  # road
            lab[:, 20:24] = [50, 90, 10]  # obstacle color
            _png(f"{root}/val/{seq}/image/{i}.png", img)
            _png(f"{root}/val/{seq}/labels/{i}.png", lab)
    ds = SmallObstacles(root, mode="val")
    assert len(ds) == 2
    s = ds[0]
    assert (s.label[:, :16] == 0).all()
    assert (s.label[:, 20:24] == 1).all()
    assert (s.label[0, 17] == 255)  # black void


def test_mapillary_taxonomy(tmp_path, rng):
    root = str(tmp_path / "mv")
    img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    lab = np.full((16, 16), 13, np.uint8)  # maps to road (0)
    lab[:4] = 65  # mapillary void
    _png(f"{root}/validation/images/a.jpg".replace("jpg", "png"), img)  # placeholder
    # store as jpg name but png content is fine for PIL by extension? use real jpg
    os.makedirs(f"{root}/validation/images", exist_ok=True)
    Image.fromarray(img).save(f"{root}/validation/images/a.jpg")
    _png(f"{root}/validation/labels/a.png", lab)
    ds = MapillarySemSeg(root)
    s = [x for x in ds if x.name == "a.jpg"][0]
    assert (s.label[8:] == 0).all()
    assert (s.label[:4] == 255).all()


def _mini_cityscapes(root, rng, distortion=None):
    img = (rng.rand(20, 20, 3) * 255).astype(np.uint8)
    lab = np.zeros((20, 20), np.uint8)
    lab[:, 10:] = 13  # car
    base = "aachen_000000_000019"
    if distortion:
        _png(f"{root}/leftImg8bit/val/aachen/{distortion}/1/{base}_leftImg8bit.png", img)
    else:
        _png(f"{root}/leftImg8bit/val/aachen/{base}_leftImg8bit.png", img)
    _png(f"{root}/gtFine/val/aachen/{base}_gtFine_labelTrainIds.png", lab)


def test_cityscapes_c(tmp_path, rng):
    root = str(tmp_path / "cs")
    _mini_cityscapes(root, rng, distortion="gaussian_noise")
    ds = CityscapesC(root, distortion="gaussian_noise", severity="1")
    assert len(ds) == 1
    s = ds[0]
    assert s.label.shape == (20, 20)


def test_cityscapes_incremental(tmp_path, rng):
    root = str(tmp_path / "cs2")
    _mini_cityscapes(root, rng)
    ds = CityscapesIncremental(root, holdout_classes=(13,))
    s = ds[0]
    assert (s.label[:, 10:] == 1).all()  # held-out class becomes anomaly
    assert (s.label[:, :10] == 0).all()
