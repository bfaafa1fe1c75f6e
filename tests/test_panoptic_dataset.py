import json
import os

import numpy as np
from PIL import Image

from rba_tpu.data.ood_datasets import PanopticDataset


def test_panoptic_dataset_reader(tmp_path, rng):
    img_root = tmp_path / "images"
    pan_root = tmp_path / "panoptic"
    os.makedirs(img_root)
    os.makedirs(pan_root)
    Image.fromarray((rng.rand(16, 16, 3) * 255).astype(np.uint8)).save(img_root / "a.jpg")
    pan = np.zeros((16, 16, 3), np.uint8)
    pan[:, :8] = [3, 0, 0]
    pan[:, 8:] = [0, 1, 0]  # id 256
    Image.fromarray(pan).save(pan_root / "a.png")
    meta = {
        "images": [{"id": 1, "file_name": "a.jpg"}],
        "annotations": [{
            "image_id": 1,
            "file_name": "a.png",
            "segments_info": [
                {"id": 3, "category_id": 0},
                {"id": 256, "category_id": 5},
            ],
        }],
    }
    with open(tmp_path / "pan.json", "w") as f:
        json.dump(meta, f)

    ds = PanopticDataset(str(img_root), str(pan_root), str(tmp_path / "pan.json"))
    assert len(ds) == 1
    image, pan_ids, segs = ds[0]
    assert image.shape == (16, 16, 3)
    assert (pan_ids[:, :8] == 3).all()
    assert (pan_ids[:, 8:] == 256).all()
    assert len(segs) == 2
