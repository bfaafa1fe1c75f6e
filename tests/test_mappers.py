import numpy as np

from rba_tpu.data.mappers import (
    MapperConfig,
    SemanticCocoMixDatasetMapper,
    SemanticDatasetMapper,
    collate,
    extract_bbox,
    mix_object,
)


class FakeCoco:
    def __init__(self, rng):
        self.rng = rng

    def __len__(self):
        return 4

    def __getitem__(self, i):
        img = (self.rng.rand(40, 50, 3) * 255).astype(np.uint8)
        mask = np.zeros((40, 50), np.int32)
        mask[10:30, 15:35] = 254
        return img, mask


def _sample(rng, h=300, w=400, classes=(0, 1, 5)):
    img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    seg = np.zeros((h, w), np.int32)
    seg[:, w // 3 : 2 * w // 3] = classes[1]
    seg[:, 2 * w // 3 :] = classes[2]
    seg[:10] = 255
    return img, seg


def test_semantic_mapper_shapes(rng):
    cfg = MapperConfig(min_sizes=(256, 300), crop_hw=(128, 256), max_instances=8)
    m = SemanticDatasetMapper(cfg, seed=0)
    img, seg = _sample(rng)
    out = m(img, seg)
    assert out["images"].shape == (128, 256, 3)
    assert out["gt_masks"].shape == (8, 128, 256)
    assert out["gt_labels"].shape == (8,)
    n_valid = int(out["gt_valid"].sum())
    assert 1 <= n_valid <= 4
    # masks match labels
    for i in range(n_valid):
        cls = out["gt_labels"][i]
        np.testing.assert_array_equal(out["gt_masks"][i], (out["sem_seg"] == cls))


def test_mix_object_pastes_254(rng):
    import random

    img, seg = _sample(rng, 200, 200)
    coco = FakeCoco(rng)
    obj_img, obj_mask = coco[0]
    out_img, out_seg = mix_object(random.Random(0), img, seg, obj_img, obj_mask, 254)
    assert (out_seg == 254).sum() == (obj_mask == 254).sum()
    # pasted pixels come from the object image
    ys, xs = np.where(out_seg == 254)
    assert len(ys) > 0


def test_coco_mix_mapper_outlier_mask(rng):
    cfg = MapperConfig(min_sizes=(256,), crop_hw=(128, 256), max_instances=8, color_aug=False)
    m = SemanticCocoMixDatasetMapper(cfg, FakeCoco(rng), ood_prob=1.0, seed=0)
    img, seg = _sample(rng)
    out = m(img, seg)
    om = out["outlier_masks"]
    assert set(np.unique(om)) <= {0, 1, 255}
    # 254 never appears in supervised labels
    assert 254 not in out["gt_labels"][out["gt_valid"] > 0]
    # outlier mask marks ignore where sem_seg is ignore
    np.testing.assert_array_equal(om == 255, out["sem_seg"] == 255)


def test_extract_bbox():
    m = np.zeros((10, 12), bool)
    m[2:5, 3:8] = True
    assert extract_bbox(m) == (2, 3, 5, 8)
    assert extract_bbox(np.zeros((4, 4), bool)) == (0, 0, 0, 0)


def test_collate(rng):
    cfg = MapperConfig(min_sizes=(256,), crop_hw=(128, 256), max_instances=8, color_aug=False)
    m = SemanticDatasetMapper(cfg, seed=0)
    samples = [m(*_sample(rng)) for _ in range(3)]
    batch = collate(samples)
    assert batch["images"].shape == (3, 128, 256, 3)
    assert batch["gt_masks"].shape == (3, 8, 128, 256)
