"""Catalog completeness + void/StreetHazards mapper behavior (reference
registration modules in mask2former/data/datasets/ and the void /
street-hazards dataset mappers)."""
import numpy as np
import pytest

from rba_tpu.data import catalog
from rba_tpu.data.catalog import (
    coco_panoptic_metadata,
    coco_stuff_10k_metadata,
    mapillary_metadata,
    register_standard_datasets,
)
from rba_tpu.data.mappers import (
    MapperConfig,
    SemanticVoidDatasetMapper,
    StreetHazardsCocoMixMapper,
    StreetHazardsMapper,
    cityscapes_void_lut,
    street_hazards_shift,
)

# every name the reference's registration modules provide
REFERENCE_NAMES = [
    "cityscapes_fine_sem_seg_train", "cityscapes_fine_sem_seg_val",
    "cityscapes_fine_sem_seg_test", "cityscapes_coco_sem_seg_mix",
    "cityscapes_fine_instance_seg_train", "cityscapes_fine_instance_seg_val",
    "mapillary_vistas_sem_seg_train", "mapillary_vistas_sem_seg_val",
    "mapillary_vistas_panoptic_train", "mapillary_vistas_panoptic_val",
    "mapillary_cityscapes_sem_seg_train", "mapillary_cityscapes_sem_seg_val",
    "coco_2017_train_panoptic", "coco_2017_val_panoptic",
    "coco_2017_train_panoptic_with_sem_seg", "coco_2017_val_panoptic_with_sem_seg",
    "coco_2017_train_panoptic_open", "coco_2017_val_panoptic_open",
    "coco_2017_train_stuff_10k_sem_seg", "coco_2017_test_stuff_10k_sem_seg",
    "street_hazards_sem_seg_train", "street_hazards_sem_seg_val",
]


def test_all_reference_names_registered(tmp_path):
    register_standard_datasets(str(tmp_path))
    names = catalog.registered()
    missing = [n for n in REFERENCE_NAMES if n not in names]
    assert not missing, missing


def test_coco_panoptic_metadata_shape():
    m = coco_panoptic_metadata()
    assert len(m["stuff_classes"]) == 133
    assert len(m["thing_classes"]) == 80
    assert m["thing_dataset_id_to_contiguous_id"][1] == 0  # person
    assert m["stuff_classes"][0] == "person"
    assert m["label_divisor"] == 1000
    # merged panoptic stuff present with standard ids
    assert "tree-merged" in m["stuff_classes"]
    assert m["stuff_dataset_id_to_contiguous_id"][200] == m["stuff_classes"].index(
        "wall-other-merged"
    )


def test_open_panoptic_drops_unknown_things():
    """Open-variant id maps follow register_coco_open_panoptic.py:77-94: a
    RUNNING contiguous index over kept classes (0..116) with unknown thing
    ids mapped to the 255 sentinel in the thing map (and absent from the
    stuff map)."""
    m = coco_panoptic_metadata(open_panoptic=True)
    assert len(m["thing_classes"]) == 80 - 16
    assert "car" not in m["thing_classes"]  # an unknown class
    assert "person" in m["thing_classes"]
    assert len(m["stuff_classes"]) == 133  # semantic view keeps everything
    tm, sm = m["thing_dataset_id_to_contiguous_id"], m["stuff_dataset_id_to_contiguous_id"]
    assert tm[3] == 255 and tm[2] == 255  # car / bicycle → unknown sentinel
    assert 3 not in sm
    assert tm[1] == 0 and tm[4] == 1 and tm[5] == 2  # person, motorcycle, airplane
    known = sorted(v for v in list(tm.values()) + list(sm.values()) if v != 255)
    assert known == list(range(133 - 16))  # contiguous 0..116, no gaps


def test_stuff_10k_metadata():
    m = coco_stuff_10k_metadata()
    assert len(m["stuff_classes"]) == 171
    assert m["stuff_dataset_id_to_contiguous_id"][1] == 0


def test_mapillary_full_meta():
    m = mapillary_metadata()
    assert len(m["stuff_classes"]) == 65  # 66 minus void--unlabeled
    assert m["ignore_label"] == 65
    assert m["stuff_classes"][0] == "Bird"


def test_void_lut_matches_reference_table():
    """The void mapper's Cityscapes table
    (mask_former_semantic_void_dataset_mapper.py:23-59): eval classes keep
    train ids, ambiguous void → 254, true void → 255."""
    lut = cityscapes_void_lut()
    assert lut[7] == 0 and lut[8] == 1 and lut[33] == 18  # road/sidewalk/bicycle
    for i in (4, 5, 6, 9, 10, 14, 15, 16, 18, 29, 30):
        assert lut[i] == 254, i
    for i in (0, 1, 2, 3, 34, 255):
        assert lut[i] == 255, i


def test_void_mapper_emits_outlier_masks(rng):
    cfg = MapperConfig(min_sizes=(128,), crop_hw=(96, 128), color_aug=False, flip=False)
    mapper = SemanticVoidDatasetMapper(cfg, seed=0)
    image = (rng.rand(128, 160, 3) * 255).astype(np.uint8)
    label_ids = rng.choice([0, 5, 7, 8, 26, 14], size=(128, 160)).astype(np.int32)
    out = mapper(image, label_ids)
    assert set(np.unique(out["outlier_masks"])) <= {0, 1, 255}
    # ambiguous void (ids 5, 14) became OOD supervision
    assert (out["outlier_masks"] == 1).any()
    # true void (id 0) became ignore
    assert (out["outlier_masks"] == 255).any()
    # targets exclude 254/255
    assert out["gt_labels"][out["gt_valid"] > 0].max(initial=0) < 19


def test_street_hazards_shift_matches_reference_arithmetic():
    """sem_seg -= 1; sem_seg[sem_seg == 3] = 13; sem_seg[sem_seg >= 3] -= 1
    (reference ..._street_hazards_mapper.py:141-143) — note the relocated
    class is caught by the >= 3 decrement and lands on 12."""
    x = np.arange(1, 15, dtype=np.int32)  # raw labels 1..14
    got = street_hazards_shift(x)
    t = x.astype(np.int64) - 1
    t[t == 3] = 13
    t[t >= 3] = t[t >= 3] - 1
    np.testing.assert_array_equal(got, t)
    assert got[3] == 12  # raw 4 -> relocated to the ignore id
    assert got.max() == 12 and got.min() == 0


def test_street_hazards_mapper(rng):
    cfg = MapperConfig(min_sizes=(128,), crop_hw=(96, 128), color_aug=False, flip=False)
    mapper = StreetHazardsMapper(cfg, seed=0)
    image = (rng.rand(128, 160, 3) * 255).astype(np.uint8)
    label = rng.randint(1, 15, (128, 160)).astype(np.int32)
    out = mapper(image, label)
    assert mapper.cfg.ignore_label == 12
    valid_labels = out["gt_labels"][out["gt_valid"] > 0]
    assert valid_labels.max(initial=0) <= 11  # 12 is ignored


def test_street_hazards_coco_mix_mapper(rng):
    cfg = MapperConfig(min_sizes=(128,), crop_hw=(96, 128), color_aug=False, flip=False)

    class FakeCoco:
        def __len__(self):
            return 1

        def __getitem__(self, i):
            img = (np.random.RandomState(1).rand(40, 40, 3) * 255).astype(np.uint8)
            mask = np.full((40, 40), 254, np.int32)
            return img, mask

    mapper = StreetHazardsCocoMixMapper(cfg, FakeCoco(), ood_prob=1.0, seed=0)
    image = (rng.rand(128, 160, 3) * 255).astype(np.uint8)
    label = rng.randint(1, 15, (128, 160)).astype(np.int32)
    out = mapper(image, label)
    assert "outlier_masks" in out
    assert (out["outlier_masks"] == 1).any()  # the pasted object
