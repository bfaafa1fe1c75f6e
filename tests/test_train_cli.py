"""End-to-end train CLI integration: config file -> dataset -> prefetching
dataloader -> pjit train loop -> metrics.jsonl + orbax checkpoint (reference
train_net.py main/Trainer).  This drives ``train_net.main`` exactly as a user
would, on a synthetic on-disk Cityscapes tree."""
import dataclasses
import json
import os

import numpy as np
from PIL import Image

from rba_tpu.config import InputConfig, tiny_test_config


def _make_cityscapes_tree(root: str, n: int = 10, hw=(48, 80), num_classes: int = 7):
    for split, count in (("train", n), ("val", 2)):
        img_dir = os.path.join(root, "leftImg8bit", split, "cityA")
        gt_dir = os.path.join(root, "gtFine", split, "cityA")
        os.makedirs(img_dir)
        os.makedirs(gt_dir)
        rng = np.random.RandomState(0 if split == "train" else 1)
        for i in range(count):
            img = rng.randint(0, 255, (hw[0], hw[1], 3), np.uint8)
            lab = rng.randint(0, num_classes, hw, np.uint8)
            Image.fromarray(img).save(os.path.join(img_dir, f"s{i}_leftImg8bit.png"))
            Image.fromarray(lab).save(
                os.path.join(gt_dir, f"s{i}_gtFine_labelTrainIds.png")
            )


def test_train_cli_end_to_end(tmp_path):
    from rba_tpu.tools.selfcheck import write_d2_config
    from rba_tpu.train.train_net import main

    data_root = tmp_path / "cityscapes"
    _make_cityscapes_tree(str(data_root))

    # a tiny config with train INPUT geometry sized to the synthetic images
    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg,
        input=dataclasses.replace(
            cfg.input,
            min_size_train=(32,),
            max_size_train=128,
            crop_size=(32, 64),
            color_aug_ssd=False,
        ),
    )
    cfg_path = tmp_path / "config.yaml"
    write_d2_config(cfg, str(cfg_path))

    out_dir = tmp_path / "out"
    main([
        "--config-file", str(cfg_path),
        "--data-root", str(data_root),
        "--output-dir", str(out_dir),
        "--max-iter", "2",
        "--batch-size", "8",
        "--log-period", "1",
        "--checkpoint-period", "2",
        "--workers", "2",
        "--seed", "3",
        "--eval-period", "2",
        "--eval-max-images", "2",
    ])

    # metrics.jsonl has one train entry per step with finite losses, plus an
    # in-train val-eval entry at step 2 (TEST.EVAL_PERIOD analogue)
    lines = [json.loads(l) for l in open(out_dir / "metrics.jsonl")]
    train_lines = [m for m in lines if "total" in m]
    eval_lines = [m for m in lines if "mIoU" in m]
    assert [m["step"] for m in train_lines] == [1, 2]
    assert all(np.isfinite(m["total"]) for m in train_lines)
    assert [m["step"] for m in eval_lines] == [2]
    assert 0.0 <= eval_lines[0]["pACC"] <= 1.0 and eval_lines[0]["eval_images"] == 2

    # the checkpoint landed and resume continues from it
    from rba_tpu.convert.checkpoint import latest_step

    assert latest_step(str(out_dir / "checkpoints")) == 2

    main([
        "--config-file", str(cfg_path),
        "--data-root", str(data_root),
        "--output-dir", str(out_dir),
        "--max-iter", "3",
        "--batch-size", "8",
        "--log-period", "1",
        "--checkpoint-period", "10",
        "--workers", "2",
        "--seed", "3",
        "--resume",
        "--eval-period", "0",
    ])
    lines = [json.loads(l) for l in open(out_dir / "metrics.jsonl")]
    steps = [m["step"] for m in lines if "total" in m]
    assert steps == [1, 2, 3]  # resumed at step 3

    # --eval-only evaluates from the latest checkpoint and exits
    res = main([
        "--config-file", str(cfg_path),
        "--data-root", str(data_root),
        "--output-dir", str(out_dir),
        "--eval-only",
        "--eval-max-images", "2",
    ])
    assert res["step"] == 3 and "mIoU" in res and res["eval_images"] == 2

    # TEST.AUG.ENABLED adds a TTA pass to --eval-only (reference
    # Trainer.test_with_TTA)
    cfg_tta = dataclasses.replace(
        cfg,
        test=dataclasses.replace(
            cfg.test, aug_enabled=True, aug_min_sizes=(32, 48), aug_max_size=96
        ),
    )
    cfg_tta_path = tmp_path / "config_tta.yaml"
    write_d2_config(cfg_tta, str(cfg_tta_path))
    res = main([
        "--config-file", str(cfg_tta_path),
        "--data-root", str(data_root),
        "--output-dir", str(out_dir),
        "--eval-only",
        "--eval-max-images", "1",
    ])
    assert "mIoU_TTA" in res and np.isfinite(res["mIoU_TTA"])


# ---------------------------------------------------------------------------
# DATASETS.TRAIN / DATASETS.TEST catalog resolution (reference resolves these
# through D2's DatasetCatalog; the map_coco recipes train on TWO datasets,
# ckpts/swin_b_1dl_rba_ood_map_coco/config.yaml:13-17)
# ---------------------------------------------------------------------------

def _make_mapillary_tree(root: str, n: int = 6, hw=(48, 80), split: str = "training"):
    from rba_tpu.data.taxonomies import mapillary_to_cityscapes_lut

    lut = mapillary_to_cityscapes_lut()
    valid_ids = np.where(lut[:66] != 255)[0]
    img_dir = os.path.join(root, split, "images")
    lab_dir = os.path.join(root, split, "labels")
    os.makedirs(img_dir)
    os.makedirs(lab_dir)
    rng = np.random.RandomState(7)
    for i in range(n):
        img = rng.randint(0, 255, (hw[0], hw[1], 3), np.uint8)
        lab = rng.choice(valid_ids, hw).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(img_dir, f"m{i}.jpg"))
        Image.fromarray(lab).save(os.path.join(lab_dir, f"m{i}.png"))


def test_datasets_train_ingested_from_reference_yaml():
    from rba_tpu.config import load_d2_config

    path = "/root/reference/ckpts/swin_b_1dl_rba_ood_map_coco/config.yaml"
    if not os.path.exists(path):
        import pytest

        pytest.skip("reference snapshot not available")
    cfg = load_d2_config(path)
    assert cfg.datasets_train == (
        "mapillary_cityscapes_sem_seg_train",
        "cityscapes_fine_sem_seg_train",
    )
    assert cfg.datasets_test == ("mapillary_cityscapes_sem_seg_val",)


def test_data_iterator_trains_on_datasets_train_union(tmp_path):
    import argparse

    from rba_tpu.train.train_net import _resolve_dataset, data_iterator

    datasets = tmp_path / "datasets"
    data_root = datasets / "cityscapes"
    _make_cityscapes_tree(str(data_root))
    _make_mapillary_tree(str(datasets / "mapillary_vistas"), n=6)
    _make_mapillary_tree(str(datasets / "mapillary_vistas"), n=2, split="validation")

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg,
        datasets_train=(
            "mapillary_cityscapes_sem_seg_train",
            "cityscapes_fine_sem_seg_train",
            "not_a_registered_dataset",  # skipped with a warning
        ),
        datasets_test=("mapillary_cityscapes_sem_seg_val",),
        input=dataclasses.replace(
            cfg.input,
            min_size_train=(32,),
            max_size_train=128,
            crop_size=(32, 64),
            color_aug_ssd=False,
        ),
    )
    args = argparse.Namespace(
        data_root=str(data_root), coco_root=None, mapper=None, seed=0, workers=1
    )

    # the mapillary reader resolves via the catalog rooted at the PARENT of
    # --data-root and applies the 66->19 cityscapes-taxonomy LUT
    mapi = _resolve_dataset("mapillary_cityscapes_sem_seg_train", str(data_root))
    assert len(mapi) == 6
    s = mapi[0]
    assert set(np.unique(s.label)) <= (set(range(19)) | {255})

    # the validation split resolves too (run_val_eval's DATASETS.TEST path)
    val = _resolve_dataset("mapillary_cityscapes_sem_seg_val", str(data_root))
    assert len(val) == 2

    it = data_iterator(cfg, args, batch_size=4)
    batch = next(it)
    assert batch["images"].shape == (4, 32, 64, 3)
    assert batch["gt_masks"].shape[:2] == (4, batch["gt_labels"].shape[1])
    assert set(np.unique(batch["sem_seg"])) <= (set(range(19)) | {255})


def test_concat_dataset_indexing():
    from rba_tpu.data.ood_datasets import ConcatDataset, SyntheticAnomaly

    a = SyntheticAnomaly(n=3, hw=(16, 24), seed=0)
    b = SyntheticAnomaly(n=2, hw=(16, 24), seed=1)
    ds = ConcatDataset([a, b])
    assert len(ds) == 5
    assert np.array_equal(ds[0].image, a[0].image)
    assert np.array_equal(ds[2].image, a[2].image)
    assert np.array_equal(ds[3].image, b[0].image)
    assert np.array_equal(ds[4].image, b[1].image)

def _make_coco_panoptic_tree(coco_root: str, n: int = 10, hw=(64, 96),
                             split: str = "train"):
    """Synthetic COCO-panoptic layout: images, RGB id-map PNGs, JSON."""
    img_dir = os.path.join(coco_root, f"{split}2017")
    pan_dir = os.path.join(coco_root, f"panoptic_{split}2017")
    ann_dir = os.path.join(coco_root, "annotations")
    for d in (img_dir, pan_dir, ann_dir):
        os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(5)
    images, annotations = [], []
    for i in range(n):
        img = rng.randint(0, 255, (hw[0], hw[1], 3), np.uint8)
        Image.fromarray(img).save(os.path.join(img_dir, f"{i:012d}.jpg"))
        # two segments: left id=1 (cat 2), right id=300 (cat 5, tests the
        # 256-carry in the RGB encoding)
        pan_rgb = np.zeros((hw[0], hw[1], 3), np.uint8)
        pan_rgb[:, : hw[1] // 2] = (1, 0, 0)
        pan_rgb[:, hw[1] // 2 :] = (44, 1, 0)  # 44 + 256 = 300
        Image.fromarray(pan_rgb).save(os.path.join(pan_dir, f"{i:012d}.png"))
        images.append({"id": i, "file_name": f"{i:012d}.jpg"})
        annotations.append({
            "image_id": i,
            "file_name": f"{i:012d}.png",
            "segments_info": [
                {"id": 1, "category_id": 2, "iscrowd": 0},
                {"id": 300, "category_id": 5, "iscrowd": 0},
            ],
        })
    with open(os.path.join(ann_dir, f"panoptic_{split}2017.json"), "w") as f:
        json.dump({"images": images, "annotations": annotations}, f)


def test_train_cli_coco_panoptic_lsj(tmp_path):
    """coco_panoptic_lsj end-to-end: DATASETS.TRAIN=coco_2017_train_panoptic_open
    resolved through the catalog, PanopticDataset tuples through the
    prefetcher into the pjit step (reference train_net.py:200-203 +
    Base-COCO-OpenPanopticSegmentation.yaml)."""
    from rba_tpu.tools.selfcheck import write_d2_config
    from rba_tpu.train.train_net import main

    datasets = tmp_path / "datasets"
    data_root = datasets / "cityscapes"  # empty; --data-root anchor only
    os.makedirs(data_root)
    _make_coco_panoptic_tree(str(datasets / "coco"))

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg,
        datasets_train=("coco_2017_train_panoptic_open",),
        datasets_test=("coco_2017_val_panoptic_open",),
        input=dataclasses.replace(
            cfg.input,
            dataset_mapper_name="coco_panoptic_lsj",
            image_size=64,
            min_scale=0.8,
            max_scale=1.2,
        ),
        # the shipped open-panoptic recipe evaluates PQ only
        # (SEMANTIC_ON/INSTANCE_ON False, PANOPTIC_ON True)
        test=dataclasses.replace(
            cfg.test, panoptic_on=True, semantic_on=False, instance_on=False
        ),
    )
    cfg_path = tmp_path / "config.yaml"
    write_d2_config(cfg, str(cfg_path))

    out_dir = tmp_path / "out"
    main([
        "--config-file", str(cfg_path),
        "--data-root", str(data_root),
        "--output-dir", str(out_dir),
        "--max-iter", "2",
        "--batch-size", "4",
        "--log-period", "1",
        "--checkpoint-period", "0",
        "--workers", "2",
        "--seed", "3",
        "--eval-period", "0",
    ])
    lines = [json.loads(l) for l in open(out_dir / "metrics.jsonl")]
    train_lines = [m for m in lines if "total" in m]
    assert [m["step"] for m in train_lines] == [1, 2]
    assert all(np.isfinite(m["total"]) for m in train_lines)

    # --eval-only routes the panoptic DATASETS.TEST split to the PQ
    # evaluator (reference Trainer.build_evaluator by evaluator_type)
    _make_coco_panoptic_tree(str(datasets / "coco"), n=2, split="val")
    res = main([
        "--config-file", str(cfg_path),
        "--data-root", str(data_root),
        "--output-dir", str(out_dir),
        "--eval-only",
        "--eval-max-images", "1",
    ])
    assert res["eval_images"] == 1 and "All_pq" in res
    assert 0.0 <= res["All_pq"] <= 1.0


def test_data_iterator_instance_lsj_from_panoptic(tmp_path):
    """coco_instance_lsj data path: panoptic gt → InstanceFromPanoptic thing
    segments → LSJ mapper batches (no jit; loader-level check)."""
    import argparse

    from rba_tpu.train.train_net import data_iterator

    datasets = tmp_path / "datasets"
    data_root = datasets / "cityscapes"
    os.makedirs(data_root)
    _make_coco_panoptic_tree(str(datasets / "coco"))

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg,
        datasets_train=("coco_2017_train_panoptic_open",),
        input=dataclasses.replace(
            cfg.input,
            dataset_mapper_name="coco_instance_lsj",
            image_size=64,
            min_scale=1.0,
            max_scale=1.0,
        ),
    )
    args = argparse.Namespace(
        data_root=str(data_root), coco_root=None, mapper=None, seed=0, workers=1
    )
    it = data_iterator(cfg, args, batch_size=4)
    batch = next(it)
    assert batch["images"].shape == (4, 64, 64, 3)
    assert batch["gt_masks"].shape[0] == 4
    # both synthetic segments are thing classes (COCO contiguous 2 and 5)
    n = batch["gt_valid"].sum(axis=1)
    assert (n >= 1).all()
    assert set(np.unique(batch["gt_labels"][batch["gt_valid"] > 0])) <= {2, 5}


def test_unseen_label_set_resolution(tmp_path):
    """DATASETS.UNSEEN_LABEL_SET 'datasets/...'-prefixed paths resolve
    against the datasets dir (the reference's CWD-relative convention where
    datasets/ IS the datasets dir); names resolve to thing_classes indices
    of DATASETS.TRAIN[0] (open_coco_mapper.py:107-126)."""
    import argparse

    from rba_tpu.train.train_net import _unseen_label_set

    datasets = tmp_path / "datasets"
    data_root = datasets / "cityscapes"
    os.makedirs(data_root)
    unknown = datasets / "unknown"
    os.makedirs(unknown)
    # 'person' resolves to thing index 0; 'car' is an unknown class, absent
    # from the open thing_classes -> skipped with a warning, not a crash
    (unknown / "unknown_K20.txt").write_text("person\ncar\n")

    cfg = dataclasses.replace(
        tiny_test_config(),
        datasets_train=("coco_2017_train_panoptic_open",),
        unseen_label_set="datasets/unknown/unknown_K20.txt",
    )
    args = argparse.Namespace(data_root=str(data_root))
    assert _unseen_label_set(cfg, args) == [0]

    # empty path disables; missing file warns and disables
    cfg2 = dataclasses.replace(cfg, unseen_label_set="")
    assert _unseen_label_set(cfg2, args) is None
    cfg3 = dataclasses.replace(cfg, unseen_label_set="nope/missing.txt")
    assert _unseen_label_set(cfg3, args) is None


def test_panoptic_val_eval_with_instance_on(tmp_path):
    """TEST.INSTANCE_ON adds mask-AP rows to the panoptic val eval
    (reference build_evaluator appends COCOEvaluator for coco_panoptic_seg
    when instance_on, train_net.py:103-131)."""
    import jax

    from rba_tpu.models.maskformer import maskformer_init
    from rba_tpu.train.train_net import run_val_eval

    datasets = tmp_path / "datasets"
    data_root = datasets / "cityscapes"
    os.makedirs(data_root)
    _make_coco_panoptic_tree(str(datasets / "coco"), n=2, split="val")

    cfg = dataclasses.replace(
        tiny_test_config(),
        datasets_test=("coco_2017_val_panoptic_open",),
        test=dataclasses.replace(
            tiny_test_config().test,
            panoptic_on=True, instance_on=True, semantic_on=True,
        ),
    )
    params = maskformer_init(jax.random.PRNGKey(0), cfg)
    res = run_val_eval(cfg, params, str(data_root), max_images=1)
    assert "All_pq" in res and "instance_AP" in res and "mIoU" in res
    assert np.isfinite(res["instance_AP"]) and res["eval_images"] == 1

    # PANOPTIC_ON False suppresses PQ (reference gates the panoptic
    # evaluator on the TEST flag, train_net.py:108-117)
    cfg2 = dataclasses.replace(
        cfg, test=dataclasses.replace(cfg.test, panoptic_on=False, instance_on=False)
    )
    res2 = run_val_eval(cfg2, params, str(data_root), max_images=1)
    assert "All_pq" not in res2 and "mIoU" in res2
