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
