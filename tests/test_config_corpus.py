"""Config-corpus ingestion: every reference YAML (35 under configs/, 5 frozen
ckpt snapshots) parses through load_d2_config with _BASE_ inheritance, and
derived model dims match the reference's settings for a spot-checked sample
(reference config pipeline: train_net.py:352-366)."""
import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rba_tpu.config import load_d2_config, load_yaml_with_base

REF = "/root/reference"
ALL_YAMLS = sorted(
    glob.glob(f"{REF}/configs/**/*.yaml", recursive=True)
    + glob.glob(f"{REF}/ckpts/*/config.yaml")
)


def test_corpus_is_complete():
    assert len(ALL_YAMLS) >= 40  # 35 configs + 5 ckpt snapshots


@pytest.mark.parametrize("path", ALL_YAMLS, ids=lambda p: os.path.relpath(p, REF))
def test_config_parses(path):
    cfg = load_d2_config(path)
    assert cfg.num_classes > 0
    assert cfg.decoder.hidden_dim > 0
    assert len(cfg.pixel_decoder.transformer_in_features) >= 1
    # base-yaml MIN_SIZE_TRAIN eval-tag parsed (not part of RbAConfig, but the
    # raw merge must not choke on it)
    raw = load_yaml_with_base(path)
    if "INPUT" in raw and "MIN_SIZE_TRAIN" in raw["INPUT"]:
        mst = raw["INPUT"]["MIN_SIZE_TRAIN"]
        assert isinstance(mst, (list, tuple)) and len(mst) > 0
    # DATASETS.TRAIN/TEST resolve to clean catalog names regardless of the
    # serialization (tuple-repr string in training configs, YAML list in
    # frozen ckpt configs) — never a leaked "('name',)" literal
    for name in cfg.datasets_train + cfg.datasets_test:
        assert name.replace("_", "").isalnum(), name


def test_base_inheritance_values():
    """Child overrides + base fallthrough across a 2-level _BASE_ chain."""
    p = (f"{REF}/configs/cityscapes/semantic-segmentation/swin/"
         "single_decoder_layer/maskformer2_swin_base_IN21k_384_bs16_90k_1dl.yaml")
    cfg = load_d2_config(p)
    assert cfg.backbone_name == "swin"
    assert cfg.swin.embed_dim == 128 and cfg.swin.window_size == 12
    assert cfg.decoder.dec_layers == 1  # DEC_LAYERS 2 - 1
    assert cfg.pixel_decoder.transformer_in_features == ("res5",)  # child
    assert cfg.pixel_decoder.transformer_enc_layers == 6  # mid-level base
    assert cfg.solver.max_iter == 90000  # root base
    assert cfg.num_classes == 19

    # the mid-level R50 base itself: 3 deformable levels, 9 decoder layers
    cfg_r50 = load_d2_config(
        f"{REF}/configs/cityscapes/semantic-segmentation/maskformer2_R50_bs16_90k.yaml"
    )
    assert cfg_r50.backbone_name == "resnet" and cfg_r50.resnet.depth == 50
    assert cfg_r50.pixel_decoder.transformer_in_features == ("res3", "res4", "res5")
    assert cfg_r50.decoder.dec_layers == 9
    assert not cfg_r50.resnet.stride_in_1x1


def test_input_train_fields_ingested():
    """Train-time INPUT fields reach the mapper config: Mapillary trains at
    crop (1024, 1024) on a 2048-derived min-size ladder with
    SIZE_DIVISIBILITY 1024, vs Cityscapes (512, 1024) / 1024 ladder / -1
    (reference Base-*-SemanticSegmentation.yaml:37-50)."""
    city = load_d2_config(
        f"{REF}/configs/cityscapes/semantic-segmentation/maskformer2_R50_bs16_90k.yaml"
    )
    assert city.input.crop_size == (512, 1024)
    assert city.input.min_size_train == tuple(int(x * 0.1 * 1024) for x in range(5, 21))
    assert city.input.max_size_train == 4096
    assert city.input.train_size_divisibility == -1
    assert city.input.color_aug_ssd and city.input.crop_enabled
    assert city.input.dataset_mapper_name == "mask_former_semantic"

    mapi = load_d2_config(
        f"{REF}/configs/mapillary-vistas/semantic-segmentation/maskformer2_R50_bs16_300k.yaml"
    )
    assert mapi.input.crop_size == (1024, 1024)
    assert mapi.input.min_size_train == tuple(int(x * 0.1 * 2048) for x in range(5, 21))
    assert mapi.input.max_size_train == 8192
    assert mapi.input.train_size_divisibility == 1024

    ood = load_d2_config(f"{REF}/ckpts/swin_b_1dl_rba_ood_coco/config.yaml")
    assert ood.input.dataset_mapper_name == "mask_former_semantic_coco_mix"
    assert ood.input.coco_root == "COCO/"
    assert ood.input.coco_proxy_size == 300
    assert ood.input.repeat_instance_masks == 1

    # DATALOADER.NUM_WORKERS (frozen ckpt: 10; mapillary base: 5)
    ckpt = load_d2_config(f"{REF}/ckpts/swin_b_1dl/config.yaml")
    assert ckpt.solver.num_workers == 10
    assert mapi.solver.num_workers == 5
    assert ckpt.test.eval_period == 5000


def test_repeat_instance_masks():
    """INPUT.REPEAT_INSTANCE_MASKS duplicates each class mask N times as
    targets (reference coco_mix mapper :308-313)."""
    import numpy as np

    from rba_tpu.data.mappers import MapperConfig, SemanticDatasetMapper

    m = SemanticDatasetMapper(
        MapperConfig(min_sizes=(16,), crop_hw=(16, 16), color_aug=False,
                     flip=False, max_instances=8, repeat_instance_masks=2)
    )
    img = np.zeros((16, 16, 3), np.uint8)
    seg = np.zeros((16, 16), np.uint8)
    seg[8:] = 3
    ex = m(img, seg)
    assert list(ex["gt_labels"][:4]) == [0, 0, 3, 3]
    assert list(ex["gt_valid"]) == [1, 1, 1, 1, 0, 0, 0, 0]
    np.testing.assert_array_equal(ex["gt_masks"][0], ex["gt_masks"][1])


def test_build_mapper_uses_config_input():
    """The train CLI's mapper geometry comes from the config, not hardcoded
    Cityscapes defaults (reference mask_former_semantic_dataset_mapper.py
    from_config)."""
    import argparse

    from rba_tpu.train.train_net import build_mapper

    cfg = load_d2_config(
        f"{REF}/configs/mapillary-vistas/semantic-segmentation/maskformer2_R50_bs16_300k.yaml"
    )
    args = argparse.Namespace(mapper=None, seed=0, coco_root=None)
    m = build_mapper(cfg, args)
    assert m.cfg.crop_hw == (1024, 1024)
    assert m.cfg.min_sizes == cfg.input.min_size_train
    assert m.cfg.max_size == 8192
    assert m.cfg.size_divisibility == 1024
    assert m.cfg.ignore_label == cfg.sem_seg_head_ignore_value


def test_variant_backbones_resolved():
    base = f"{REF}/configs/cityscapes/semantic-segmentation"
    assert load_d2_config(f"{base}/maskformer2_R101_bs16_90k.yaml").resnet.depth == 101
    assert load_d2_config(
        f"{base}/mix_transformer/maskformer_2_mit_b5_in21k_1dl.yaml"
    ).backbone_name == "mit_b5"
    assert load_d2_config(
        f"{base}/mvit/maskformer_2_mvit_in21k_bs16_90k_1dl.yaml"
    ).backbone_name == "mvit"
    assert load_d2_config(
        f"{base}/vit/maskformer_2_vit_imagenet_bs16_90k.yaml"
    ).backbone_name == "vit"
    assert load_d2_config(
        f"{base}/wideresnet/maskformer_2_wideresnet38_imagenet_bs16_90k_1dl.yaml"
    ).backbone_name == "wideresnet38"
    # MiT stage1..4 feature names normalized to our res2..res5 keys
    mit = load_d2_config(f"{base}/mix_transformer/maskformer_2_mit_b5_in21k_1dl.yaml")
    assert mit.pixel_decoder.transformer_in_features == ("res5",)
    assert mit.pixel_decoder.in_features == ("res2", "res3", "res4", "res5")


def test_ood_finetune_configs():
    pebal = load_d2_config(
        f"{REF}/configs/cityscapes/semantic-segmentation/pebal/"
        "maskformer2_swin_base_IN21k_384_bs16_90k_1dl_pebal_finetune.yaml"
    )
    assert pebal.ood.gambler_loss or pebal.ood.outlier_supervision or pebal.ood.sparsity_loss
    dh = load_d2_config(
        f"{REF}/configs/cityscapes/semantic-segmentation/densehybrid/"
        "maskformer2_swin_base_IN21k_384_bs16_90k_1dl_densehybrid_cocomix_finetune.yaml"
    )
    assert dh.ood.densehybrid_loss and dh.decoder.ood_prediction


REPO_CONFIGS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")


def test_translated_corpus_roundtrips():
    """The shipped native corpus under configs/ reproduces the exact
    RbAConfig of every reference YAML it was translated from."""
    from rba_tpu.config import load_config

    checked = 0
    for path in glob.glob(f"{REF}/configs/**/*.yaml", recursive=True):
        if os.path.basename(path).startswith("Base-"):
            continue
        rel = os.path.relpath(path, f"{REF}/configs")
        native = os.path.join(REPO_CONFIGS, rel)
        assert os.path.exists(native), f"missing translated config {rel}"
        assert load_config(native) == load_d2_config(path), rel
        checked += 1
    assert checked >= 35


def test_native_config_roundtrip_identity():
    from rba_tpu.config import config_from_dict, config_to_dict, tiny_test_config

    cfg = tiny_test_config()
    assert config_from_dict(config_to_dict(cfg)) == cfg


def test_r50_config_runs_end_to_end(rng):
    """The R50 3-level config builds and runs through maskformer on a small
    image — exercising the ResNet backbone + 3-level deformable encoder."""
    import dataclasses

    from rba_tpu.models.maskformer import maskformer_infer, maskformer_init

    cfg = load_d2_config(
        f"{REF}/configs/cityscapes/semantic-segmentation/maskformer2_R50_bs16_90k.yaml",
        compute_dtype="float32",
    )
    # shrink decoder for CPU test speed, keep the 3-level structure
    cfg = dataclasses.replace(
        cfg,
        decoder=dataclasses.replace(cfg.decoder, dec_layers=3, num_queries=10),
        pixel_decoder=dataclasses.replace(cfg.pixel_decoder, transformer_enc_layers=2),
    )
    params = maskformer_init(jax.random.PRNGKey(0), cfg)
    img = jnp.asarray(rng.rand(1, 96, 128, 3) * 255, jnp.float32)
    out = maskformer_infer(params, cfg, img)
    assert out["sem_seg"].shape == (1, 19, 96, 128)
    assert np.isfinite(np.asarray(out["rba"])).all()
