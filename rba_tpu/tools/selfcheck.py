"""Turnkey real-checkpoint parity self-check.

The defining capability claim — score parity with the released Detectron2
checkpoints — cannot be proven in an environment without ``model_final.pth``
files or the real eval datasets.  This tool pre-validates the ENTIRE parity
pipeline so that the moment real weights/datasets appear, parity is one
command (``python evaluate_ood.py --models_folder ckpts/ --datasets_folder
datasets/ --exact``) with every stage already exercised:

  1. builds a torch Mask2Former-style model at the released swin_b_1dl
     architecture (reduced input), exports its weights to a REAL D2-format
     ``model_final.pth`` (``torch.save({"model": state_dict})``) next to a
     D2 ``config.yaml``,
  2. loads that directory through the production path (config ingestion →
     ``load_checkpoint_params`` on-the-fly conversion → jitted scoring),
  3. scores a synthetic labeled set with BOTH the torch model and the
     converted JAX model and asserts per-pixel RbA score-map parity <= 1e-3,
  4. runs the exact-metrics evaluation both ways and reports the deltas.

Usage:
    python evaluate_ood.py --selfcheck                  # full swin_b_1dl arch
    python evaluate_ood.py --selfcheck --arch all       # all 5 released configs
    python evaluate_ood.py --selfcheck --arch swin_l_1dl --hw 1024x2048 \
        --platform default                              # full-res, JAX on TPU
    python -m rba_tpu.tools.selfcheck --tiny            # miniature arch (CI)

``--arch`` covers every released checkpoint directory under
/root/reference/ckpts (the five frozen config.yaml files are the contract
for the released weights); the OOD-finetuned variants share the swin_b/
swin_l forward architecture but exercise their own config-ingestion path.

Reference spec: /root/reference/evaluate_ood.py:108-124 (get_model:
setup + build_model + DetectionCheckpointer), MODEL_ZOO.md tables.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import tempfile

#: the five released checkpoint configs (reference ckpts/*/config.yaml)
ARCHS = (
    "swin_b_1dl",
    "swin_b_1dl_rba_ood_coco",
    "swin_b_1dl_rba_ood_map_coco",
    "swin_l_1dl",
    "swin_l_1dl_rba_ood_map_coco",
)
_CKPT_CONFIG_ROOT = "/root/reference/ckpts"


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_d2_config(cfg, path: str) -> None:
    """Emit a minimal Detectron2-format config.yaml describing ``cfg`` — the
    same key schema the released ckpts/*/config.yaml files use, so the
    selfcheck exercises the production ingestion path."""
    import yaml

    d = {
        "MODEL": {
            "BACKBONE": {"NAME": "D2SwinTransformer"},
            "SWIN": {
                "PATCH_SIZE": cfg.swin.patch_size,
                "EMBED_DIM": cfg.swin.embed_dim,
                "DEPTHS": list(cfg.swin.depths),
                "NUM_HEADS": list(cfg.swin.num_heads),
                "WINDOW_SIZE": cfg.swin.window_size,
                "MLP_RATIO": cfg.swin.mlp_ratio,
                "QKV_BIAS": cfg.swin.qkv_bias,
                "APE": cfg.swin.ape,
                "PATCH_NORM": cfg.swin.patch_norm,
                "DROP_PATH_RATE": cfg.swin.drop_path_rate,
                "PRETRAIN_IMG_SIZE": cfg.swin.pretrain_img_size,
                "OUT_FEATURES": list(cfg.swin.out_features),
            },
            "SEM_SEG_HEAD": {
                "NAME": cfg.sem_seg_head_name,
                "NUM_CLASSES": cfg.num_classes,
                "CONVS_DIM": cfg.pixel_decoder.conv_dim,
                "MASK_DIM": cfg.pixel_decoder.mask_dim,
                "NORM": cfg.pixel_decoder.norm,
                "IN_FEATURES": list(cfg.pixel_decoder.in_features),
                "DEFORMABLE_TRANSFORMER_ENCODER_IN_FEATURES": list(
                    cfg.pixel_decoder.transformer_in_features
                ),
                "TRANSFORMER_ENC_LAYERS": cfg.pixel_decoder.transformer_enc_layers,
                "PIXEL_DECODER_NAME": cfg.pixel_decoder.name,
                "COMMON_STRIDE": cfg.pixel_decoder.common_stride,
            },
            "MASK_FORMER": {
                "HIDDEN_DIM": cfg.decoder.hidden_dim,
                "NUM_OBJECT_QUERIES": cfg.decoder.num_queries,
                "NHEADS": cfg.decoder.nheads,
                "DIM_FEEDFORWARD": cfg.decoder.dim_feedforward,
                "DEC_LAYERS": cfg.decoder.dec_layers + 1,
                "PRE_NORM": cfg.decoder.pre_norm,
                "ENFORCE_INPUT_PROJ": cfg.decoder.enforce_input_project,
                "SIZE_DIVISIBILITY": cfg.input.size_divisibility,
                "TRANSFORMER_DECODER_NAME": cfg.decoder.name,
                "TRANSFORMER_IN_FEATURE": cfg.decoder.transformer_in_feature,
                "TEST": {
                    "SEMANTIC_ON": cfg.test.semantic_on,
                    "PANOPTIC_ON": cfg.test.panoptic_on,
                    "INSTANCE_ON": cfg.test.instance_on,
                },
            },
            "PIXEL_MEAN": list(cfg.input.pixel_mean),
            "PIXEL_STD": list(cfg.input.pixel_std),
        },
        "INPUT": {
            "MIN_SIZE_TEST": cfg.input.min_size_test,
            "MAX_SIZE_TEST": cfg.input.max_size_test,
            "FORMAT": cfg.input.image_format,
            "MIN_SIZE_TRAIN": list(cfg.input.min_size_train),
            "MAX_SIZE_TRAIN": cfg.input.max_size_train,
            "CROP": {
                "ENABLED": cfg.input.crop_enabled,
                "SIZE": list(cfg.input.crop_size),
                "SINGLE_CATEGORY_MAX_AREA": cfg.input.single_category_max_area,
            },
            "COLOR_AUG_SSD": cfg.input.color_aug_ssd,
            "RANDOM_FLIP": "horizontal" if cfg.input.random_flip else "none",
            "SIZE_DIVISIBILITY": cfg.input.train_size_divisibility,
            "DATASET_MAPPER_NAME": cfg.input.dataset_mapper_name,
            "REPEAT_INSTANCE_MASKS": cfg.input.repeat_instance_masks,
            "COCO_ROOT": cfg.input.coco_root,
            "COCO_PROXY_SIZE": cfg.input.coco_proxy_size,
            "IMAGE_SIZE": cfg.input.image_size,
            "MIN_SCALE": cfg.input.min_scale,
            "MAX_SCALE": cfg.input.max_scale,
        },
        "TEST": {
            "EVAL_PERIOD": cfg.test.eval_period,
            "AUG": {
                "ENABLED": cfg.test.aug_enabled,
                "FLIP": cfg.test.aug_flip,
                "MIN_SIZES": list(cfg.test.aug_min_sizes),
                "MAX_SIZE": cfg.test.aug_max_size,
            },
        },
        "DATALOADER": {"NUM_WORKERS": cfg.solver.num_workers},
        "DATASETS": {
            "TRAIN": list(cfg.datasets_train),
            "TEST": list(cfg.datasets_test),
            "UNSEEN_LABEL_SET": cfg.unseen_label_set,
        },
    }
    with open(path, "w") as f:
        yaml.safe_dump(d, f)


def build_torch_model(cfg, seed: int = 0):
    """Torch modules at the dims of ``cfg`` (same builders as the full-scale
    golden, tests/torch_refs.py)."""
    import torch

    sys.path.insert(0, _repo_root())
    from tests.torch_refs import (
        TorchMiniMaskedDecoder,
        TorchPixelDecoderFull,
        TorchSwinFull,
    )

    torch.manual_seed(seed)
    swin = TorchSwinFull(
        embed_dim=cfg.swin.embed_dim, depths=cfg.swin.depths,
        num_heads=cfg.swin.num_heads, window=cfg.swin.window_size,
    )
    with torch.no_grad():
        for stage in swin.blocks:
            for blk in stage:
                blk.attn.relative_position_bias_table.normal_(0, 0.5)
    in_ch = {
        f"res{i + 2}": cfg.swin.embed_dim * 2**i
        for i in range(len(cfg.swin.depths))
    }
    tf = cfg.pixel_decoder.transformer_in_features[-1]
    fpn = tuple(f for f in reversed(cfg.pixel_decoder.in_features) if f != tf)
    pd = TorchPixelDecoderFull(
        in_ch, conv_dim=cfg.pixel_decoder.conv_dim,
        mask_dim=cfg.pixel_decoder.mask_dim,
        enc_layers=cfg.pixel_decoder.transformer_enc_layers,
        nheads=cfg.pixel_decoder.transformer_nheads,
        ffn=cfg.pixel_decoder.transformer_dim_feedforward,
        transformer_feature=tf, fpn_features=fpn,
    )
    with torch.no_grad():
        for l in pd.layers:
            l.attn.sampling_offsets.weight.normal_(0, 0.01)
            l.attn.sampling_offsets.bias.normal_(0, 0.3)
    dec = TorchMiniMaskedDecoder(
        cfg.decoder.hidden_dim, cfg.decoder.nheads, cfg.decoder.dim_feedforward,
        cfg.decoder.dec_layers, cfg.decoder.num_queries, cfg.num_classes,
        cfg.decoder.mask_dim, num_levels=1,
    )
    with torch.no_grad():
        for emb in (dec.query_feat, dec.query_embed, dec.level_embed):
            emb.weight.normal_(0, 0.5)
    return swin, pd, dec


def export_checkpoint(swin, pd, dec, cfg, model_dir: str) -> None:
    """Real D2-format checkpoint: torch.save({"model": state_dict}) +
    config.yaml — byte-layout identical to a released ``model_final.pth``."""
    import torch

    sys.path.insert(0, _repo_root())
    from tests.test_full_stack_golden import _export_d2_state_dict

    sd = _export_d2_state_dict(swin, pd, dec, query_feat_key="static_query")
    os.makedirs(model_dir, exist_ok=True)
    torch.save(
        {"model": {k: torch.from_numpy(v) for k, v in sd.items()}},
        os.path.join(model_dir, "model_final.pth"),
    )
    write_d2_config(cfg, os.path.join(model_dir, "config.yaml"))


def torch_rba_scores(swin, pd, dec, cfg, images) -> "np.ndarray":
    """Reference-semantics RbA scoring of uint8 images (normalize → forward →
    mask upsample → softmax⊗sigmoid einsum → -Σ tanh), mirroring
    evaluate_ood.py:143-150 + maskformer_model.py eval branch."""
    import numpy as np
    import torch
    import torch.nn.functional as F

    sys.path.insert(0, _repo_root())
    from tests.torch_refs import torch_sine_pos_embed

    mean = np.asarray(cfg.input.pixel_mean, np.float32)
    std = np.asarray(cfg.input.pixel_std, np.float32)
    out = []
    with torch.no_grad():
        for img in images:
            h, w = img.shape[:2]
            x = (img.astype(np.float32) - mean) / std
            x = torch.from_numpy(x.transpose(2, 0, 1)[None])
            feats = swin(x)
            mask_features, enc = pd(feats)
            pos = torch_sine_pos_embed(
                enc.shape[2], enc.shape[3], cfg.decoder.hidden_dim // 2
            )
            cls_list, mask_list = dec([enc], [pos], mask_features)
            mask_pred = F.interpolate(
                mask_list[-1], size=(h, w), mode="bilinear", align_corners=False
            )
            probs = torch.softmax(cls_list[-1], dim=-1)[..., :-1]
            sem = torch.einsum("bqc,bqhw->bchw", probs, mask_pred.sigmoid())
            out.append((-sem.tanh().sum(1))[0].numpy())
    return np.stack(out)


def run_selfcheck(
    workdir: str,
    arch: str = "tiny",
    n_images: int = 4,
    hw=(128, 256),
    tol: float = 1e-3,
    platform: str = "cpu",
) -> dict:
    """One parity run for ``arch`` ∈ {"tiny"} ∪ ARCHS.

    ``platform="cpu"`` (default) pins JAX to CPU for bit-stable parity
    arithmetic; ``platform="default"`` leaves the session platform alone so
    full-resolution runs score on the real TPU (the torch reference side
    always runs on CPU — this measures the *deployed* numerics gap)."""
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from ..config import load_d2_config, tiny_test_config
    from ..data.ood_datasets import SyntheticAnomaly
    from ..evalx.evaluator import OODEvaluator
    from ..evalx.sweep import load_model

    tiny = arch == "tiny"
    if tiny:
        arch_cfg = tiny_test_config()
    else:
        if arch not in ARCHS:
            raise ValueError(f"unknown arch {arch!r}; choose from {ARCHS}")
        arch_cfg = load_d2_config(
            os.path.join(_CKPT_CONFIG_ROOT, arch, "config.yaml")
        )

    model_dir = os.path.join(workdir, "ckpts", f"selfcheck_{arch}")
    swin, pd, dec = build_torch_model(arch_cfg)
    export_checkpoint(swin, pd, dec, arch_cfg, model_dir)

    # production load path: config.yaml ingestion + .pth conversion.
    # precision="fp32" (not the serving default "fast"): the selfcheck's
    # whole point is ±tol score parity against the torch reference
    cfg, params = load_model(model_dir, precision="fp32")

    ds = SyntheticAnomaly(n=n_images, hw=tuple(hw))
    images = [ds[i].image for i in range(len(ds))]

    rba_torch = torch_rba_scores(swin, pd, dec, cfg, images)

    ev = OODEvaluator(cfg, params)
    scores, gts = ev.compute_anomaly_scores(ds)

    delta = float(np.abs(scores - rba_torch).max())
    m_jax = ev.evaluate_ood(scores, gts)
    m_torch = ev.evaluate_ood(rba_torch, gts)
    result = {
        "mode": arch,
        "platform": platform,
        "n_images": n_images,
        "hw": list(hw),
        "max_score_delta": delta,
        "tolerance": tol,
        "metrics_jax": m_jax,
        "metrics_torch": m_torch,
        "metric_deltas": {k: abs(m_jax[k] - m_torch[k]) for k in m_jax},
        "pass": delta <= tol,
    }
    return result


def build_synthetic_dataset_trees(root: str, hw=(256, 512), n: int = 4, seed: int = 0):
    """Write RoadAnomaly / Fishyscapes-LAF / SMIYC-AnomalyTrack directory
    trees — the real suites' on-disk layouts (reference datasets/
    road_anomaly.py, fishyscapes.py, segment_me_if_you_can.py) — filled with
    SyntheticStructured scenes, each label in the suite's native encoding
    (RoadAnomaly marks anomalies 2; the others store {0,1,255} directly).
    Returns the dataset names ``get_datasets(root)`` will discover."""
    import numpy as np
    from PIL import Image

    from ..data.ood_datasets import SyntheticStructured

    ds = SyntheticStructured(n=3 * n, hw=hw, seed=seed)

    def png(path, arr):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        Image.fromarray(arr).save(path)

    # RoadAnomaly: frame_list.json + frames/<img>.jpg + <img>.labels/
    ra = os.path.join(root, "RoadAnomaly", "RoadAnomaly_jpg")
    frames = [f"synthetic_{i:02d}.jpg" for i in range(n)]
    os.makedirs(os.path.join(ra, "frames"), exist_ok=True)
    with open(os.path.join(ra, "frame_list.json"), "w") as f:
        json.dump(frames, f)
    for i, fname in enumerate(frames):
        s = ds[i]
        Image.fromarray(s.image).save(os.path.join(ra, "frames", fname), quality=95)
        lab = np.where(s.label == 1, 2, s.label).astype(np.uint8)  # anomaly = 2
        png(os.path.join(ra, "frames", fname[:-4] + ".labels",
                         "labels_semantic.png"), lab)

    # Fishyscapes LAF: label/image pairing via the 0000_-prefixed names
    fs = os.path.join(root, "Fishyscapes")
    for i in range(n):
        s = ds[n + i]
        lbl_name = f"{i:04d}_city_{i:06d}_000019_leftImg8bit.png"
        png(os.path.join(fs, "fishyscapes_lostandfound", lbl_name),
            s.label.astype(np.uint8))
        png(os.path.join(fs, "laf_images", lbl_name[5:-10] + "leftImg8bit.png"),
            s.image)

    # SMIYC AnomalyTrack: validation_* images + labels_masks
    smiyc = os.path.join(root, "SegmentMeIfYouCan", "dataset_AnomalyTrack")
    for i in range(n):
        s = ds[2 * n + i]
        os.makedirs(os.path.join(smiyc, "images"), exist_ok=True)
        Image.fromarray(s.image).save(
            os.path.join(smiyc, "images", f"validation_{i:04d}.jpg"), quality=95)
        png(os.path.join(smiyc, "labels_masks",
                         f"validation_{i:04d}_labels_semantic.png"),
            s.label.astype(np.uint8))

    return ["road_anomaly", "fishyscapes_laf", "road_anomaly_21"]


def run_metrics_check(
    workdir: str,
    arch: str = "swin_b_1dl",
    n_images: int = 4,
    hw=(256, 512),
    platform: str = "cpu",
    exact: bool = False,
) -> dict:
    """VERDICT r4 item 8: run the FULL sweep CLI — the literal command path
    of the eventual real-checkpoint run — end-to-end over synthetic dataset
    trees in the real suites' layouts, with the exported real-format
    ``model_final.pth``, producing a results.pkl.  This validates every
    stage past score-map parity: dataset discovery, reader decoding, the
    zoo walk, streaming/exact metrics, and resumable results persistence."""
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import pickle

    import numpy as np

    from ..config import load_d2_config, tiny_test_config
    from ..evalx.sweep import main as sweep_main

    cfg = tiny_test_config() if arch == "tiny" else load_d2_config(
        os.path.join(_CKPT_CONFIG_ROOT, arch, "config.yaml")
    )
    model_dir = os.path.join(workdir, "ckpts", arch)
    if not os.path.exists(os.path.join(model_dir, "model_final.pth")):
        swin, pd, dec = build_torch_model(cfg)
        export_checkpoint(swin, pd, dec, cfg, model_dir)

    data_root = os.path.join(workdir, "datasets")
    names = build_synthetic_dataset_trees(data_root, hw=hw, n=n_images)

    out_path = os.path.join(workdir, "results")
    argv = [
        "--models_folder", os.path.join(workdir, "ckpts"),
        "--datasets_folder", data_root,
        "--out_path", out_path,
        "--dataset_mode", ",".join(names),
        "--upper_limit", str(n_images),
    ] + (["--exact"] if exact else [])
    sweep_main(argv)

    pkl = os.path.join(out_path, arch, "results.pkl")
    ok = os.path.exists(pkl)
    rows = {}
    if ok:
        with open(pkl, "rb") as f:
            rows = pickle.load(f)
    result = {
        "mode": "metrics",
        "arch": arch,
        "datasets": names,
        "results_pkl": pkl,
        "rows": {k: {m: round(float(x), 4) for m, x in v.items()}
                 for k, v in rows.items()},
        "pass": ok and set(rows) >= set(names)
        and all(all(np.isfinite(list(v.values()))) for v in rows.values()),
    }
    return result


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", default=None,
                    help="scratch dir for the exported checkpoint (default: tmp)")
    ap.add_argument("--tiny", action="store_true",
                    help="miniature architecture (seconds instead of minutes)")
    ap.add_argument("--arch", default=None, choices=("tiny", "all") + ARCHS,
                    help="released checkpoint config to check (or 'all' for "
                         "every frozen ckpts/*/config.yaml); default swin_b_1dl")
    ap.add_argument("--images", type=int, default=4)
    ap.add_argument("--hw", default=None, help="synthetic image HxW")
    ap.add_argument("--tol", type=float, default=1e-3)
    ap.add_argument("--platform", default="cpu", choices=("cpu", "default"),
                    help="'cpu' pins JAX to CPU (bit-stable parity); "
                         "'default' scores on the session device (TPU)")
    ap.add_argument("--metrics", action="store_true",
                    help="instead of score-map parity, run the FULL sweep "
                         "CLI end-to-end over synthetic RoadAnomaly/"
                         "Fishyscapes-LAF/SMIYC dataset trees with the "
                         "exported real-format .pth, producing results.pkl "
                         "— the literal command path of the eventual "
                         "real-checkpoint run")
    ap.add_argument("--exact", action="store_true",
                    help="with --metrics: all-pixel exact metrics instead "
                         "of the streaming path")
    args = ap.parse_args(argv)

    arch = args.arch or ("tiny" if args.tiny else "swin_b_1dl")
    hw = (
        tuple(int(v) for v in args.hw.split("x"))
        if args.hw else ((64, 96) if arch == "tiny" else (128, 256))
    )
    workdir = args.workdir or tempfile.mkdtemp(prefix="rba_selfcheck_")
    archs = ARCHS if arch == "all" else (arch,)
    results = []
    for a in archs:
        if args.metrics:
            result = run_metrics_check(workdir, a, args.images, hw,
                                       platform=args.platform, exact=args.exact)
        else:
            result = run_selfcheck(workdir, a, args.images, hw, args.tol,
                                   platform=args.platform)
        print(json.dumps(result, indent=2))
        results.append(result)
    failed = [r for r in results if not r["pass"]]
    if failed:
        raise SystemExit(
            "selfcheck FAILED: "
            + ", ".join(
                f"{r['mode']} delta {r['max_score_delta']:.2e} > {r['tolerance']}"
                for r in failed
            )
        )
    print(f"selfcheck PASS ({len(results)} arch(s))")


if __name__ == "__main__":
    main()
