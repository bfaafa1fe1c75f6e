"""Typed configuration tree for rba-tpu.

The reference (NazirNayal8/RbA) configures everything through Detectron2's
``CfgNode`` YAML files extended by ``add_maskformer2_config``
(/root/reference/mask2former/config.py:6-244).  The released checkpoints each
ship a frozen ``config.yaml`` (e.g. /root/reference/ckpts/swin_b_1dl/config.yaml)
which is the contract for loading them.  Here we use plain dataclasses and a
loader that ingests those same YAML files, pulling out only the keys that
affect model math / evaluation.
"""
from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import yaml


@dataclass(frozen=True)
class SwinConfig:
    """Swin transformer backbone hyperparameters.

    Mirrors cfg.MODEL.SWIN of the reference (config defaults in
    /root/reference/mask2former/config.py; consumed by
    /root/reference/mask2former/modeling/backbone/swin.py:686-770).
    """

    patch_size: int = 4
    embed_dim: int = 128
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    ape: bool = False
    patch_norm: bool = True
    drop_path_rate: float = 0.3
    pretrain_img_size: int = 384
    out_features: Tuple[str, ...] = ("res2", "res3", "res4", "res5")
    use_checkpoint: bool = False  # jax.checkpoint (remat) over blocks
    # window-attention lowering: "partition" = explicit reshape/transpose
    # window partition (reference layout); "nested" = transpose-free einsum
    # on the (B, nHw, ws, nWw, ws, C) view; "resident" = whole stage runs in
    # the partitioned token layout (one contiguous permutation per shift
    # change instead of per-block partition/reverse round-trips; identical
    # math at real tokens — see models/swin.py resident section);
    # "qkv_canvas" = qkv projection on the un-partitioned canvas with ONE
    # window partition of the 3C output (bit-identical; perf probe for
    # fusing the partition transpose into the qkv matmul neighborhood —
    # MEASURED LOSS on v5e: 51.74 ms fast Swin-B 1024x2048 vs 40.48
    # partition; XLA does not absorb the 6-D transpose into the matmul and
    # the relayout now moves 3C bytes instead of C)
    attn_layout: str = "partition"
    # MLP lowering: "xla" = unfused linear/gelu chain; "fused" = Pallas
    # token-tiled kernel (ops/pallas/fused_mlp.py) that keeps the 4C hidden
    # tensor in VMEM, where the shape supports it (TPU only, C <= 512)
    mlp_impl: str = "xla"

    @property
    def num_layers(self) -> int:
        return len(self.depths)

    def stage_dim(self, i: int) -> int:
        return int(self.embed_dim * 2**i)

    @property
    def out_channels(self) -> Dict[str, int]:
        return {f"res{i + 2}": self.stage_dim(i) for i in range(self.num_layers)}

    @property
    def out_strides(self) -> Dict[str, int]:
        return {f"res{i + 2}": int(self.patch_size * 2**i) for i in range(self.num_layers)}


@dataclass(frozen=True)
class PixelDecoderConfig:
    """MSDeformAttn pixel decoder (reference:
    /root/reference/mask2former/modeling/pixel_decoder/msdeformattn.py:173-367).
    """

    conv_dim: int = 256
    mask_dim: int = 256
    norm: str = "GN"
    transformer_in_features: Tuple[str, ...] = ("res5",)  # 1dl released ckpts
    in_features: Tuple[str, ...] = ("res2", "res3", "res4", "res5")
    transformer_enc_layers: int = 6
    transformer_nheads: int = 8
    enc_n_points: int = 4
    # The reference hardcodes 1024 for the deformable encoder FFN
    # (msdeformattn.py:315) regardless of MASK_FORMER.DIM_FEEDFORWARD.
    transformer_dim_feedforward: int = 1024
    common_stride: int = 4
    # SEM_SEG_HEAD.PIXEL_DECODER_NAME registry choice (reference
    # pixel_decoder/fpn.py:21-33 build_pixel_decoder):
    # MSDeformAttnPixelDecoder (live path) | BasePixelDecoder |
    # TransformerEncoderPixelDecoder
    name: str = "MSDeformAttnPixelDecoder"
    # deformable sampling lowering: "gather" (2x2 patch gather + lerp) or
    # "onehot" (fold bilinear x attention weights into a dense (Lq, HW) row
    # matrix, contract on the MXU — 3x faster at the 1-level eval shapes,
    # see ops/deform_sampling._onehot_matmul_level); "auto" picks onehot
    # when every level's HW is small enough for the dense row matrix
    sampling_method: str = "auto"
    # "bfloat16": materialize the one-hot row matrix in bf16 (fast serving
    # experiment — halves the path's HBM traffic; ablation-gated).  The
    # default fp32 is exact vs the gather at HIGHEST precision.
    sampling_dtype: str = "float32"
    # per-level element cap for auto one-hot dispatch (see
    # ops/deform_sampling.ms_deform_attn_core).  Since r5 the one-hot path
    # has a recompute-A custom VJP, so the cap bounds TRANSIENT memory only
    # (bwd: ~8 bytes/element for the A + S matrices, freed per layer), not
    # saved residuals — 192M covers res4+res5 at the 3-level 512x1024 bs1
    # train shape and res5 at bs4 (measured wins in
    # tools/perf_deform_multilevel.py --grad).  fast_serving raises it to
    # 256M so multi-level eval configs get the one-hot wins too.
    sampling_onehot_cap: int = 192 * 1024 * 1024

    @property
    def num_feature_levels(self) -> int:
        return len(self.transformer_in_features)


@dataclass(frozen=True)
class DecoderConfig:
    """Mask2Former masked-attention transformer decoder (reference:
    /root/reference/mask2former/modeling/transformer_decoder/mask2former_transformer_decoder.py:232-502).
    """

    hidden_dim: int = 256
    num_queries: int = 100
    nheads: int = 8
    dim_feedforward: int = 2048
    # reference from_config subtracts 1 from cfg DEC_LAYERS (…decoder.py:388)
    dec_layers: int = 1
    # raw MASK_FORMER.DEC_LAYERS / ENC_LAYERS: the v1 StandardTransformerDecoder
    # uses them un-adjusted (maskformer_transformer_decoder.py from_config)
    dec_layers_total: int = 6
    enc_layers: int = 0
    pre_norm: bool = False
    mask_dim: int = 256
    enforce_input_project: bool = False
    num_feature_levels: int = 1  # = len(DEFORMABLE_TRANSFORMER_ENCODER_IN_FEATURES)
    ood_prediction: bool = False  # DenseHybrid auxiliary head
    # TRANSFORMER_DECODER_NAME registry choice: MultiScaleMaskedTransformerDecoder
    # (live path) | MultiScalePerPixelDecoder | SimpleDecoder |
    # StandardTransformerDecoder (reference …decoder.py registry + fpn path)
    name: str = "MultiScaleMaskedTransformerDecoder"
    # TRANSFORMER_IN_FEATURE routing in MaskFormerHead.layers
    # (reference mask_former_head.py:128-146)
    transformer_in_feature: str = "multi_scale_pixel_decoder"


@dataclass(frozen=True)
class ResNetConfig:
    """Detectron2-style ResNet (cfg.MODEL.RESNETS) — the default backbone of
    the reference's R50/R101 configs (Base-*.yaml: build_resnet_backbone)."""

    depth: int = 50
    stem_out_channels: int = 64
    stride_in_1x1: bool = False  # torchvision convention in all ref configs
    out_features: Tuple[str, ...] = ("res2", "res3", "res4", "res5")
    norm: str = "SyncBN"

    @property
    def stage_blocks(self) -> Tuple[int, ...]:
        return {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
                101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}[self.depth]

    @property
    def out_channels(self) -> Dict[str, int]:
        return {f"res{i + 2}": 256 * 2**i for i in range(4)}


@dataclass(frozen=True)
class TestConfig:
    semantic_on: bool = True
    panoptic_on: bool = False
    instance_on: bool = False
    sem_seg_postprocessing_before_inference: bool = False
    object_mask_threshold: float = 0.8
    overlap_threshold: float = 0.8
    # TTA
    aug_enabled: bool = False
    aug_flip: bool = True
    aug_min_sizes: Tuple[int, ...] = (512, 768, 1024, 1280, 1536, 1792)
    aug_max_size: int = 4096
    eval_period: int = 5000  # TEST.EVAL_PERIOD (0: no in-train eval)


@dataclass(frozen=True)
class InputConfig:
    pixel_mean: Tuple[float, float, float] = (123.675, 116.28, 103.53)
    pixel_std: Tuple[float, float, float] = (58.395, 57.12, 57.375)
    size_divisibility: int = 32
    min_size_test: int = 1024
    max_size_test: int = 2048
    image_format: str = "RGB"
    # train-time mapper fields (reference INPUT.*, e.g.
    # Base-Cityscapes-SemanticSegmentation.yaml:37-50; Mapillary differs:
    # crop (1024, 1024), min sizes from a 2048 ladder, SIZE_DIVISIBILITY 1024)
    min_size_train: Tuple[int, ...] = tuple(int(x * 0.1 * 1024) for x in range(5, 21))
    max_size_train: int = 4096
    crop_enabled: bool = True
    crop_size: Tuple[int, int] = (512, 1024)
    single_category_max_area: float = 1.0
    color_aug_ssd: bool = True
    random_flip: bool = True
    train_size_divisibility: int = -1  # INPUT.SIZE_DIVISIBILITY (-1: pad to crop)
    dataset_mapper_name: str = "mask_former_semantic"
    repeat_instance_masks: int = 1
    coco_root: str = "coco/"  # INPUT.COCO_ROOT, relative to the datasets dir
    coco_proxy_size: int = 300  # INPUT.COCO_PROXY_SIZE
    # COCO large-scale-jitter geometry (INPUT.IMAGE_SIZE/MIN_SCALE/MAX_SCALE,
    # used by the coco_*_lsj mappers; Base-COCO-OpenPanopticSegmentation.yaml)
    image_size: int = 1024
    min_scale: float = 0.1
    max_scale: float = 2.0


@dataclass(frozen=True)
class OODConfig:
    """RbA / outlier-exposure settings (reference config keys in
    /root/reference/mask2former/config.py:184-227)."""

    ood_label: int = 254
    ood_prob: float = 0.2
    outlier_supervision: bool = False
    outlier_loss_target: str = "none"  # none | nls | tanh
    score_norm: str = "none"
    outlier_loss_func: str = "max"  # squared_hinge implemented as in reference
    inlier_upper_threshold: float = 0.0
    outlier_lower_threshold: float = 5.0
    outlier_weight: float = 1.0
    smoothness_loss: bool = False
    smoothness_score: str = "none"  # none | nls | energy | softmax_entropy
    smoothness_weight: float = 3.0e-6
    sparsity_loss: bool = False
    sparsity_weight: float = 5.0e-4
    gambler_loss: bool = False
    gambler_weight: float = 1.0
    ood_reg: float = 0.1  # PEBAL boosting coefficient (PEBAL_OOD_REG)
    pebal_reward: float = 4.5  # PEBAL_REWARD fallback reward
    densehybrid_loss: bool = False
    densehybrid_beta: float = 0.03
    densehybrid_weight: float = 1.0


@dataclass(frozen=True)
class LossConfig:
    """SetCriterion weights (reference /root/reference/mask2former/maskformer_model.py:107-221)."""

    class_weight: float = 2.0
    mask_weight: float = 5.0
    dice_weight: float = 5.0
    no_object_weight: float = 0.1
    deep_supervision: bool = True
    train_num_points: int = 12544
    oversample_ratio: float = 3.0
    importance_sample_ratio: float = 0.75
    matcher: str = "HungarianMatcher"
    # MASK_FORMER.USE_POINT_REND: point-sampled CE for the per-pixel baseline
    # heads (reference meta_arch/per_pixel_baseline.py:163-189)
    use_point_rend: bool = False


@dataclass(frozen=True)
class SolverConfig:
    base_lr: float = 1e-4
    weight_decay: float = 0.05
    weight_decay_embed: float = 0.0
    weight_decay_norm: float = 0.0
    backbone_multiplier: float = 0.1
    clip_gradients: bool = True
    clip_value: float = 0.01
    max_iter: int = 90000
    warmup_iters: int = 0
    warmup_factor: float = 1.0
    poly_lr_power: float = 0.9
    poly_lr_constant_ending: float = 0.0
    ims_per_batch: int = 16
    amp: bool = True
    # DATALOADER.NUM_WORKERS (reference configs use 5-10): default mapper
    # thread count for the host prefetcher; --workers overrides
    num_workers: int = 4
    freeze_backbone: bool = False
    freeze_pixel_decoder: bool = False
    freeze_transformer_decoder: bool = False
    freeze_transformer_decoder_except_mlp: bool = False
    freeze_transformer_decoder_except_object_queries: bool = False


@dataclass(frozen=True)
class RbAConfig:
    """Top-level model + eval configuration."""

    backbone_name: str = "swin"
    # SEM_SEG_HEAD.NAME registry choice (reference D2 SEM_SEG_HEADS_REGISTRY):
    # MaskFormerHead | PerPixelBaselineHead | PerPixelBaselinePlusHead
    sem_seg_head_name: str = "MaskFormerHead"
    swin: SwinConfig = field(default_factory=SwinConfig)
    resnet: ResNetConfig = field(default_factory=ResNetConfig)
    pixel_decoder: PixelDecoderConfig = field(default_factory=PixelDecoderConfig)
    decoder: DecoderConfig = field(default_factory=DecoderConfig)
    test: TestConfig = field(default_factory=TestConfig)
    input: InputConfig = field(default_factory=InputConfig)
    ood: OODConfig = field(default_factory=OODConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    solver: SolverConfig = field(default_factory=SolverConfig)
    num_classes: int = 19
    # DATASETS.TRAIN / DATASETS.TEST catalog names (reference D2 cfg; e.g.
    # the map_coco recipes train on two concatenated datasets,
    # ckpts/swin_b_1dl_rba_ood_map_coco/config.yaml:15-17).  The train CLI
    # resolves these through rba_tpu/data/catalog.py.
    datasets_train: Tuple[str, ...] = ("cityscapes_fine_sem_seg_train",)
    datasets_test: Tuple[str, ...] = ("cityscapes_fine_sem_seg_val",)
    # DATASETS.UNSEEN_LABEL_SET: path (relative to the datasets dir) of a
    # class-name list dropped from supervision in the open-world protocol
    # (reference config.py:244, open_coco_mapper.py:120-126); "" disables
    unseen_label_set: str = ""
    # compute dtype for backbone/decoder matmuls; score path stays fp32
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    # pixel-decoder convs/FFNs: "float32" mirrors the reference's fp32-pinned
    # pixel decoder (msdeformattn.py:323-329) for strict score parity;
    # "bfloat16" is the fast serving mode (norms/softmax/sampling stay fp32)
    pixel_decoder_dtype: str = "float32"
    # fast serving mode: bf16 window-attention softmax in the backbone
    # (a config field, not an env var, so two jits of the same cfg can never
    # silently differ on ambient process state)
    fast_math: bool = False
    # weight-only int8 serving experiment ("none" | "int8"): quantize 2-D
    # linear kernels per-output-channel before jit (ops/quant.py).  Measured
    # a no-op on latency — the model's HBM traffic is activation-dominated
    # (see ops/quant.py docstring + ABLATION.json) — kept as the recorded
    # negative result per VERDICT r3 task 6.
    weight_quant: str = "none"

    @property
    def sem_seg_head_ignore_value(self) -> int:
        return 255


def _get(d: Dict[str, Any], path: str, default=None):
    cur: Any = d
    for part in path.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return default
        cur = cur[part]
    return cur


# ---------------------------------------------------------------------------
# Detectron2 YAML compatibility: _BASE_ inheritance + the !!python eval tag
# (reference train_net.py:352-366 merges via CfgNode.merge_from_file, which
# supports relative _BASE_ chains and the
# ``!!python/object/apply:eval`` construct used by
# configs/**/Base-*.yaml for MIN_SIZE_TRAIN)
# ---------------------------------------------------------------------------

class _D2YamlLoader(yaml.SafeLoader):
    pass


def _eval_constructor(loader, node):
    (expr,) = loader.construct_sequence(node)
    # the corpus only uses range/int arithmetic; no builtins beyond these
    return eval(expr, {"__builtins__": {}}, {"range": range, "int": int, "float": float})


_D2YamlLoader.add_constructor(
    "tag:yaml.org,2002:python/object/apply:eval", _eval_constructor
)


def _deep_merge(base: Dict, child: Dict) -> Dict:
    out = dict(base)
    for k, v in child.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def load_yaml_with_base(path: str) -> Dict[str, Any]:
    """Load a D2 YAML, following relative ``_BASE_`` chains and deep-merging
    the child over its base (child wins)."""
    import os

    with open(path) as f:
        raw = yaml.load(f, Loader=_D2YamlLoader) or {}
    base_rel = raw.pop("_BASE_", None)
    if base_rel:
        base_path = base_rel if os.path.isabs(base_rel) else os.path.join(
            os.path.dirname(os.path.abspath(path)), base_rel
        )
        raw = _deep_merge(load_yaml_with_base(base_path), raw)
    return raw


# config feature names → our backbone output keys: the MiT backbone's
# stage1..4 (reference mix_transformer.py forward) are emitted as res2..res5
_FEATURE_ALIASES = {"stage1": "res2", "stage2": "res3", "stage3": "res4", "stage4": "res5"}


def _features(names) -> Tuple[str, ...]:
    return tuple(_FEATURE_ALIASES.get(n, n) for n in names)


def _strs(v) -> Tuple[str, ...]:
    """String-sequence coercion for DATASETS.TRAIN/TEST: frozen ckpt configs
    serialize a real YAML list, while the training corpus writes the CfgNode
    python-tuple literal ``("cityscapes_fine_sem_seg_train",)`` which YAML
    reads as a string."""
    if isinstance(v, str):
        if v.lstrip().startswith(("(", "[")):
            import ast

            v = ast.literal_eval(v)
        else:
            return (v,)
    return tuple(str(x) for x in v)


def _seq(v) -> Tuple[int, ...]:
    """Tolerant int-sequence coercion: frozen ckpt configs serialize
    CROP.SIZE as a real YAML list, while the training corpus writes the
    CfgNode python-tuple literal ``(512, 1024)`` which YAML reads as a
    string."""
    if isinstance(v, str):
        import ast

        v = ast.literal_eval(v)
    if isinstance(v, (int, float)):
        v = (v,)
    return tuple(int(x) for x in v)


def _int(v, default: int) -> int:
    """Tolerant int coercion: the reference corpus contains a literal typo
    (wideresnet 1dl config ``DEC_LAYERS: 2z``) that YAML reads as a string —
    take the leading integer rather than refusing the whole config."""
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, (int, float)):
        return int(v)
    import re as _re

    m = _re.match(r"\s*(-?\d+)", str(v))
    return int(m.group(1)) if m else default


def load_d2_config(path: str, **overrides) -> RbAConfig:
    """Ingest a frozen Detectron2 ``config.yaml`` from the reference release.

    Only keys that affect the math of the live code path are honored; the rest
    of the (enormous) D2 schema is ignored.  See
    /root/reference/ckpts/swin_b_1dl/config.yaml for an example input.
    """
    raw = load_yaml_with_base(path)

    model = raw.get("MODEL", {})
    swin_raw = model.get("SWIN", {})
    mf = model.get("MASK_FORMER", {})
    head = model.get("SEM_SEG_HEAD", {})
    inp = raw.get("INPUT", {})
    test = raw.get("TEST", {})
    solver = raw.get("SOLVER", {})

    backbone = {
        "D2SwinTransformer": "swin",
        "D2ViT": "vit",
        "D2MViT": "mvit",
        "build_wideresnet38_backbone": "wideresnet38",
        "build_wideresnet_backbone": "wideresnet38",
        "WiderResNetA2": "wideresnet38",
        "WiderResNet38A2": "wideresnet38",
        "build_resnet_backbone": "resnet",
        "build_resnet_deeplab_backbone": "resnet",
    }.get(_get(model, "BACKBONE.NAME", "D2SwinTransformer"), "swin")
    name_raw = str(_get(model, "BACKBONE.NAME", ""))
    if name_raw.startswith("mit"):
        backbone = name_raw  # keep the variant (mit_b0..mit_b5)

    swin = SwinConfig(
        patch_size=swin_raw.get("PATCH_SIZE", 4),
        embed_dim=swin_raw.get("EMBED_DIM", 128),
        depths=tuple(swin_raw.get("DEPTHS", (2, 2, 18, 2))),
        num_heads=tuple(swin_raw.get("NUM_HEADS", (4, 8, 16, 32))),
        window_size=swin_raw.get("WINDOW_SIZE", 12),
        mlp_ratio=swin_raw.get("MLP_RATIO", 4.0),
        qkv_bias=swin_raw.get("QKV_BIAS", True),
        qk_scale=swin_raw.get("QK_SCALE", None),
        ape=swin_raw.get("APE", False),
        patch_norm=swin_raw.get("PATCH_NORM", True),
        drop_path_rate=swin_raw.get("DROP_PATH_RATE", 0.3),
        pretrain_img_size=swin_raw.get("PRETRAIN_IMG_SIZE", 384),
        out_features=tuple(swin_raw.get("OUT_FEATURES", ("res2", "res3", "res4", "res5"))),
        use_checkpoint=swin_raw.get("USE_CHECKPOINT", False),
    )

    resnet_raw = model.get("RESNETS", {})
    resnet = ResNetConfig(
        depth=resnet_raw.get("DEPTH", 50),
        stem_out_channels=resnet_raw.get("STEM_OUT_CHANNELS", 64),
        stride_in_1x1=resnet_raw.get("STRIDE_IN_1X1", False),
        out_features=tuple(resnet_raw.get("OUT_FEATURES", ("res2", "res3", "res4", "res5"))),
        norm=resnet_raw.get("NORM", "SyncBN"),
    )

    pixel_decoder = PixelDecoderConfig(
        conv_dim=head.get("CONVS_DIM", 256),
        mask_dim=head.get("MASK_DIM", 256),
        norm=head.get("NORM", "GN"),
        transformer_in_features=_features(
            head.get("DEFORMABLE_TRANSFORMER_ENCODER_IN_FEATURES", ("res5",))
        ),
        in_features=_features(head.get("IN_FEATURES", ("res2", "res3", "res4", "res5"))),
        transformer_enc_layers=head.get("TRANSFORMER_ENC_LAYERS", 6),
        transformer_nheads=mf.get("NHEADS", 8),
        enc_n_points=head.get("DEFORMABLE_TRANSFORMER_ENCODER_N_POINTS", 4),
        common_stride=head.get("COMMON_STRIDE", 4),
        name=head.get("PIXEL_DECODER_NAME", "MSDeformAttnPixelDecoder"),
    )

    decoder = DecoderConfig(
        hidden_dim=mf.get("HIDDEN_DIM", 256),
        num_queries=mf.get("NUM_OBJECT_QUERIES", 100),
        nheads=mf.get("NHEADS", 8),
        dim_feedforward=mf.get("DIM_FEEDFORWARD", 2048),
        dec_layers=max(_int(mf.get("DEC_LAYERS", 2), 2) - 1, 1),
        dec_layers_total=_int(mf.get("DEC_LAYERS", 6), 6),
        enc_layers=_int(mf.get("ENC_LAYERS", 0), 0),
        pre_norm=mf.get("PRE_NORM", False),
        mask_dim=head.get("MASK_DIM", 256),
        enforce_input_project=mf.get("ENFORCE_INPUT_PROJ", False),
        num_feature_levels=len(head.get("DEFORMABLE_TRANSFORMER_ENCODER_IN_FEATURES", ("res5",))),
        ood_prediction=mf.get("DENSE_HYBRID_LOSS", False),
        name=mf.get("TRANSFORMER_DECODER_NAME", "MultiScaleMaskedTransformerDecoder"),
        # reference D2 default is "res5" (config.py:50); every shipped v2
        # config sets multi_scale_pixel_decoder explicitly, so a yaml that
        # omits the key is a v1-era config whose predictor reads a backbone
        # feature
        transformer_in_feature=mf.get("TRANSFORMER_IN_FEATURE", "res5"),
    )

    tst = mf.get("TEST", {})
    test_cfg = TestConfig(
        semantic_on=tst.get("SEMANTIC_ON", True),
        panoptic_on=tst.get("PANOPTIC_ON", False),
        instance_on=tst.get("INSTANCE_ON", False),
        sem_seg_postprocessing_before_inference=tst.get(
            "SEM_SEG_POSTPROCESSING_BEFORE_INFERENCE", False
        ),
        object_mask_threshold=tst.get("OBJECT_MASK_THRESHOLD", 0.8),
        overlap_threshold=tst.get("OVERLAP_THRESHOLD", 0.8),
        eval_period=_get(test, "EVAL_PERIOD", 5000),
        aug_enabled=_get(test, "AUG.ENABLED", False),
        aug_flip=_get(test, "AUG.FLIP", True),
        aug_min_sizes=tuple(_get(test, "AUG.MIN_SIZES", (512, 768, 1024, 1280, 1536, 1792))),
        aug_max_size=_get(test, "AUG.MAX_SIZE", 4096),
    )

    crop = inp.get("CROP", {})
    default_mst = tuple(int(x * 0.1 * 1024) for x in range(5, 21))
    mst = inp.get("MIN_SIZE_TRAIN", default_mst)
    if isinstance(mst, (int, float)):
        mst = (int(mst),)
    input_cfg = InputConfig(
        pixel_mean=tuple(model.get("PIXEL_MEAN", (123.675, 116.28, 103.53))),
        pixel_std=tuple(model.get("PIXEL_STD", (58.395, 57.12, 57.375))),
        size_divisibility=mf.get("SIZE_DIVISIBILITY", 32),
        min_size_test=inp.get("MIN_SIZE_TEST", 1024),
        max_size_test=inp.get("MAX_SIZE_TEST", 2048),
        image_format=inp.get("FORMAT", "RGB"),
        min_size_train=tuple(int(v) for v in mst),
        max_size_train=inp.get("MAX_SIZE_TRAIN", 4096),
        crop_enabled=crop.get("ENABLED", True),
        crop_size=tuple(_seq(crop.get("SIZE", (512, 1024)))),
        single_category_max_area=crop.get("SINGLE_CATEGORY_MAX_AREA", 1.0),
        color_aug_ssd=inp.get("COLOR_AUG_SSD", True),
        random_flip=inp.get("RANDOM_FLIP", "horizontal") != "none",
        train_size_divisibility=inp.get("SIZE_DIVISIBILITY", -1),
        dataset_mapper_name=inp.get("DATASET_MAPPER_NAME", "mask_former_semantic"),
        repeat_instance_masks=inp.get("REPEAT_INSTANCE_MASKS", 1),
        coco_root=inp.get("COCO_ROOT", "coco/"),
        coco_proxy_size=inp.get("COCO_PROXY_SIZE", 300),
        image_size=inp.get("IMAGE_SIZE", 1024),
        min_scale=inp.get("MIN_SCALE", 0.1),
        max_scale=inp.get("MAX_SCALE", 2.0),
    )

    ood = OODConfig(
        ood_label=inp.get("OOD_LABEL", 254),
        ood_prob=inp.get("OOD_PROB", 0.2),
        outlier_supervision=mf.get("OUTLIER_SUPERVISION", False),
        outlier_loss_target=mf.get("OUTLIER_LOSS_TARGET", "none"),
        score_norm=mf.get("SCORE_NORM", "none"),
        outlier_loss_func=mf.get("OUTLIER_LOSS_FUNC", "max"),
        inlier_upper_threshold=mf.get("INLIER_UPPER_THRESHOLD", 0.0),
        outlier_lower_threshold=mf.get("OUTLIER_LOWER_THRESHOLD", 5.0),
        outlier_weight=mf.get("OUTLIER_WEIGHT", 1.0),
        smoothness_loss=mf.get("SMOOTHNESS_LOSS", False),
        smoothness_score=mf.get("SMOOTHNESS_SCORE", "none"),
        smoothness_weight=mf.get("SMOOTHNESS_WEIGHT", 3.0e-6),
        sparsity_loss=mf.get("SPARSITY_LOSS", False),
        sparsity_weight=mf.get("SPARSITY_WEIGHT", 5.0e-4),
        gambler_loss=mf.get("GAMBLER_LOSS", False),
        gambler_weight=mf.get("GAMBLER_WEIGHT", 1.0),
        ood_reg=mf.get("PEBAL_OOD_REG", 0.1),
        pebal_reward=mf.get("PEBAL_REWARD", 4.5),
        densehybrid_loss=mf.get("DENSE_HYBRID_LOSS", False),
        densehybrid_beta=mf.get("DENSE_HYBRID_BETA", 0.03),
        densehybrid_weight=mf.get("DENSE_HYBRID_WEIGHT", 1.0),
    )

    loss = LossConfig(
        class_weight=mf.get("CLASS_WEIGHT", 2.0),
        mask_weight=mf.get("MASK_WEIGHT", 5.0),
        dice_weight=mf.get("DICE_WEIGHT", 5.0),
        no_object_weight=mf.get("NO_OBJECT_WEIGHT", 0.1),
        deep_supervision=mf.get("DEEP_SUPERVISION", True),
        train_num_points=mf.get("TRAIN_NUM_POINTS", 12544),
        oversample_ratio=mf.get("OVERSAMPLE_RATIO", 3.0),
        importance_sample_ratio=mf.get("IMPORTANCE_SAMPLE_RATIO", 0.75),
        matcher=mf.get("MATCHER", "HungarianMatcher"),
        use_point_rend=mf.get("USE_POINT_REND", False),
    )

    solver_cfg = SolverConfig(
        base_lr=solver.get("BASE_LR", 1e-4),
        weight_decay=solver.get("WEIGHT_DECAY", 0.05),
        weight_decay_embed=solver.get("WEIGHT_DECAY_EMBED", 0.0),
        weight_decay_norm=solver.get("WEIGHT_DECAY_NORM", 0.0),
        backbone_multiplier=solver.get("BACKBONE_MULTIPLIER", 0.1),
        clip_gradients=_get(solver, "CLIP_GRADIENTS.ENABLED", True),
        clip_value=_get(solver, "CLIP_GRADIENTS.CLIP_VALUE", 0.01),
        max_iter=solver.get("MAX_ITER", 90000),
        warmup_iters=solver.get("WARMUP_ITERS", 0),
        warmup_factor=solver.get("WARMUP_FACTOR", 1.0),
        poly_lr_power=solver.get("POLY_LR_POWER", 0.9),
        poly_lr_constant_ending=solver.get("POLY_LR_CONSTANT_ENDING", 0.0),
        ims_per_batch=solver.get("IMS_PER_BATCH", 16),
        amp=_get(solver, "AMP.ENABLED", True),
        num_workers=_get(raw, "DATALOADER.NUM_WORKERS", 4),
        freeze_backbone=model.get("FREEZE_BACKBONE", False),
        freeze_pixel_decoder=model.get("FREEZE_PIXEL_DECODER", False),
        freeze_transformer_decoder=model.get("FREEZE_TRANSFORMER_DECODER", False),
        freeze_transformer_decoder_except_mlp=model.get(
            "FREEZE_TRANSFORMER_DECODER_EXCEPT_MLP", False
        ),
        freeze_transformer_decoder_except_object_queries=model.get(
            "FREEZE_TRANSFORMER_DECODER_EXCEPT_OBJECT_QUERIES", False
        ),
    )

    ds_raw = raw.get("DATASETS", {})

    cfg = RbAConfig(
        backbone_name=backbone,
        sem_seg_head_name=head.get("NAME", "MaskFormerHead"),
        datasets_train=_strs(ds_raw.get("TRAIN", ("cityscapes_fine_sem_seg_train",))),
        datasets_test=_strs(ds_raw.get("TEST", ("cityscapes_fine_sem_seg_val",))),
        unseen_label_set=ds_raw.get("UNSEEN_LABEL_SET", ""),
        swin=swin,
        resnet=resnet,
        pixel_decoder=pixel_decoder,
        decoder=decoder,
        test=test_cfg,
        input=input_cfg,
        ood=ood,
        loss=loss,
        solver=solver_cfg,
        num_classes=head.get("NUM_CLASSES", 19),
    )
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    return cfg


# ---------------------------------------------------------------------------
# Native config serialization: compact YAML of non-default fields.  The
# shipped configs/ corpus is the reference corpus translated to this format
# (one flat section per sub-config), loadable with load_config().
# ---------------------------------------------------------------------------

def config_to_dict(cfg: RbAConfig) -> Dict[str, Any]:
    """RbAConfig → nested dict containing only non-default values."""
    default = RbAConfig()

    def diff(obj, ref):
        out = {}
        for f in dataclasses.fields(obj):
            v, r = getattr(obj, f.name), getattr(ref, f.name)
            if dataclasses.is_dataclass(v):
                sub = diff(v, r)
                if sub:
                    out[f.name] = sub
            elif v != r:
                out[f.name] = list(v) if isinstance(v, tuple) else v
        return out

    return diff(cfg, default)


def config_from_dict(d: Dict[str, Any]) -> RbAConfig:
    """Inverse of config_to_dict (missing keys keep dataclass defaults)."""

    def build(cls, sub: Dict[str, Any]):
        kwargs = {}
        hints = {f.name: f for f in dataclasses.fields(cls)}
        for k, v in sub.items():
            f = hints[k]
            if isinstance(v, dict):
                base = f.default_factory() if f.default_factory is not dataclasses.MISSING else f.default
                kwargs[k] = build(type(base), v)
            elif isinstance(v, list):
                kwargs[k] = tuple(v)
            else:
                kwargs[k] = v
        return cls(**kwargs)

    return build(RbAConfig, d)


def save_config(path: str, cfg: RbAConfig) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(config_to_dict(cfg), f, sort_keys=True)


def load_config(path: str, **overrides) -> RbAConfig:
    """Load either a native rba-tpu YAML (config_to_dict format) or a
    Detectron2 YAML (detected by its MODEL section / _BASE_ chain)."""
    with open(path) as f:
        raw = yaml.load(f, Loader=_D2YamlLoader) or {}
    if "MODEL" in raw or "_BASE_" in raw:
        return load_d2_config(path, **overrides)
    cfg = config_from_dict(raw)
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    return cfg


def fast_serving(cfg: RbAConfig) -> RbAConfig:
    """The promoted fast serving mode: bf16 pixel decoder + bf16 window-
    attention softmax (norms, sampling, and the score path stay fp32).

    Default for the serving entry points (bench.py, evalx.sweep, devtime
    --fast) per the checkpoint-weight numerics ablation (ABLATION.json,
    ``python -m rba_tpu.tools.ablation``): vs the parity mode it moves
    AUROC by ≤0.003 pts and AUPRC/FPR95 by ≤0.001 pts on a 16-image
    synthetic anomaly set scored with full-scale converted swin_b_1dl
    weights — two orders of magnitude inside the 0.1-pt budget.  The
    dataclass default stays parity (fp32 pixel decoder) because that is
    the reference's own semantics (msdeformattn.py:323-329 pins fp32
    under AMP) and what the golden tests certify.

    Also raises the one-hot deform dispatch cap to 256M elements (numerics-
    neutral — the one-hot path is exact vs the gather; measured wins at the
    multi-level shapes in tools/perf_deform_multilevel.py).  The cap stays
    conservative in the dataclass default because training saves the A
    matrices as autodiff residuals.

    sampling_dtype="bfloat16" materializes the one-hot deform row matrix in
    bf16 (fp32 in-register accumulation, bf16 MXU matmul with fp32 accum):
    41.2 → 40.6 ms fast-mode device time, and the checkpoint-weight ablation
    (ABLATION.json fast_bf16s) measures −0.059 AUROC pts vs the fp32 torch
    reference — marginally CLOSER to it than plain fast (−0.0596), with a
    smaller max per-pixel score delta (0.0306 vs 0.0321)."""
    return dataclasses.replace(
        cfg,
        pixel_decoder_dtype="bfloat16",
        fast_math=True,
        pixel_decoder=dataclasses.replace(
            cfg.pixel_decoder,
            sampling_onehot_cap=256 * 1024 * 1024,
            sampling_dtype="bfloat16",
        ),
    )


# Convenience presets matching the released checkpoints.
def swin_b_1dl() -> RbAConfig:
    return RbAConfig()


def swin_l_1dl() -> RbAConfig:
    return dataclasses.replace(
        RbAConfig(),
        swin=dataclasses.replace(SwinConfig(), embed_dim=192, num_heads=(6, 12, 24, 48)),
    )


def tiny_test_config(num_classes: int = 7) -> RbAConfig:
    """A miniature config for fast unit tests (CPU)."""
    return RbAConfig(
        swin=SwinConfig(
            embed_dim=32,
            depths=(2, 2),
            num_heads=(2, 4),
            window_size=4,
            out_features=("res2", "res3"),
        ),
        pixel_decoder=PixelDecoderConfig(
            conv_dim=64,
            mask_dim=64,
            transformer_in_features=("res3",),
            in_features=("res2", "res3"),
            transformer_enc_layers=2,
            transformer_nheads=4,
            transformer_dim_feedforward=128,
            common_stride=4,
        ),
        decoder=DecoderConfig(
            hidden_dim=64,
            num_queries=10,
            nheads=4,
            dim_feedforward=128,
            dec_layers=2,
            mask_dim=64,
            num_feature_levels=1,
        ),
        num_classes=num_classes,
        compute_dtype="float32",
    )
