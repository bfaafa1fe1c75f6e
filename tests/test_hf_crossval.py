"""Cross-validation against HuggingFace ``transformers`` Mask2Former.

Every other golden test in this suite compares against torch reference
models re-built in tests/torch_refs.py from the reference's source
(/root/reference/mask2former/modeling/...).  A shared misreading there
would pass those goldens — so here the oracle is a genuinely INDEPENDENT
implementation: ``transformers.Mask2FormerForUniversalSegmentation``,
HF's port of the same upstream architecture the reference builds on.

Weights flow HF model → convert/hf_mapping.hf_mask2former_to_d2 (key
renames + q/k/v fusion) → the production D2 converter
(convert/d2_mapping.py) → our param tree; then both models run the same
input and the outputs must agree to float32 round-off.  This covers, in
one shot: Swin (window partition/shift/rel-pos/patch-merge/padding), the
3-level MSDeformAttn pixel decoder (encoder, FPN tail, mask features),
the masked-attention transformer decoder (masked cross-attn with the
row-unmask rule, round-robin levels), and both prediction heads.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from rba_tpu.convert.hf_mapping import (  # noqa: E402
    convert_hf_checkpoint,
    rba_config_from_hf,
)


def _tiny_hf_model(hidden_dim=32, decoder_layers=3, num_labels=7, seed=0):
    from transformers import (
        Mask2FormerConfig,
        Mask2FormerForUniversalSegmentation,
        SwinConfig,
    )

    torch.manual_seed(seed)
    bb = SwinConfig(
        image_size=64,
        patch_size=4,
        embed_dim=16,
        depths=[1, 1, 2, 1],  # stage 3 has a shifted block
        num_heads=[1, 2, 4, 8],
        window_size=4,
        out_features=["stage1", "stage2", "stage3", "stage4"],
        drop_path_rate=0.0,
    )
    hcfg = Mask2FormerConfig(
        backbone_config=bb,
        feature_size=32,
        mask_feature_size=32,
        hidden_dim=hidden_dim,
        encoder_layers=2,
        decoder_layers=decoder_layers,
        num_queries=6,
        num_labels=num_labels,
        dim_feedforward=48,
        encoder_feedforward_dim=64,
        num_attention_heads=4,
        dropout=0.0,
    )
    return Mask2FormerForUniversalSegmentation(hcfg).eval()


def _image(h, w, seed=1):
    return np.random.RandomState(seed).uniform(-1, 1, (1, h, w, 3)).astype(np.float32)


def test_config_mapping():
    m = _tiny_hf_model(hidden_dim=24, decoder_layers=4, num_labels=5)
    cfg = rba_config_from_hf(m.config)
    assert cfg.swin.embed_dim == 16 and cfg.swin.depths == (1, 1, 2, 1)
    assert cfg.swin.window_size == 4 and cfg.swin.num_heads == (1, 2, 4, 8)
    assert cfg.pixel_decoder.conv_dim == 32 and cfg.pixel_decoder.mask_dim == 32
    assert cfg.pixel_decoder.transformer_in_features == ("res3", "res4", "res5")
    assert cfg.pixel_decoder.transformer_enc_layers == 2
    # HF decoder_layers carries the reference's raw DEC_LAYERS semantics
    assert cfg.decoder.dec_layers == 3
    assert cfg.decoder.hidden_dim == 24 and cfg.decoder.num_queries == 6
    assert cfg.num_classes == 5


def test_swin_backbone_matches_hf():
    m = _tiny_hf_model()
    params, cfg = convert_hf_checkpoint(m)
    img = _image(128, 128)
    with torch.no_grad():
        hf = m.model.pixel_level_module.encoder(
            torch.from_numpy(img.transpose(0, 3, 1, 2))
        )
    from rba_tpu.models.backbones import build_backbone

    _, bapply, _ = build_backbone(cfg)
    feats = bapply(params["backbone"], jnp.asarray(img), jnp.float32)
    for i, k in enumerate(["res2", "res3", "res4", "res5"]):
        got = np.asarray(feats[k])
        want = hf.feature_maps[i].numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def _full_model_case(m, h, w, seed):
    params, cfg = convert_hf_checkpoint(m)
    img = _image(h, w, seed)
    with torch.no_grad():
        hf = m(pixel_values=torch.from_numpy(img.transpose(0, 3, 1, 2)))
    from rba_tpu.models.maskformer import maskformer_forward

    ours = maskformer_forward(params, cfg, jnp.asarray(img), need_aux=False)
    np.testing.assert_allclose(
        np.asarray(ours["pred_logits"]),
        hf.class_queries_logits.numpy(),
        atol=2e-5,
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours["pred_masks"]),
        hf.masks_queries_logits.numpy(),
        atol=2e-5,
        rtol=1e-4,
    )


def test_full_model_matches_hf():
    # 128x128: every stage resolution is a window multiple (pure math path)
    _full_model_case(_tiny_hf_model(), 128, 128, seed=1)


def test_full_scale_swin_b_matches_hf():
    """The released Swin-B architecture at full width/depth vs the HF oracle:
    window 12 with real-valued 23x23 rel-pos tables, embed 128, depths
    2/2/18/2, heads 4/8/16/32, conv/mask/hidden dim 256, 6 deformable
    encoder layers, one masked decoder layer (decoder_layers=2), Q=100,
    19 classes (spec: /root/reference/ckpts/swin_b_1dl/config.yaml, except
    the 1-level deformable encoder — HF hardcodes 3 levels, so this runs
    the 3-level train-config variant).  384x384 keeps every stage grid at
    or above the window so HF's dynamic window-shrink rule (absent from the
    reference's pad-style Swin) never engages."""
    from transformers import (
        Mask2FormerConfig,
        Mask2FormerForUniversalSegmentation,
        SwinConfig,
    )

    torch.manual_seed(0)
    bb = SwinConfig(
        image_size=384,
        patch_size=4,
        embed_dim=128,
        depths=[2, 2, 18, 2],
        num_heads=[4, 8, 16, 32],
        window_size=12,
        out_features=["stage1", "stage2", "stage3", "stage4"],
        drop_path_rate=0.0,
    )
    hcfg = Mask2FormerConfig(
        backbone_config=bb,
        feature_size=256,
        mask_feature_size=256,
        hidden_dim=256,
        encoder_layers=6,
        decoder_layers=2,
        num_queries=100,
        num_labels=19,
        dim_feedforward=2048,
        encoder_feedforward_dim=1024,
        num_attention_heads=8,
        dropout=0.0,
    )
    m = Mask2FormerForUniversalSegmentation(hcfg).eval()
    with torch.no_grad():  # exercise the 23x23 rel-pos tables with real values
        for mod in m.modules():
            if hasattr(mod, "relative_position_bias_table"):
                mod.relative_position_bias_table.normal_(0, 0.5)
    _full_model_case(m, 384, 384, seed=1)


def test_mix_transformer_matches_hf_segformer():
    """MixTransformer (the reference's SegFormer-MiT backbone) vs HF's
    independent Segformer port, at mit_b0 geometry: overlapping patch
    embeds, SR-attention (separate HF k/v fused back to the original's kv),
    dwconv MLPs, per-stage norms.  hf_segformer_to_d2 also makes the
    nvidia/mit-b{0..5} hub checkpoints loadable."""
    from transformers import SegformerConfig, SegformerModel

    from rba_tpu.convert.d2_mapping import convert_mit_backbone
    from rba_tpu.convert.hf_mapping import hf_segformer_to_d2
    from rba_tpu.models.mix_transformer import MIT_VARIANTS, mit_apply

    torch.manual_seed(0)
    c = SegformerConfig(
        num_encoder_blocks=4,
        depths=[2, 2, 2, 2],
        sr_ratios=[8, 4, 2, 1],
        hidden_sizes=[32, 64, 160, 256],
        patch_sizes=[7, 3, 3, 3],
        strides=[4, 2, 2, 2],
        num_attention_heads=[1, 2, 5, 8],
        mlp_ratios=[4, 4, 4, 4],
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0,
        reshape_last_stage=True,
    )
    m = SegformerModel(c).eval()
    params = convert_mit_backbone(hf_segformer_to_d2(m.state_dict()))
    img = _image(64, 96)
    with torch.no_grad():
        hf = m(torch.from_numpy(img.transpose(0, 3, 1, 2)), output_hidden_states=True)
    feats = mit_apply(
        params, MIT_VARIANTS["mit_b0"], jnp.asarray(img), compute_dtype=jnp.float32
    )
    for i, k in enumerate(["res2", "res3", "res4", "res5"]):
        np.testing.assert_allclose(
            np.asarray(feats[k]),
            hf.hidden_states[i].numpy().transpose(0, 2, 3, 1),
            atol=1e-4,
            rtol=1e-4,
        )


def _tiny_hf_maskformer_v1(seed=0):
    from transformers import MaskFormerConfig, MaskFormerForInstanceSegmentation
    from transformers.models.maskformer import MaskFormerSwinConfig

    torch.manual_seed(seed)
    bb = MaskFormerSwinConfig(
        image_size=64,
        patch_size=4,
        embed_dim=16,
        depths=[1, 1, 2, 1],
        num_heads=[1, 2, 4, 8],
        window_size=4,
        drop_path_rate=0.0,
        out_features=["stage1", "stage2", "stage3", "stage4"],
    )
    hcfg = MaskFormerConfig(
        backbone_config=bb, num_labels=7, fpn_feature_size=32, mask_feature_size=32
    )
    hcfg.decoder_config.decoder_layers = 2
    hcfg.decoder_config.d_model = 32
    hcfg.decoder_config.decoder_ffn_dim = 64
    hcfg.decoder_config.decoder_attention_heads = 4
    hcfg.decoder_config.dropout = 0.0
    hcfg.decoder_config.attention_dropout = 0.0
    m = MaskFormerForInstanceSegmentation(hcfg).eval()

    from rba_tpu.config import DecoderConfig, PixelDecoderConfig, RbAConfig, SwinConfig

    cfg = RbAConfig(
        backbone_name="swin",
        swin=SwinConfig(
            patch_size=4, embed_dim=16, depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8),
            window_size=4, drop_path_rate=0.0,
        ),
        pixel_decoder=PixelDecoderConfig(name="BasePixelDecoder", conv_dim=32, mask_dim=32),
        decoder=DecoderConfig(
            name="StandardTransformerDecoder", hidden_dim=32,
            num_queries=m.config.decoder_config.num_queries, nheads=4,
            dim_feedforward=64, dec_layers_total=2, enc_layers=0, pre_norm=False,
            mask_dim=32, transformer_in_feature="res5",
        ),
        num_classes=7,
        compute_dtype="float32",
        pixel_decoder_dtype="float32",
    )
    from rba_tpu.convert.d2_mapping import convert_d2_state_dict
    from rba_tpu.convert.hf_mapping import hf_maskformer_v1_to_d2

    params = convert_d2_state_dict(hf_maskformer_v1_to_d2(m.state_dict()), cfg)
    return m, params, cfg


def _v1_case(h, w, seed):
    from rba_tpu.models.maskformer import maskformer_forward

    m, params, cfg = _tiny_hf_maskformer_v1()
    img = _image(h, w, seed)
    with torch.no_grad():
        hf = m(pixel_values=torch.from_numpy(img.transpose(0, 3, 1, 2)))
    ours = maskformer_forward(params, cfg, jnp.asarray(img), need_aux=False)
    np.testing.assert_allclose(
        np.asarray(ours["pred_logits"]), hf.class_queries_logits.numpy(),
        atol=2e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours["pred_masks"]), hf.masks_queries_logits.numpy(),
        atol=2e-5, rtol=1e-4,
    )


def test_maskformer_v1_matches_hf():
    """The v1 MaskFormer path (pad-style Swin -> FPN BasePixelDecoder ->
    DETR StandardTransformerDecoder) vs HF MaskFormerForInstanceSegmentation,
    whose maskformer_swin replicates the ORIGINAL D2 pad-style Swin."""
    _v1_case(128, 160, seed=1)


def test_maskformer_v1_subwindow_padding_matches_hf():
    """48x64 -> stage grids 12x16 / 6x8 / 3x4 / 2x2: the last two stages are
    SMALLER than the window, so the D2 pad behavior (zero-pad to one window,
    pad tokens participate as unmasked keys) is exercised — exactly the case
    where HF's regular modeling_swin diverges (it shrinks the window) and
    the released D2 checkpoints do not."""
    _v1_case(48, 64, seed=2)


def test_full_model_matches_hf_padded_and_projected():
    # 132x164 -> stage grids 33x41 / 17x21 / 9x11 / 5x6: every stage >= the
    # window but none divisible, so window padding + shifted-window masks are
    # exercised at all four stages; hidden_dim 24 != feature_size 32 also
    # engages the predictor's per-level input projections (harvested from the
    # live HF module around HF's unregistered-list quirk).
    m = _tiny_hf_model(hidden_dim=24, decoder_layers=4, num_labels=5, seed=3)
    _full_model_case(m, 132, 164, seed=5)


# ---------------------------------------------------------------------------
# ViTDet backbone vs HF VitDetModel (independent port of the same upstream)
# ---------------------------------------------------------------------------

def _tiny_hf_vitdet(seed=0, image_size=48, pretrain=32):
    from transformers import VitDetConfig, VitDetModel

    torch.manual_seed(seed)
    hcfg = VitDetConfig(
        hidden_size=32,
        num_hidden_layers=4,
        num_attention_heads=4,
        window_block_indices=[0, 2],
        residual_block_indices=[1],
        use_relative_position_embeddings=True,
        window_size=2,
        pretrain_image_size=pretrain,
        image_size=image_size,
        patch_size=16,
        drop_path_rate=0.0,
    )
    m = VitDetModel(hcfg).eval()
    # HF zero-inits pos_embed and the rel-pos tables — randomize EVERY
    # parameter so the comparison actually exercises them.
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn_like(p) * 0.05)
    return m


def _vitdet_case(image_hw, seed):
    from rba_tpu.convert.d2_mapping import convert_vit_backbone
    from rba_tpu.convert.hf_mapping import hf_vitdet_to_d2
    from rba_tpu.models.vit import ViTConfig, vit_apply

    m = _tiny_hf_vitdet(seed=seed)
    params = convert_vit_backbone(hf_vitdet_to_d2(m.state_dict()))
    cfg = ViTConfig(
        patch_size=16,
        embed_dim=32,
        depth=4,
        num_heads=4,
        window_size=2,
        window_block_indexes=(0, 2),
        residual_block_indexes=(1,),
        pretrain_img_size=32,
        pretrain_use_cls_token=True,  # HF stores n^2+1 and strips the cls slot
    )
    h, w = image_hw
    img = _image(h, w, seed=seed + 10)
    with torch.no_grad():
        hf = m(torch.from_numpy(img.transpose(0, 3, 1, 2))).last_hidden_state
    ours = vit_apply(params, cfg, jnp.asarray(img), compute_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(ours["last_feat"]),
        hf.numpy().transpose(0, 2, 3, 1),
        atol=2e-5,
        rtol=1e-4,
    )


def test_vitdet_backbone_matches_hf():
    """Grid 3x3 from a 2x2 pretrain grid: the bicubic abs-pos resample path
    (get_absolute_positions, align_corners=False) + window padding 3->4 on
    the ws=2 window blocks + the residual bottleneck block."""
    _vitdet_case((48, 48), seed=3)


def test_vitdet_backbone_matches_hf_relpos_resample():
    """Grid 2x2: global-block rel-pos tables are stored at the 3x3
    image-size grid (2*3-1 = 5 entries) so q_size 2 forces the linear
    rel-pos resample (get_rel_pos) on both sides; abs-pos needs no resample."""
    _vitdet_case((32, 32), seed=4)


# ---------------------------------------------------------------------------
# Core op: multi-scale deformable attention sampling vs HF's independent
# pure-torch implementation (transformers/models/mask2former/
# modeling_mask2former.py::multi_scale_deformable_attention).  The in-repo
# goldens for this op (tests/test_deform_sampling.py) compare against a
# torch_refs re-build of the reference's grid_sample fallback
# (/root/reference/.../ops/functions/ms_deform_attn_func.py:52-72); a shared
# misreading of grid_sample align_corners / padding semantics would pass
# those.  HF's function was written independently and has the exact same
# (value, spatial_shapes, locations, weights) -> (B, Lq, M*D) contract.
# ---------------------------------------------------------------------------


def _deform_inputs(seed, n=2, m=4, d=8, p=3, lq=9, shapes=((6, 9), (3, 5), (2, 2))):
    r = np.random.RandomState(seed)
    s = sum(h * w for h, w in shapes)
    value = r.randn(n, s, m, d).astype(np.float32)
    # include out-of-bounds locations to pin the zero-padding rule
    loc = r.uniform(-0.25, 1.25, size=(n, lq, m, len(shapes), p, 2)).astype(np.float32)
    aw = r.rand(n, lq, m, len(shapes), p).astype(np.float32)
    aw = aw / aw.sum(axis=(3, 4), keepdims=True)
    return value, loc, aw, shapes


def _hf_deform(value, loc, aw, shapes):
    from transformers.models.mask2former.modeling_mask2former import (
        multi_scale_deformable_attention,
    )

    with torch.no_grad():
        out = multi_scale_deformable_attention(
            torch.from_numpy(value),
            list(shapes),
            torch.from_numpy(loc),
            torch.from_numpy(aw),
        )
    return out.numpy()


@pytest.mark.parametrize(
    "method", ["gather", "onehot", "takealong"], ids=["patch-gather", "onehot-matmul", "take-along"]
)
def test_deform_core_matches_hf(method):
    """All three TPU lowerings (deform_sampling.py) against the HF oracle at
    a 3-level shape with out-of-bounds sample points."""
    from rba_tpu.ops.deform_sampling import ms_deform_attn_core

    value, loc, aw, shapes = _deform_inputs(seed=0)
    want = _hf_deform(value, loc, aw, shapes)
    kw = dict(method=method)
    if method == "takealong":
        kw = dict(method="gather", use_patch_gather=False)
    got = np.asarray(
        ms_deform_attn_core(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(aw), **kw)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("d", [5, 16, 33])
def test_deform_core_matches_hf_channel_sizes(d):
    """Odd / non-tile channel counts, mirroring the reference's ops/test.py
    channel sweep — but with HF as the oracle."""
    from rba_tpu.ops.deform_sampling import ms_deform_attn_core

    value, loc, aw, shapes = _deform_inputs(seed=d, d=d, shapes=((4, 7),), p=4)
    want = _hf_deform(value, loc, aw, shapes)
    got = np.asarray(
        ms_deform_attn_core(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(aw))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_deform_core_grads_match_hf():
    """Backward parity: JAX autodiff of our lowering vs torch autograd of
    HF's grid_sample formulation, for all three inputs.  This is the
    cross-framework analogue of the reference's handwritten-CUDA-backward
    gradcheck (ops/test.py:60-89)."""
    from transformers.models.mask2former.modeling_mask2former import (
        multi_scale_deformable_attention,
    )

    from rba_tpu.ops.deform_sampling import ms_deform_attn_core

    value, loc, aw, shapes = _deform_inputs(seed=7, n=1, m=2, d=4, p=2, lq=5,
                                            shapes=((5, 8), (3, 3)))
    tv = torch.from_numpy(value).requires_grad_(True)
    tl = torch.from_numpy(loc).requires_grad_(True)
    ta = torch.from_numpy(aw).requires_grad_(True)
    (multi_scale_deformable_attention(tv, list(shapes), tl, ta) ** 2).sum().backward()

    def f(v, l, a):
        return jnp.sum(ms_deform_attn_core(v, shapes, l, a) ** 2)

    gv, gl, ga = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(aw)
    )
    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), rtol=1e-4, atol=1e-4)
    # grid_sample's backward produces zero location-gradient for samples that
    # land outside the padded map, matching the where-mask in our forward.
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ga), ta.grad.numpy(), rtol=1e-4, atol=1e-4)
