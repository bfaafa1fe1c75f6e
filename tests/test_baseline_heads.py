"""Baseline heads: FPN pixel decoders, MaskFormer-v1 standard decoder,
per-pixel baseline heads (simple + Plus), and their SEM_SEG_HEAD.NAME /
PIXEL_DECODER_NAME registry dispatch.

Reference: /root/reference/mask2former/modeling/pixel_decoder/fpn.py,
meta_arch/per_pixel_baseline.py, transformer_decoder/
maskformer_transformer_decoder.py.
"""
import dataclasses

import numpy as np
import torch

import jax
import jax.numpy as jnp

from rba_tpu.config import tiny_test_config
from rba_tpu.models.baseline_heads import (
    build_pixel_decoder,
    fpn_pixel_decoder_apply,
    fpn_pixel_decoder_init,
    per_pixel_head_apply,
    per_pixel_head_init,
    per_pixel_losses,
    per_pixel_plus_head_apply,
    per_pixel_plus_head_init,
    standard_decoder_apply,
    standard_decoder_init,
    transformer_encoder_pixel_decoder_apply,
    transformer_encoder_pixel_decoder_init,
)
from tests.test_decoder import t2j_linear, t2j_ln, t2j_mha


def _feats(cfg):
    return {
        "res2": jnp.ones((2, 16, 24, 32)),
        "res3": jnp.ones((2, 8, 12, 64)),
    }


def _fpn_cfg():
    base = tiny_test_config()
    return dataclasses.replace(
        base, pixel_decoder=dataclasses.replace(base.pixel_decoder, name="BasePixelDecoder")
    )


def test_fpn_pixel_decoder():
    cfg = tiny_test_config()
    params = fpn_pixel_decoder_init(
        jax.random.PRNGKey(0), cfg.pixel_decoder, cfg.swin.out_channels
    )
    mask_features, enc, ms = fpn_pixel_decoder_apply(params, cfg.pixel_decoder, _feats(cfg))
    assert mask_features.shape == (2, 16, 24, cfg.pixel_decoder.mask_dim)
    assert enc is None
    assert ms[0].shape[1:3] == (8, 12)  # lowest-res first
    assert np.isfinite(np.asarray(mask_features)).all()


def test_fpn_upsample_is_nearest(rng):
    """The FPN top-down upsample must be nearest (fpn.py:150), matching torch
    F.interpolate(mode='nearest')."""
    from rba_tpu.ops.resize import resize_nearest_nhwc

    x = rng.randn(1, 5, 7, 3).astype(np.float32)
    got = np.asarray(resize_nearest_nhwc(jnp.asarray(x), (11, 13)))
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(11, 13), mode="nearest"
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(got, want)


def test_transformer_encoder_pixel_decoder():
    cfg = tiny_test_config()
    params = transformer_encoder_pixel_decoder_init(
        jax.random.PRNGKey(0), cfg, cfg.swin.out_channels
    )
    mask_features, enc, ms = transformer_encoder_pixel_decoder_apply(params, cfg, _feats(cfg))
    assert mask_features.shape == (2, 16, 24, cfg.pixel_decoder.mask_dim)
    assert enc is not None and enc.shape == (2, 8, 12, cfg.pixel_decoder.conv_dim)
    assert ms[0].shape[1:3] == (8, 12)
    assert np.isfinite(np.asarray(mask_features)).all()


def test_standard_decoder():
    cfg = tiny_test_config()
    params = standard_decoder_init(jax.random.PRNGKey(0), cfg, in_channels=64,
                                   enc_layers=1, dec_layers=2)
    x = jnp.ones((2, 8, 12, 64))
    mask_features = jnp.ones((2, 16, 24, cfg.decoder.mask_dim))
    out = standard_decoder_apply(params, cfg, x, mask_features, deep_supervision=False)
    assert out["pred_logits"].shape == (2, cfg.decoder.num_queries, cfg.num_classes + 1)
    assert out["pred_masks"].shape == (2, cfg.decoder.num_queries, 16, 24)
    assert out["aux_outputs"] == []


def _load_torch_standard(td, enc_layers, dec_layers, mask_classification):
    params = {
        "query_embed": jnp.asarray(td.query_embed.weight.detach().numpy()),
        "input_proj": {
            "kernel": jnp.asarray(
                td.input_proj.weight.detach().numpy().transpose(2, 3, 1, 0)
            ),
            "bias": jnp.asarray(td.input_proj.bias.detach().numpy()),
        },
        "enc_layers": [
            {
                "attn": t2j_mha(td.enc_self[i]),
                "norm1": t2j_ln(td.enc_n1[i]),
                "linear1": t2j_linear(td.enc_l1[i]),
                "linear2": t2j_linear(td.enc_l2[i]),
                "norm2": t2j_ln(td.enc_n2[i]),
            }
            for i in range(enc_layers)
        ],
        "dec_layers": [
            {
                "self_attn": t2j_mha(td.dec_self[i]),
                "norm1": t2j_ln(td.dec_n1[i]),
                "cross_attn": t2j_mha(td.dec_cross[i]),
                "norm2": t2j_ln(td.dec_n2[i]),
                "linear1": t2j_linear(td.dec_l1[i]),
                "linear2": t2j_linear(td.dec_l2[i]),
                "norm3": t2j_ln(td.dec_n3[i]),
            }
            for i in range(dec_layers)
        ],
        "decoder_norm": t2j_ln(td.decoder_norm),
        "mask_embed": {"layers": [t2j_linear(m) for m in td.mask_mlp]},
    }
    if getattr(td, "encoder_norm", None) is not None:
        params["encoder_norm"] = t2j_ln(td.encoder_norm)
    if mask_classification:
        params["class_embed"] = t2j_linear(td.class_embed)
    return params


def test_standard_decoder_deep_supervision_golden(rng):
    """Full torch parity for the v1 decoder with deep supervision, in both
    class modes (mask_classification=False is the PerPixelBaselinePlusHead
    predictor, reference per_pixel_baseline.py:295-299) and both norm
    placements (PRE_NORM pre-norm layers + final encoder LayerNorm,
    reference transformer.py:37)."""
    from tests.torch_refs import TorchStandardDecoder

    in_ch, hd, nh, ff, nq, md, nc = 48, 32, 4, 64, 6, 32, 5
    enc_l, dec_l = 1, 3
    h, w = 8, 12
    x = rng.randn(2, in_ch, h, w).astype(np.float32)
    mask_features = rng.randn(2, md, 16, 24).astype(np.float32)

    for mask_classification, pre_norm in (
        (True, False), (False, False), (True, True),
    ):
        td = TorchStandardDecoder(
            in_ch, hd, nh, ff, enc_l, dec_l, nq, md,
            num_classes=nc if mask_classification else None,
            normalize_before=pre_norm,
        )
        with torch.no_grad():
            td.query_embed.weight.normal_(0, 0.5)
        masks_t, logits_t = td(torch.from_numpy(x), torch.from_numpy(mask_features))

        base = tiny_test_config(num_classes=nc)
        cfg = dataclasses.replace(
            base,
            decoder=dataclasses.replace(
                base.decoder, hidden_dim=hd, num_queries=nq, nheads=nh,
                dim_feedforward=ff, mask_dim=md,
                enc_layers=enc_l, dec_layers_total=dec_l, pre_norm=pre_norm,
            ),
        )
        params = _load_torch_standard(td, enc_l, dec_l, mask_classification)
        out = standard_decoder_apply(
            params, cfg,
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(mask_features.transpose(0, 2, 3, 1)),
            deep_supervision=True,
        )
        np.testing.assert_allclose(
            np.asarray(out["pred_masks"]), masks_t[-1].detach().numpy(),
            rtol=1e-4, atol=1e-4,
        )
        assert len(out["aux_outputs"]) == dec_l - 1
        for i, aux in enumerate(out["aux_outputs"]):
            np.testing.assert_allclose(
                np.asarray(aux["pred_masks"]), masks_t[i].detach().numpy(),
                rtol=1e-4, atol=1e-4,
            )
        if mask_classification:
            np.testing.assert_allclose(
                np.asarray(out["pred_logits"]), logits_t[-1].detach().numpy(),
                rtol=1e-4, atol=1e-4,
            )
        else:
            assert "pred_logits" not in out
            assert all(set(a) == {"pred_masks"} for a in out["aux_outputs"])


def test_per_pixel_head():
    cfg = _fpn_cfg()
    params = per_pixel_head_init(jax.random.PRNGKey(0), cfg, cfg.swin.out_channels)
    logits = per_pixel_head_apply(params, cfg, _feats(cfg))
    assert logits.shape == (2, cfg.num_classes, 16, 24)


def test_per_pixel_plus_head():
    base = tiny_test_config()
    cfg = dataclasses.replace(
        base,
        sem_seg_head_name="PerPixelBaselinePlusHead",
        pixel_decoder=dataclasses.replace(
            base.pixel_decoder, name="TransformerEncoderPixelDecoder"
        ),
        decoder=dataclasses.replace(
            base.decoder,
            transformer_in_feature="transformer_encoder",
            num_queries=base.num_classes,  # Q = K: pred_masks are class logits
            dec_layers_total=2,
        ),
    )
    params = per_pixel_plus_head_init(jax.random.PRNGKey(0), cfg, cfg.swin.out_channels)
    logits, aux = per_pixel_plus_head_apply(params, cfg, _feats(cfg))
    assert logits.shape == (2, cfg.num_classes, 16, 24)
    assert len(aux) == 1  # dec_layers_total - 1 deep-supervision outputs
    assert aux[0]["pred_masks"].shape == logits.shape


def _head_combo_cfg(head_name, pd_name):
    base = tiny_test_config()
    in_feat = (
        "transformer_encoder" if pd_name == "TransformerEncoderPixelDecoder"
        else "res3"
    )
    return dataclasses.replace(
        base,
        sem_seg_head_name=head_name,
        pixel_decoder=dataclasses.replace(base.pixel_decoder, name=pd_name),
        decoder=dataclasses.replace(
            base.decoder,
            transformer_in_feature=in_feat,
            num_queries=base.num_classes,
            dec_layers_total=2,
        ),
    )


def test_head_dispatch_end_to_end(rng):
    """Every SEM_SEG_HEAD.NAME x PIXEL_DECODER_NAME combination is selectable
    by config and runs end-to-end through maskformer_infer + the head losses
    (VERDICT r2 task 2)."""
    from rba_tpu.models.maskformer import maskformer_infer, maskformer_init, preprocess
    from rba_tpu.models.maskformer import per_pixel_forward

    img = (rng.rand(1, 32, 32, 3) * 255).astype(np.float32)
    targets = rng.randint(0, 7, (1, 32, 32)).astype(np.int32)
    targets[0, :4] = 255  # ignore region

    combos = [
        ("MaskFormerHead", "BasePixelDecoder"),
        ("MaskFormerHead", "TransformerEncoderPixelDecoder"),
        ("PerPixelBaselineHead", "MSDeformAttnPixelDecoder"),
        ("PerPixelBaselineHead", "BasePixelDecoder"),
        ("PerPixelBaselinePlusHead", "BasePixelDecoder"),
        ("PerPixelBaselinePlusHead", "TransformerEncoderPixelDecoder"),
    ]
    for head_name, pd_name in combos:
        cfg = _head_combo_cfg(head_name, pd_name)
        params = maskformer_init(jax.random.PRNGKey(0), cfg)
        out = maskformer_infer(params, cfg, jnp.asarray(img))
        assert out["sem_seg"].shape == (1, cfg.num_classes, 32, 32), (head_name, pd_name)
        assert out["rba"].shape == (1, 32, 32)
        assert np.isfinite(np.asarray(out["sem_seg"])).all(), (head_name, pd_name)
        if head_name != "MaskFormerHead":
            logits, aux = per_pixel_forward(params, cfg, preprocess(cfg, jnp.asarray(img)))
            losses = per_pixel_losses(
                cfg, jax.random.PRNGKey(1), logits, aux, jnp.asarray(targets)
            )
            assert np.isfinite(float(losses["loss_sem_seg"]))
            if head_name == "PerPixelBaselinePlusHead":
                assert "loss_sem_seg_0" in losses


def test_per_pixel_point_rend_loss(rng):
    """Point-rend CE variant (USE_POINT_REND) runs and is finite; dense CE
    against a torch cross_entropy oracle."""
    base = _fpn_cfg()
    cfg = dataclasses.replace(
        base, loss=dataclasses.replace(base.loss, use_point_rend=True,
                                       train_num_points=64),
    )
    logits = jnp.asarray(rng.randn(2, 7, 8, 8).astype(np.float32))
    targets = rng.randint(0, 7, (2, 32, 32)).astype(np.int32)
    targets[:, :3] = 255
    losses = per_pixel_losses(cfg, jax.random.PRNGKey(0), logits, [], jnp.asarray(targets))
    assert np.isfinite(float(losses["loss_sem_seg"]))

    # dense path == torch F.cross_entropy(ignore_index=255) on x4-upsampled logits
    dense_cfg = _fpn_cfg()
    losses_d = per_pixel_losses(
        dense_cfg, jax.random.PRNGKey(0), logits, [], jnp.asarray(targets)
    )
    up = torch.nn.functional.interpolate(
        torch.from_numpy(np.asarray(logits)), scale_factor=4, mode="bilinear",
        align_corners=False,
    )
    want = torch.nn.functional.cross_entropy(
        up, torch.from_numpy(targets).long(), ignore_index=255
    ).item()
    np.testing.assert_allclose(float(losses_d["loss_sem_seg"]), want, rtol=1e-5)


def test_per_pixel_loss_drops_all_out_of_range_labels(rng):
    """Labels >= K that are NOT the ignore value (e.g. ood_label=254 from
    the coco-mix mappers) must be excluded, not folded mod K toward an
    arbitrary inlier class — the reference F.cross_entropy(ignore_index=255)
    rejects out-of-range targets outright.  Both the dense and the
    point-rend path must treat 254 exactly like 255."""
    logits = jnp.asarray(rng.randn(2, 7, 8, 8).astype(np.float32))
    targets = rng.randint(0, 7, (2, 32, 32)).astype(np.int32)
    targets[:, :3] = 254  # ood_label
    targets[:, 3:5] = 255  # ignore
    t254 = jnp.asarray(targets)
    t255 = jnp.asarray(np.where(targets == 254, 255, targets))

    dense_cfg = _fpn_cfg()
    a = float(per_pixel_losses(dense_cfg, jax.random.PRNGKey(0), logits, [], t254)["loss_sem_seg"])
    b = float(per_pixel_losses(dense_cfg, jax.random.PRNGKey(0), logits, [], t255)["loss_sem_seg"])
    np.testing.assert_allclose(a, b, rtol=1e-6)

    pr_cfg = dataclasses.replace(
        dense_cfg, loss=dataclasses.replace(dense_cfg.loss, use_point_rend=True,
                                            train_num_points=64),
    )
    a = float(per_pixel_losses(pr_cfg, jax.random.PRNGKey(0), logits, [], t254)["loss_sem_seg"])
    b = float(per_pixel_losses(pr_cfg, jax.random.PRNGKey(0), logits, [], t255)["loss_sem_seg"])
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_build_pixel_decoder_dispatch():
    cfg = tiny_test_config()
    for name in ("MSDeformAttnPixelDecoder", "BasePixelDecoder",
                 "TransformerEncoderPixelDecoder"):
        c = dataclasses.replace(
            cfg, pixel_decoder=dataclasses.replace(cfg.pixel_decoder, name=name)
        )
        init, apply = build_pixel_decoder(c)
        p = init(jax.random.PRNGKey(0), cfg.swin.out_channels)
        mf, enc, ms = apply(p, _feats(cfg), jnp.float32)
        assert mf.shape[-1] == cfg.pixel_decoder.mask_dim


def _export_standard_decoder_d2(td, mask_classification):
    """TorchStandardDecoder -> reference D2 names (maskformer v1 decoder +
    DETR transformer: transformer.encoder/decoder.layers.{i}, cross attn =
    multihead_attn)."""
    sd = {}
    pre = "sem_seg_head.predictor"

    def put(name, t):
        sd[name] = t.detach().numpy()

    put(f"{pre}.query_embed.weight", td.query_embed.weight)
    put(f"{pre}.input_proj.weight", td.input_proj.weight)
    put(f"{pre}.input_proj.bias", td.input_proj.bias)
    put(f"{pre}.transformer.decoder.norm.weight", td.decoder_norm.weight)
    put(f"{pre}.transformer.decoder.norm.bias", td.decoder_norm.bias)
    if getattr(td, "encoder_norm", None) is not None:
        put(f"{pre}.transformer.encoder.norm.weight", td.encoder_norm.weight)
        put(f"{pre}.transformer.encoder.norm.bias", td.encoder_norm.bias)
    if mask_classification:
        put(f"{pre}.class_embed.weight", td.class_embed.weight)
        put(f"{pre}.class_embed.bias", td.class_embed.bias)
    for j, m in enumerate(td.mask_mlp):
        put(f"{pre}.mask_embed.layers.{j}.weight", m.weight)
        put(f"{pre}.mask_embed.layers.{j}.bias", m.bias)
    for i in range(len(td.enc_self)):
        lp = f"{pre}.transformer.encoder.layers.{i}"
        put(lp + ".self_attn.in_proj_weight", td.enc_self[i].in_proj_weight)
        put(lp + ".self_attn.in_proj_bias", td.enc_self[i].in_proj_bias)
        put(lp + ".self_attn.out_proj.weight", td.enc_self[i].out_proj.weight)
        put(lp + ".self_attn.out_proj.bias", td.enc_self[i].out_proj.bias)
        put(lp + ".linear1.weight", td.enc_l1[i].weight)
        put(lp + ".linear1.bias", td.enc_l1[i].bias)
        put(lp + ".linear2.weight", td.enc_l2[i].weight)
        put(lp + ".linear2.bias", td.enc_l2[i].bias)
        put(lp + ".norm1.weight", td.enc_n1[i].weight)
        put(lp + ".norm1.bias", td.enc_n1[i].bias)
        put(lp + ".norm2.weight", td.enc_n2[i].weight)
        put(lp + ".norm2.bias", td.enc_n2[i].bias)
    for i in range(len(td.dec_self)):
        lp = f"{pre}.transformer.decoder.layers.{i}"
        put(lp + ".self_attn.in_proj_weight", td.dec_self[i].in_proj_weight)
        put(lp + ".self_attn.in_proj_bias", td.dec_self[i].in_proj_bias)
        put(lp + ".self_attn.out_proj.weight", td.dec_self[i].out_proj.weight)
        put(lp + ".self_attn.out_proj.bias", td.dec_self[i].out_proj.bias)
        put(lp + ".multihead_attn.in_proj_weight", td.dec_cross[i].in_proj_weight)
        put(lp + ".multihead_attn.in_proj_bias", td.dec_cross[i].in_proj_bias)
        put(lp + ".multihead_attn.out_proj.weight", td.dec_cross[i].out_proj.weight)
        put(lp + ".multihead_attn.out_proj.bias", td.dec_cross[i].out_proj.bias)
        put(lp + ".linear1.weight", td.dec_l1[i].weight)
        put(lp + ".linear1.bias", td.dec_l1[i].bias)
        put(lp + ".linear2.weight", td.dec_l2[i].weight)
        put(lp + ".linear2.bias", td.dec_l2[i].bias)
        put(lp + ".norm1.weight", td.dec_n1[i].weight)
        put(lp + ".norm1.bias", td.dec_n1[i].bias)
        put(lp + ".norm2.weight", td.dec_n2[i].weight)
        put(lp + ".norm2.bias", td.dec_n2[i].bias)
        put(lp + ".norm3.weight", td.dec_n3[i].weight)
        put(lp + ".norm3.bias", td.dec_n3[i].bias)
    return sd


def test_convert_standard_decoder_golden(rng):
    """D2-named v1-decoder weights -> converter -> standard_decoder_apply
    reproduces the torch forward (both class modes; deep supervision)."""
    import jax.numpy as jnp

    from rba_tpu.convert.d2_mapping import convert_standard_decoder
    from tests.torch_refs import TorchStandardDecoder

    in_ch, hd, nh, ff, nq, md, nc = 32, 32, 4, 64, 6, 32, 5
    enc_l, dec_l = 1, 2
    h, w = 8, 12
    x = rng.randn(2, in_ch, h, w).astype(np.float32)
    mask_features = rng.randn(2, md, 16, 24).astype(np.float32)

    for mask_classification, pre_norm in (
        (True, False), (False, False), (True, True),
    ):
        td = TorchStandardDecoder(in_ch, hd, nh, ff, enc_l, dec_l, nq, md,
                                  num_classes=nc if mask_classification else None,
                                  normalize_before=pre_norm)
        with torch.no_grad():
            td.query_embed.weight.normal_(0, 0.5)
        masks_t, logits_t = td(torch.from_numpy(x), torch.from_numpy(mask_features))

        base = tiny_test_config(num_classes=nc)
        cfg = dataclasses.replace(
            base,
            decoder=dataclasses.replace(
                base.decoder, hidden_dim=hd, num_queries=nq, nheads=nh,
                dim_feedforward=ff, mask_dim=md,
                enc_layers=enc_l, dec_layers_total=dec_l, pre_norm=pre_norm,
            ),
        )
        sd = _export_standard_decoder_d2(td, mask_classification)
        params = jax.tree.map(
            jnp.asarray, convert_standard_decoder(sd, cfg, mask_classification)
        )
        out = standard_decoder_apply(
            params, cfg,
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(mask_features.transpose(0, 2, 3, 1)),
            deep_supervision=True,
        )
        np.testing.assert_allclose(
            np.asarray(out["pred_masks"]), masks_t[-1].detach().numpy(),
            rtol=1e-4, atol=1e-4,
        )
        if mask_classification:
            np.testing.assert_allclose(
                np.asarray(out["pred_logits"]), logits_t[-1].detach().numpy(),
                rtol=1e-4, atol=1e-4,
            )


def test_convert_fpn_pixel_decoder_roundtrip():
    """Our FPN params exported under the reference D2 names convert back to
    an identical tree (mapping + transposes are involutive)."""
    import jax.numpy as jnp

    from rba_tpu.convert.d2_mapping import convert_fpn_pixel_decoder

    cfg = _fpn_cfg()
    params = fpn_pixel_decoder_init(
        jax.random.PRNGKey(0), cfg.pixel_decoder, cfg.swin.out_channels
    )
    n = len(cfg.pixel_decoder.in_features)
    sd = {}
    pre = "sem_seg_head.pixel_decoder"
    for i, stage in enumerate(params["stages"]):  # top-down; layer_n = top
        k = n - i
        if "lateral" in stage:
            sd[f"{pre}.adapter_{k}.weight"] = np.asarray(
                stage["lateral"]["conv"]["kernel"]).transpose(3, 2, 0, 1)
            sd[f"{pre}.adapter_{k}.norm.weight"] = np.asarray(stage["lateral"]["gn"]["scale"])
            sd[f"{pre}.adapter_{k}.norm.bias"] = np.asarray(stage["lateral"]["gn"]["bias"])
        sd[f"{pre}.layer_{k}.weight"] = np.asarray(
            stage["output"]["conv"]["kernel"]).transpose(3, 2, 0, 1)
        sd[f"{pre}.layer_{k}.norm.weight"] = np.asarray(stage["output"]["gn"]["scale"])
        sd[f"{pre}.layer_{k}.norm.bias"] = np.asarray(stage["output"]["gn"]["bias"])
    sd[f"{pre}.mask_features.weight"] = np.asarray(
        params["mask_features"]["kernel"]).transpose(3, 2, 0, 1)
    sd[f"{pre}.mask_features.bias"] = np.asarray(params["mask_features"]["bias"])

    back = convert_fpn_pixel_decoder(sd, cfg)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(back)}
    for k, v in flat_a:
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_b[jax.tree_util.keystr(k)]),
            rtol=0, atol=0, err_msg=jax.tree_util.keystr(k),
        )
