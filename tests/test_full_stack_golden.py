"""Full-stack golden test: a complete torch Mask2Former-style model is built
from public primitives, its weights are exported under the Detectron2
checkpoint names, run through our converter, and the final RbA score maps
are compared — covering backbone, pixel decoder, decoder, scoring, AND the
converter name mapping/transposes in one numerical check."""
import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from rba_tpu.config import tiny_test_config
from rba_tpu.convert.d2_mapping import convert_d2_state_dict
from rba_tpu.models.maskformer import maskformer_forward, rba_score, semantic_inference
from rba_tpu.ops.resize import resize_bilinear


def _export_d2_state_dict(swin, pd, dec, query_feat_key="query_feat"):
    """Map the torch modules' tensors to the reference's D2 names.
    ``query_feat_key="static_query"`` exports the historical pre-rename name
    (mask2former_transformer_decoder.py:237-258)."""
    sd = {}

    def put(name, t):
        sd[name] = t.detach().numpy()

    # ---- backbone ----
    put("backbone.patch_embed.proj.weight", swin.proj.weight)
    put("backbone.patch_embed.proj.bias", swin.proj.bias)
    put("backbone.patch_embed.norm.weight", swin.patch_norm.weight)
    put("backbone.patch_embed.norm.bias", swin.patch_norm.bias)
    for i, stage in enumerate(swin.blocks):
        for j, blk in enumerate(stage):
            pre = f"backbone.layers.{i}.blocks.{j}"
            put(pre + ".norm1.weight", blk.norm1.weight)
            put(pre + ".norm1.bias", blk.norm1.bias)
            put(pre + ".attn.relative_position_bias_table", blk.attn.relative_position_bias_table)
            put(pre + ".attn.qkv.weight", blk.attn.qkv.weight)
            put(pre + ".attn.qkv.bias", blk.attn.qkv.bias)
            put(pre + ".attn.proj.weight", blk.attn.proj.weight)
            put(pre + ".attn.proj.bias", blk.attn.proj.bias)
            put(pre + ".norm2.weight", blk.norm2.weight)
            put(pre + ".norm2.bias", blk.norm2.bias)
            put(pre + ".mlp.fc1.weight", blk.fc1.weight)
            put(pre + ".mlp.fc1.bias", blk.fc1.bias)
            put(pre + ".mlp.fc2.weight", blk.fc2.weight)
            put(pre + ".mlp.fc2.bias", blk.fc2.bias)
        if i < len(swin.blocks) - 1:
            ds = swin.downsamples[i]
            put(f"backbone.layers.{i}.downsample.norm.weight", ds.norm.weight)
            put(f"backbone.layers.{i}.downsample.norm.bias", ds.norm.bias)
            put(f"backbone.layers.{i}.downsample.reduction.weight", ds.reduction.weight)
    for i, n in enumerate(swin.out_norms):
        put(f"backbone.norm{i}.weight", n.weight)
        put(f"backbone.norm{i}.bias", n.bias)

    # ---- pixel decoder ----
    b = "sem_seg_head.pixel_decoder"
    put(b + ".input_proj.0.0.weight", pd.input_proj_conv.weight)
    put(b + ".input_proj.0.0.bias", pd.input_proj_conv.bias)
    put(b + ".input_proj.0.1.weight", pd.input_proj_gn.weight)
    put(b + ".input_proj.0.1.bias", pd.input_proj_gn.bias)
    put(b + ".transformer.level_embed", pd.level_embed)
    for i, l in enumerate(pd.layers):
        pre = f"{b}.transformer.encoder.layers.{i}"
        put(pre + ".self_attn.sampling_offsets.weight", l.attn.sampling_offsets.weight)
        put(pre + ".self_attn.sampling_offsets.bias", l.attn.sampling_offsets.bias)
        put(pre + ".self_attn.attention_weights.weight", l.attn.attention_weights.weight)
        put(pre + ".self_attn.attention_weights.bias", l.attn.attention_weights.bias)
        put(pre + ".self_attn.value_proj.weight", l.attn.value_proj.weight)
        put(pre + ".self_attn.value_proj.bias", l.attn.value_proj.bias)
        put(pre + ".self_attn.output_proj.weight", l.attn.output_proj.weight)
        put(pre + ".self_attn.output_proj.bias", l.attn.output_proj.bias)
        put(pre + ".norm1.weight", l.norm1.weight)
        put(pre + ".norm1.bias", l.norm1.bias)
        put(pre + ".linear1.weight", l.linear1.weight)
        put(pre + ".linear1.bias", l.linear1.bias)
        put(pre + ".linear2.weight", l.linear2.weight)
        put(pre + ".linear2.bias", l.linear2.bias)
        put(pre + ".norm2.weight", l.norm2.weight)
        put(pre + ".norm2.bias", l.norm2.bias)
    if hasattr(pd, "adapters"):  # full layout: adapter_1..n (res2 first)
        for k in range(len(pd.adapters)):
            put(f"{b}.adapter_{k + 1}.weight", pd.adapters[k].weight)
            put(f"{b}.adapter_{k + 1}.norm.weight", pd.adapter_gns[k].weight)
            put(f"{b}.adapter_{k + 1}.norm.bias", pd.adapter_gns[k].bias)
            put(f"{b}.layer_{k + 1}.weight", pd.out_convs[k].weight)
            put(f"{b}.layer_{k + 1}.norm.weight", pd.out_gns[k].weight)
            put(f"{b}.layer_{k + 1}.norm.bias", pd.out_gns[k].bias)
    else:
        put(b + ".adapter_1.weight", pd.adapter_conv.weight)
        put(b + ".adapter_1.norm.weight", pd.adapter_gn.weight)
        put(b + ".adapter_1.norm.bias", pd.adapter_gn.bias)
        put(b + ".layer_1.weight", pd.out_conv.weight)
        put(b + ".layer_1.norm.weight", pd.out_gn.weight)
        put(b + ".layer_1.norm.bias", pd.out_gn.bias)
    put(b + ".mask_features.weight", pd.mask_features.weight)
    put(b + ".mask_features.bias", pd.mask_features.bias)

    # ---- predictor ----
    p = "sem_seg_head.predictor"
    put(f"{p}.{query_feat_key}.weight", dec.query_feat.weight)
    put(p + ".query_embed.weight", dec.query_embed.weight)
    put(p + ".level_embed.weight", dec.level_embed.weight)
    for i in range(dec.num_layers):
        put(f"{p}.transformer_cross_attention_layers.{i}.multihead_attn.in_proj_weight",
            dec.cross_attn[i].in_proj_weight)
        put(f"{p}.transformer_cross_attention_layers.{i}.multihead_attn.in_proj_bias",
            dec.cross_attn[i].in_proj_bias)
        put(f"{p}.transformer_cross_attention_layers.{i}.multihead_attn.out_proj.weight",
            dec.cross_attn[i].out_proj.weight)
        put(f"{p}.transformer_cross_attention_layers.{i}.multihead_attn.out_proj.bias",
            dec.cross_attn[i].out_proj.bias)
        put(f"{p}.transformer_cross_attention_layers.{i}.norm.weight", dec.cross_norm[i].weight)
        put(f"{p}.transformer_cross_attention_layers.{i}.norm.bias", dec.cross_norm[i].bias)
        put(f"{p}.transformer_self_attention_layers.{i}.self_attn.in_proj_weight",
            dec.self_attn[i].in_proj_weight)
        put(f"{p}.transformer_self_attention_layers.{i}.self_attn.in_proj_bias",
            dec.self_attn[i].in_proj_bias)
        put(f"{p}.transformer_self_attention_layers.{i}.self_attn.out_proj.weight",
            dec.self_attn[i].out_proj.weight)
        put(f"{p}.transformer_self_attention_layers.{i}.self_attn.out_proj.bias",
            dec.self_attn[i].out_proj.bias)
        put(f"{p}.transformer_self_attention_layers.{i}.norm.weight", dec.self_norm[i].weight)
        put(f"{p}.transformer_self_attention_layers.{i}.norm.bias", dec.self_norm[i].bias)
        put(f"{p}.transformer_ffn_layers.{i}.linear1.weight", dec.ffn1[i].weight)
        put(f"{p}.transformer_ffn_layers.{i}.linear1.bias", dec.ffn1[i].bias)
        put(f"{p}.transformer_ffn_layers.{i}.linear2.weight", dec.ffn2[i].weight)
        put(f"{p}.transformer_ffn_layers.{i}.linear2.bias", dec.ffn2[i].bias)
        put(f"{p}.transformer_ffn_layers.{i}.norm.weight", dec.ffn_norm[i].weight)
        put(f"{p}.transformer_ffn_layers.{i}.norm.bias", dec.ffn_norm[i].bias)
    put(p + ".decoder_norm.weight", dec.decoder_norm.weight)
    put(p + ".decoder_norm.bias", dec.decoder_norm.bias)
    put(p + ".class_embed.weight", dec.class_embed.weight)
    put(p + ".class_embed.bias", dec.class_embed.bias)
    for j, m in enumerate(dec.mask_mlp):
        put(f"{p}.mask_embed.layers.{j}.weight", m.weight)
        put(f"{p}.mask_embed.layers.{j}.bias", m.bias)
    return sd


import pytest


@pytest.mark.parametrize("variant", ["swin_b_1dl", "swin_l_1dl"])
def test_full_scale_swin_golden(rng, variant):
    """The released swin_b_1dl / swin_l_1dl architectures at reduced input
    (256×512): window 12 with 23×23 rel-pos tables, depths 2/2/18/2 (B:
    embed 128 heads 4/8/16/32; L: embed 192 heads 6/12/24/48), 6 deformable
    encoder layers on res5, 3 FPN laterals, 1 masked decoder layer, Q=100 —
    weights exported under the real D2 names including the historical
    static_query rename, RbA map parity ≤1e-3
    (spec: /root/reference/ckpts/{swin_b_1dl,swin_l_1dl}/config.yaml)."""
    from rba_tpu.config import load_d2_config
    from tests.torch_refs import (
        TorchMiniMaskedDecoder,
        TorchPixelDecoderFull,
        TorchSwinFull,
        torch_sine_pos_embed,
    )

    cfg = load_d2_config(
        f"/root/reference/ckpts/{variant}/config.yaml", compute_dtype="float32"
    )
    assert cfg.swin.window_size == 12 and cfg.swin.depths == (2, 2, 18, 2)
    assert cfg.decoder.dec_layers == 1 and cfg.decoder.num_queries == 100
    assert cfg.pixel_decoder.transformer_enc_layers == 6
    assert cfg.pixel_decoder.transformer_in_features == ("res5",)
    if variant == "swin_l_1dl":
        assert cfg.swin.embed_dim == 192 and cfg.swin.num_heads == (6, 12, 24, 48)

    torch.manual_seed(0)
    swin = TorchSwinFull(embed_dim=cfg.swin.embed_dim, depths=cfg.swin.depths,
                         num_heads=cfg.swin.num_heads, window=12)
    with torch.no_grad():
        for stage in swin.blocks:
            for blk in stage:
                # 23x23 rel-pos tables exercised with real (non-zero) values
                blk.attn.relative_position_bias_table.normal_(0, 0.5)
    in_ch = {f"res{i + 2}": cfg.swin.embed_dim * 2**i for i in range(4)}
    pd = TorchPixelDecoderFull(in_ch, conv_dim=256, mask_dim=256, enc_layers=6,
                               nheads=8, ffn=1024)
    with torch.no_grad():
        for l in pd.layers:
            l.attn.sampling_offsets.weight.normal_(0, 0.01)
            l.attn.sampling_offsets.bias.normal_(0, 0.3)
    dec = TorchMiniMaskedDecoder(256, 8, 2048, 1, 100, cfg.num_classes, 256,
                                 num_levels=1)
    with torch.no_grad():
        for emb in (dec.query_feat, dec.query_embed, dec.level_embed):
            emb.weight.normal_(0, 0.5)

    h, w = 256, 512
    x = rng.randn(1, 3, h, w).astype(np.float32)

    with torch.no_grad():
        feats = swin(torch.from_numpy(x))
        assert feats["res5"].shape[1] == cfg.swin.embed_dim * 8
        mask_features, enc = pd(feats)
        pos = torch_sine_pos_embed(enc.shape[2], enc.shape[3], 128)
        cls_list, mask_list = dec([enc], [pos], mask_features)
        mask_cls, mask_pred = cls_list[-1], mask_list[-1]
        mask_pred_up = F.interpolate(mask_pred, size=(h, w), mode="bilinear",
                                     align_corners=False)
        probs = torch.softmax(mask_cls, dim=-1)[..., :-1]
        sem_t = torch.einsum("bqc,bqhw->bchw", probs, mask_pred_up.sigmoid())
        rba_t = (-sem_t.tanh().sum(1)).numpy()

    # exported under the historical pre-rename name to exercise the shim
    sd = _export_d2_state_dict(swin, pd, dec, query_feat_key="static_query")
    params = jax.tree.map(jnp.asarray, convert_d2_state_dict(sd, cfg))
    outputs = maskformer_forward(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)))
    mask_pred_j = resize_bilinear(outputs["pred_masks"], (h, w), align_corners=False)
    sem_j = semantic_inference(outputs["pred_logits"], mask_pred_j)
    rba_j = np.asarray(rba_score(sem_j))

    np.testing.assert_allclose(
        np.asarray(outputs["pred_logits"]), mask_cls.numpy(), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(rba_j, rba_t, rtol=1e-3, atol=1e-3)


def test_full_stack_rba_parity(rng):
    from tests.torch_refs import (
        TorchMiniMaskedDecoder,
        TorchPixelDecoderMini,
        TorchSwinFull,
        torch_sine_pos_embed,
    )

    cfg = tiny_test_config()
    torch.manual_seed(0)
    swin = TorchSwinFull(embed_dim=32, depths=(2, 2), num_heads=(2, 4), window=4)
    with torch.no_grad():
        for stage in swin.blocks:
            for blk in stage:
                blk.attn.relative_position_bias_table.normal_(0, 0.5)
    pd = TorchPixelDecoderMini({"res2": 32, "res3": 64})
    with torch.no_grad():
        for l in pd.layers:
            l.attn.sampling_offsets.weight.normal_(0, 0.01)
            l.attn.sampling_offsets.bias.normal_(0, 0.3)
    dec = TorchMiniMaskedDecoder(64, 4, 128, 2, 10, cfg.num_classes, 64, num_levels=1)
    with torch.no_grad():
        for emb in (dec.query_feat, dec.query_embed, dec.level_embed):
            emb.weight.normal_(0, 0.5)

    h, w = 64, 96
    x = rng.randn(1, 3, h, w).astype(np.float32)

    # ---- torch forward ----
    with torch.no_grad():
        feats = swin(torch.from_numpy(x))
        mask_features, enc = pd(feats)
        pos = torch_sine_pos_embed(enc.shape[2], enc.shape[3], 32)
        cls_list, mask_list = dec([enc], [pos], mask_features)
        mask_cls, mask_pred = cls_list[-1], mask_list[-1]
        mask_pred_up = F.interpolate(mask_pred, size=(h, w), mode="bilinear", align_corners=False)
        probs = torch.softmax(mask_cls, dim=-1)[..., :-1]
        sem_t = torch.einsum("bqc,bqhw->bchw", probs, mask_pred_up.sigmoid())
        rba_t = (-sem_t.tanh().sum(1)).numpy()

    # ---- ours via the D2-name converter ----
    sd = _export_d2_state_dict(swin, pd, dec)
    params = jax.tree.map(jnp.asarray, convert_d2_state_dict(sd, cfg))
    images = jnp.asarray(x.transpose(0, 2, 3, 1))  # pre-normalized input
    outputs = maskformer_forward(params, cfg, images)
    mask_pred_j = resize_bilinear(outputs["pred_masks"], (h, w), align_corners=False)
    sem_j = semantic_inference(outputs["pred_logits"], mask_pred_j)
    rba_j = np.asarray(rba_score(sem_j))

    np.testing.assert_allclose(
        np.asarray(outputs["pred_logits"]), mask_cls.numpy(), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(rba_j, rba_t, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(sem_j), sem_t.numpy(), rtol=1e-3, atol=1e-3)
