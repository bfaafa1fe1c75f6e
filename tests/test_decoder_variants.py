"""Golden tests for the MultiScalePerPixelDecoder and SimpleTransformerDecoder
variants (reference mask2former_transformer_decoder.py:506-746, :748-947)."""
import dataclasses

import numpy as np
import torch

import jax
import jax.numpy as jnp

from rba_tpu.config import DecoderConfig, tiny_test_config
from rba_tpu.models.transformer_decoder import (
    per_pixel_decoder_apply,
    simple_decoder_apply,
)
from tests.test_decoder import t2j_linear, t2j_ln, t2j_mha


def test_per_pixel_decoder_parity(rng):
    from tests.torch_refs import TorchPerPixelDecoder, torch_sine_pos_embed

    hd, nh, ff, nl, nq, md = 32, 4, 64, 3, 8, 32
    h, w = 8, 12
    td = TorchPerPixelDecoder(hd, nh, ff, nl, nq, md, num_levels=1)
    with torch.no_grad():
        for emb in (td.query_feat, td.query_embed, td.level_embed):
            emb.weight.normal_(0, 0.5)

    feats = rng.randn(2, hd, h, w).astype(np.float32)
    mask_features = rng.randn(2, md, 16, 24).astype(np.float32)
    pos = torch_sine_pos_embed(h, w, hd // 2).repeat(2, 1, 1, 1)
    mask_list = td([torch.from_numpy(feats)], [pos], torch.from_numpy(mask_features))

    cfg = DecoderConfig(
        hidden_dim=hd, num_queries=nq, nheads=nh, dim_feedforward=ff, dec_layers=nl,
        mask_dim=md, num_feature_levels=1, name="MultiScalePerPixelDecoder",
    )
    params = {
        "query_feat": jnp.asarray(td.query_feat.weight.detach().numpy()),
        "query_embed": jnp.asarray(td.query_embed.weight.detach().numpy()),
        "level_embed": jnp.asarray(td.level_embed.weight.detach().numpy()),
        "decoder_norm": t2j_ln(td.decoder_norm),
        "mask_embed": {"layers": [t2j_linear(m) for m in td.mask_mlp]},
        "cross_layers": [
            {"attn": t2j_mha(td.cross_attn[i]), "norm": t2j_ln(td.cross_norm[i])}
            for i in range(nl)
        ],
        "self_layers": [
            {"attn": t2j_mha(td.self_attn[i]), "norm": t2j_ln(td.self_norm[i])}
            for i in range(nl)
        ],
        "ffn_layers": [
            {
                "linear1": t2j_linear(td.ffn1[i]),
                "linear2": t2j_linear(td.ffn2[i]),
                "norm": t2j_ln(td.ffn_norm[i]),
            }
            for i in range(nl)
        ],
    }
    out = per_pixel_decoder_apply(
        params,
        cfg,
        [jnp.asarray(feats.transpose(0, 2, 3, 1))],
        jnp.asarray(mask_features.transpose(0, 2, 3, 1)),
    )
    assert "pred_logits" not in out  # mask_classification=False
    np.testing.assert_allclose(
        np.asarray(out["pred_masks"]), mask_list[-1].detach().numpy(), rtol=1e-4, atol=1e-4
    )
    assert len(out["aux_outputs"]) == nl
    for i, aux in enumerate(out["aux_outputs"]):
        assert set(aux.keys()) == {"pred_masks"}
        np.testing.assert_allclose(
            np.asarray(aux["pred_masks"]), mask_list[i].detach().numpy(), rtol=1e-4, atol=1e-4
        )


def test_simple_decoder_parity(rng):
    from tests.torch_refs import TorchSimpleDecoder, torch_sine_pos_embed

    hd, nh, nq, nc, md = 32, 4, 8, 5, 32
    h, w = 16, 24
    td = TorchSimpleDecoder(hd, nh, nq, nc, md)
    with torch.no_grad():
        for emb in (td.query_feat, td.query_embed):
            emb.weight.normal_(0, 0.5)

    mask_features = rng.randn(2, md, h, w).astype(np.float32)
    pos = torch_sine_pos_embed(h, w, hd // 2).repeat(2, 1, 1, 1)
    cls_t, masks_t = td(torch.from_numpy(mask_features), pos)

    cfg = DecoderConfig(
        hidden_dim=hd, num_queries=nq, nheads=nh, mask_dim=md, name="SimpleDecoder",
    )
    params = {
        "query_feat": jnp.asarray(td.query_feat.weight.detach().numpy()),
        "query_embed": jnp.asarray(td.query_embed.weight.detach().numpy()),
        "cross_attention": {"attn": t2j_mha(td.cross_attn), "norm": t2j_ln(td.cross_norm)},
        "decoder_norm": t2j_ln(td.decoder_norm),
        "class_embed": t2j_linear(td.class_embed),
        "mask_embed": {"layers": [t2j_linear(m) for m in td.mask_mlp]},
    }
    out = simple_decoder_apply(
        params, cfg, jnp.asarray(mask_features.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_logits"]), cls_t.detach().numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_masks"]), masks_t.detach().numpy(), rtol=1e-4, atol=1e-4
    )
    assert out["aux_outputs"] == []


def test_variant_dispatch_end_to_end(rng):
    """Configs selecting the variants run end-to-end through maskformer."""
    from rba_tpu.models.maskformer import maskformer_forward, maskformer_init, preprocess

    base = tiny_test_config()
    img = jnp.asarray(rng.rand(1, 32, 32, 3) * 255, jnp.float32)

    for name in ("MultiScalePerPixelDecoder", "SimpleDecoder", "StandardTransformerDecoder"):
        dec = dataclasses.replace(
            base.decoder,
            name=name,
            transformer_in_feature=(
                "simple_transformer_decoder" if name == "SimpleDecoder"
                else "transformer_encoder" if name == "StandardTransformerDecoder"
                else "multi_scale_pixel_decoder"
            ),
        )
        cfg = dataclasses.replace(base, decoder=dec)
        params = maskformer_init(jax.random.PRNGKey(0), cfg)
        out = maskformer_forward(params, cfg, preprocess(cfg, img))
        assert out["pred_masks"].ndim == 4
        if name == "MultiScalePerPixelDecoder":
            assert "pred_logits" not in out
        else:
            assert out["pred_logits"].shape[-1] == cfg.num_classes + 1
