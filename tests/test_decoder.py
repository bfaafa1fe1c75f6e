import numpy as np
import torch

import jax
import jax.numpy as jnp

from rba_tpu.config import DecoderConfig
from rba_tpu.models.transformer_decoder import decoder_apply, mha_apply


def t2j_linear(mod):
    p = {"kernel": jnp.asarray(mod.weight.detach().numpy().T)}
    if mod.bias is not None:
        p["bias"] = jnp.asarray(mod.bias.detach().numpy())
    return p


def t2j_ln(mod):
    return {
        "scale": jnp.asarray(mod.weight.detach().numpy()),
        "bias": jnp.asarray(mod.bias.detach().numpy()),
    }


def t2j_mha(mod):
    return {
        "in_proj": {
            "kernel": jnp.asarray(mod.in_proj_weight.detach().numpy().T),
            "bias": jnp.asarray(mod.in_proj_bias.detach().numpy()),
        },
        "out_proj": t2j_linear(mod.out_proj),
    }


def test_mha_matches_torch(rng):
    d, nh = 32, 4
    mha = torch.nn.MultiheadAttention(d, nh)
    q = rng.randn(5, 2, d).astype(np.float32)  # (L, B, C) torch layout
    k = rng.randn(9, 2, d).astype(np.float32)
    v = rng.randn(9, 2, d).astype(np.float32)
    want = mha(torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v))[0].detach().numpy()

    got = mha_apply(
        t2j_mha(mha),
        jnp.asarray(q.transpose(1, 0, 2)),
        jnp.asarray(k.transpose(1, 0, 2)),
        jnp.asarray(v.transpose(1, 0, 2)),
        nh,
    )
    np.testing.assert_allclose(np.asarray(got).transpose(1, 0, 2), want, rtol=1e-4, atol=1e-5)


def test_mha_bool_mask_matches_additive(rng):
    d, nh = 16, 2
    mha = torch.nn.MultiheadAttention(d, nh)
    q = rng.randn(4, 1, d).astype(np.float32)
    kv = rng.randn(6, 1, d).astype(np.float32)
    mask = rng.rand(nh, 4, 6) > 0.6  # (B*nh, Lq, Lk) bool, True = blocked
    want = mha(
        torch.from_numpy(q), torch.from_numpy(kv), torch.from_numpy(kv),
        attn_mask=torch.from_numpy(mask),
    )[0].detach().numpy()

    add_mask = jnp.where(jnp.asarray(mask)[None], -1e9, 0.0).astype(jnp.float32)
    got = mha_apply(
        t2j_mha(mha),
        jnp.asarray(q.transpose(1, 0, 2)),
        jnp.asarray(kv.transpose(1, 0, 2)),
        jnp.asarray(kv.transpose(1, 0, 2)),
        nh,
        attn_mask=add_mask,
    )
    np.testing.assert_allclose(np.asarray(got).transpose(1, 0, 2), want, rtol=1e-4, atol=1e-5)


def _convert_decoder_params(td, num_levels):
    params = {
        "query_feat": jnp.asarray(td.query_feat.weight.detach().numpy()),
        "query_embed": jnp.asarray(td.query_embed.weight.detach().numpy()),
        "level_embed": jnp.asarray(td.level_embed.weight.detach().numpy()),
        "decoder_norm": t2j_ln(td.decoder_norm),
        "class_embed": t2j_linear(td.class_embed),
        "mask_embed": {"layers": [t2j_linear(m) for m in td.mask_mlp]},
        "cross_layers": [],
        "self_layers": [],
        "ffn_layers": [],
    }
    for i in range(td.num_layers):
        params["cross_layers"].append(
            {"attn": t2j_mha(td.cross_attn[i]), "norm": t2j_ln(td.cross_norm[i])}
        )
        params["self_layers"].append(
            {"attn": t2j_mha(td.self_attn[i]), "norm": t2j_ln(td.self_norm[i])}
        )
        params["ffn_layers"].append(
            {
                "linear1": t2j_linear(td.ffn1[i]),
                "linear2": t2j_linear(td.ffn2[i]),
                "norm": t2j_ln(td.ffn_norm[i]),
            }
        )
    return params


def test_full_decoder_parity(rng):
    """End-to-end masked-attention decoder vs the torch assembly, including
    the attention-mask threshold/row-unmask logic and deep supervision."""
    from tests.torch_refs import TorchMiniMaskedDecoder, torch_sine_pos_embed

    hd, nh, ff, nl, nq, nc, md = 32, 4, 64, 3, 8, 5, 32
    h, w = 8, 12  # feature level size; mask features at 2x
    td = TorchMiniMaskedDecoder(hd, nh, ff, nl, nq, nc, md, num_levels=1)
    with torch.no_grad():
        for emb in (td.query_feat, td.query_embed, td.level_embed):
            emb.weight.normal_(0, 0.5)

    feats = rng.randn(2, hd, h, w).astype(np.float32)
    mask_features = rng.randn(2, md, 16, 24).astype(np.float32)
    pos = torch_sine_pos_embed(h, w, hd // 2).repeat(2, 1, 1, 1)

    cls_list, mask_list = td(
        [torch.from_numpy(feats)], [pos], torch.from_numpy(mask_features)
    )

    cfg = DecoderConfig(
        hidden_dim=hd, num_queries=nq, nheads=nh, dim_feedforward=ff, dec_layers=nl,
        mask_dim=md, num_feature_levels=1,
    )
    params = _convert_decoder_params(td, 1)
    out = decoder_apply(
        params,
        cfg,
        [jnp.asarray(feats.transpose(0, 2, 3, 1))],
        jnp.asarray(mask_features.transpose(0, 2, 3, 1)),
    )

    np.testing.assert_allclose(
        np.asarray(out["pred_logits"]), cls_list[-1].detach().numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_masks"]), mask_list[-1].detach().numpy(), rtol=1e-4, atol=1e-4
    )
    assert len(out["aux_outputs"]) == nl
    for i, aux in enumerate(out["aux_outputs"]):
        np.testing.assert_allclose(
            np.asarray(aux["pred_logits"]), cls_list[i].detach().numpy(), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(aux["pred_masks"]), mask_list[i].detach().numpy(), rtol=1e-4, atol=1e-4
        )


def test_semantic_inference_and_rba(rng):
    from rba_tpu.models.maskformer import energy_score, rba_score, semantic_inference

    mask_cls = rng.randn(1, 10, 6).astype(np.float32)
    mask_pred = rng.randn(1, 10, 8, 8).astype(np.float32)
    cls_t = torch.softmax(torch.from_numpy(mask_cls), dim=-1)[..., :-1]
    sem_t = torch.einsum("bqc,bqhw->bchw", cls_t, torch.from_numpy(mask_pred).sigmoid())
    want_rba = (-sem_t.tanh().sum(dim=1)).numpy()
    want_energy = (-torch.logsumexp(sem_t, dim=1)).numpy()

    sem = semantic_inference(jnp.asarray(mask_cls), jnp.asarray(mask_pred))
    np.testing.assert_allclose(np.asarray(sem), sem_t.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rba_score(sem)), want_rba, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(energy_score(sem)), want_energy, rtol=1e-5, atol=1e-6)


def test_need_aux_false_matches_full_path(rng):
    """Inference fast path (resize-commuted attention-mask einsum, no aux
    heads) must produce the same final predictions as the training path —
    bilinear resize is linear in mask_features so the commuted form is
    algebraically identical."""
    from rba_tpu.config import DecoderConfig
    from rba_tpu.models.transformer_decoder import decoder_init

    cfg = DecoderConfig(
        hidden_dim=32, num_queries=8, nheads=4, dim_feedforward=64, dec_layers=3,
        mask_dim=32, num_feature_levels=1,
    )
    params = decoder_init(jax.random.PRNGKey(3), cfg, 5, 32)
    feats = [jnp.asarray(rng.randn(2, 8, 12, 32), jnp.float32)]
    mf = jnp.asarray(rng.randn(2, 16, 24, 32), jnp.float32)

    full = decoder_apply(params, cfg, feats, mf, need_aux=True)
    fast = decoder_apply(params, cfg, feats, mf, need_aux=False)
    assert fast["aux_outputs"] == []
    np.testing.assert_allclose(
        np.asarray(fast["pred_logits"]), np.asarray(full["pred_logits"]),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(fast["pred_masks"]), np.asarray(full["pred_masks"]),
        rtol=1e-4, atol=1e-5,
    )
