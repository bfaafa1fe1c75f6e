import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from rba_tpu.config import tiny_test_config
from rba_tpu.convert.checkpoint import (
    load_params,
    read_torch_checkpoint,
    save_params,
)
from rba_tpu.convert.d2_mapping import apply_historical_renames, convert_d2_state_dict
from rba_tpu.models.maskformer import maskformer_infer, maskformer_init


def _synthetic_d2_state_dict(cfg, rng):
    """Build a random state dict with the reference's D2 names/shapes for
    the tiny config (Swin layers/blocks, pixel decoder, predictor)."""
    sd = {}

    def lin(prefix, din, dout, bias=True):
        sd[prefix + ".weight"] = rng.randn(dout, din).astype(np.float32) * 0.02
        if bias:
            sd[prefix + ".bias"] = rng.randn(dout).astype(np.float32) * 0.02

    def ln(prefix, d):
        sd[prefix + ".weight"] = np.ones(d, np.float32) + 0.01 * rng.randn(d).astype(np.float32)
        sd[prefix + ".bias"] = 0.01 * rng.randn(d).astype(np.float32)

    def conv(prefix, cin, cout, k, bias=True):
        sd[prefix + ".weight"] = rng.randn(cout, cin, k, k).astype(np.float32) * 0.02
        if bias:
            sd[prefix + ".bias"] = rng.randn(cout).astype(np.float32) * 0.02

    s = cfg.swin
    conv("backbone.patch_embed.proj", 3, s.embed_dim, s.patch_size)
    ln("backbone.patch_embed.norm", s.embed_dim)
    for i in range(s.num_layers):
        dim = s.stage_dim(i)
        for j in range(s.depths[i]):
            pre = f"backbone.layers.{i}.blocks.{j}"
            ln(pre + ".norm1", dim)
            sd[pre + ".attn.relative_position_bias_table"] = rng.randn(
                (2 * s.window_size - 1) ** 2, s.num_heads[i]
            ).astype(np.float32)
            lin(pre + ".attn.qkv", dim, 3 * dim)
            lin(pre + ".attn.proj", dim, dim)
            ln(pre + ".norm2", dim)
            lin(pre + ".mlp.fc1", dim, int(dim * s.mlp_ratio))
            lin(pre + ".mlp.fc2", int(dim * s.mlp_ratio), dim)
        if i < s.num_layers - 1:
            ln(f"backbone.layers.{i}.downsample.norm", 4 * dim)
            lin(f"backbone.layers.{i}.downsample.reduction", 4 * dim, 2 * dim, bias=False)
    for i in range(s.num_layers):
        if f"res{i+2}" in s.out_features:
            ln(f"backbone.norm{i}", s.stage_dim(i))

    # pixel decoder (use the PRE-rename keys for one level to test renames)
    pd = cfg.pixel_decoder
    cdim = pd.conv_dim
    in_ch = s.out_channels
    tf_rev = list(pd.transformer_in_features)[::-1]
    for i, f in enumerate(tf_rev):
        conv(f"sem_seg_head.pixel_decoder.input_proj.{i}.0", in_ch[f], cdim, 1)
        ln(f"sem_seg_head.pixel_decoder.input_proj.{i}.1", cdim)
    sd["sem_seg_head.pixel_decoder.transformer.level_embed"] = rng.randn(
        pd.num_feature_levels, cdim
    ).astype(np.float32)
    for i in range(pd.transformer_enc_layers):
        pre = f"sem_seg_head.pixel_decoder.transformer.encoder.layers.{i}"
        n = pd.transformer_nheads * pd.num_feature_levels * pd.enc_n_points
        lin(pre + ".self_attn.sampling_offsets", cdim, n * 2)
        lin(pre + ".self_attn.attention_weights", cdim, n)
        lin(pre + ".self_attn.value_proj", cdim, cdim)
        lin(pre + ".self_attn.output_proj", cdim, cdim)
        ln(pre + ".norm1", cdim)
        lin(pre + ".linear1", cdim, pd.transformer_dim_feedforward)
        lin(pre + ".linear2", pd.transformer_dim_feedforward, cdim)
        ln(pre + ".norm2", cdim)
    n_fpn = len(pd.in_features) - len(pd.transformer_in_features)
    for k in range(1, n_fpn + 1):
        f = pd.in_features[k - 1]
        conv(f"sem_seg_head.pixel_decoder.adapter_{k}", in_ch[f], cdim, 1, bias=False)
        ln(f"sem_seg_head.pixel_decoder.adapter_{k}.norm", cdim)
        conv(f"sem_seg_head.pixel_decoder.layer_{k}", cdim, cdim, 3, bias=False)
        ln(f"sem_seg_head.pixel_decoder.layer_{k}.norm", cdim)
    conv("sem_seg_head.pixel_decoder.mask_features", cdim, pd.mask_dim, 1)

    # predictor — use the OLD "static_query" name to test that rename
    d = cfg.decoder
    sd["sem_seg_head.predictor.static_query.weight"] = rng.randn(
        d.num_queries, d.hidden_dim
    ).astype(np.float32)
    sd["sem_seg_head.predictor.query_embed.weight"] = rng.randn(
        d.num_queries, d.hidden_dim
    ).astype(np.float32)
    sd["sem_seg_head.predictor.level_embed.weight"] = rng.randn(
        d.num_feature_levels, d.hidden_dim
    ).astype(np.float32)
    for i in range(d.dec_layers):
        for kind, attn in (
            ("transformer_cross_attention_layers", "multihead_attn"),
            ("transformer_self_attention_layers", "self_attn"),
        ):
            pre = f"sem_seg_head.predictor.{kind}.{i}"
            sd[pre + f".{attn}.in_proj_weight"] = rng.randn(
                3 * d.hidden_dim, d.hidden_dim
            ).astype(np.float32) * 0.02
            sd[pre + f".{attn}.in_proj_bias"] = np.zeros(3 * d.hidden_dim, np.float32)
            lin(pre + f".{attn}.out_proj", d.hidden_dim, d.hidden_dim)
            ln(pre + ".norm", d.hidden_dim)
        pre = f"sem_seg_head.predictor.transformer_ffn_layers.{i}"
        lin(pre + ".linear1", d.hidden_dim, d.dim_feedforward)
        lin(pre + ".linear2", d.dim_feedforward, d.hidden_dim)
        ln(pre + ".norm", d.hidden_dim)
    ln("sem_seg_head.predictor.decoder_norm", d.hidden_dim)
    lin("sem_seg_head.predictor.class_embed", d.hidden_dim, cfg.num_classes + 1)
    for j, (din, dout) in enumerate(
        [(d.hidden_dim, d.hidden_dim), (d.hidden_dim, d.hidden_dim), (d.hidden_dim, d.mask_dim)]
    ):
        lin(f"sem_seg_head.predictor.mask_embed.layers.{j}", din, dout)
    return sd


def _tree_structure(params):
    return jax.tree_util.tree_structure(params), [
        tuple(x.shape) for x in jax.tree.leaves(params)
    ]


def test_convert_structure_matches_init(rng):
    cfg = tiny_test_config()
    sd = _synthetic_d2_state_dict(cfg, rng)
    params = convert_d2_state_dict(sd, cfg)
    ref = maskformer_init(jax.random.PRNGKey(0), cfg)
    s1, shapes1 = _tree_structure(params)
    s2, shapes2 = _tree_structure(ref)
    assert s1 == s2, f"\nconverted: {s1}\ninit:      {s2}"
    assert shapes1 == shapes2


def test_converted_model_runs(rng):
    cfg = tiny_test_config()
    sd = _synthetic_d2_state_dict(cfg, rng)
    params = jax.tree.map(jnp.asarray, convert_d2_state_dict(sd, cfg))
    img = jnp.asarray(rng.rand(1, 64, 64, 3) * 255, jnp.float32)
    out = maskformer_infer(params, cfg, img)
    assert np.isfinite(np.asarray(out["rba"])).all()


def test_historical_renames():
    sd = {
        "sem_seg_head.predictor.static_query.weight": np.zeros(2),
        "sem_seg_head.adapter_1.weight": np.zeros(2),
        "sem_seg_head.predictor.class_embed.weight": np.zeros(2),
        "backbone.norm0.weight": np.zeros(2),
    }
    out = apply_historical_renames(sd)
    assert "sem_seg_head.predictor.query_feat.weight" in out
    assert "sem_seg_head.pixel_decoder.adapter_1.weight" in out
    assert "sem_seg_head.predictor.class_embed.weight" in out
    assert "backbone.norm0.weight" in out


def test_torch_pth_roundtrip(tmp_path, rng):
    cfg = tiny_test_config()
    sd = _synthetic_d2_state_dict(cfg, rng)
    pth = str(tmp_path / "model_final.pth")
    torch.save({"model": {k: torch.from_numpy(v) for k, v in sd.items()}}, pth)
    back = read_torch_checkpoint(pth)
    assert set(back) == set(sd)
    np.testing.assert_array_equal(back["backbone.norm0.weight"], sd["backbone.norm0.weight"])


def test_npz_roundtrip(tmp_path, rng):
    cfg = tiny_test_config()
    params = maskformer_init(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "params.npz")
    save_params(path, params)
    back = load_params(path)
    s1, _ = _tree_structure(params)
    s2, _ = _tree_structure(back)
    assert s1 == s2
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), b)
