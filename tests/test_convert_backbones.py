"""Converter coverage for the non-Swin backbones: synthetic D2-named state
dicts (reference param naming) → convert → tree-structure/shape equality with
our init, plus layout (transpose) spot checks and a forward smoke test.

Reference naming specs:
  * ViT/SFP — backbone/vit.py (blocks.{i}.attn.qkv/rel_pos_h, simfp_{k}.…)
  * MViT — backbone/mvit.py (attn.pool_q/norm_q, scale{k}_norm)
  * MixTransformer — backbone/mix_transformer.py (block{s}.{b}.attn.q/kv/sr,
    mlp.dwconv.dwconv, patch_embed{s}, norm{s})
  * WideResNet38 — backbone/wideresnet38.py (mod{m}.block{b}.convs.conv*/bn*)
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rba_tpu.convert.d2_mapping import (
    convert_mit_backbone,
    convert_mvit_backbone,
    convert_sfp,
    convert_vit_backbone,
    convert_wideresnet_backbone,
)


def _structure(params):
    return jax.tree_util.tree_structure(params), [
        tuple(np.shape(x)) for x in jax.tree.leaves(params)
    ]


def _assert_same_tree(converted, init):
    s1, shapes1 = _structure(converted)
    s2, shapes2 = _structure(init)
    assert s1 == s2, f"\nconverted: {s1}\ninit:      {s2}"
    assert shapes1 == shapes2, f"\nconverted: {shapes1}\ninit:      {shapes2}"


def _lin(sd, prefix, din, dout, rng, bias=True):
    sd[prefix + ".weight"] = rng.randn(dout, din).astype(np.float32) * 0.02
    if bias:
        sd[prefix + ".bias"] = rng.randn(dout).astype(np.float32) * 0.02


def _ln(sd, prefix, d, rng):
    sd[prefix + ".weight"] = np.ones(d, np.float32)
    sd[prefix + ".bias"] = 0.01 * rng.randn(d).astype(np.float32)


def _conv(sd, prefix, cin, cout, k, rng, bias=True, groups=1):
    sd[prefix + ".weight"] = rng.randn(cout, cin // groups, k, k).astype(np.float32) * 0.02
    if bias:
        sd[prefix + ".bias"] = rng.randn(cout).astype(np.float32) * 0.02


def _bn(sd, prefix, d, rng):
    sd[prefix + ".weight"] = np.ones(d, np.float32)
    sd[prefix + ".bias"] = np.zeros(d, np.float32)
    sd[prefix + ".running_mean"] = 0.1 * rng.randn(d).astype(np.float32)
    sd[prefix + ".running_var"] = np.ones(d, np.float32)


# ---------------------------------------------------------------------------
# ViT + SimpleFeaturePyramid
# ---------------------------------------------------------------------------

def _tiny_vit_cfg():
    from rba_tpu.models.vit import ViTConfig

    return ViTConfig(
        patch_size=8, embed_dim=32, depth=3, num_heads=2,
        window_block_indexes=(0, 2), residual_block_indexes=(1,),
        pretrain_img_size=32, window_size=2,
    )


def _vit_sd(cfg, rng, prefix="backbone"):
    sd = {}
    d = cfg.embed_dim
    hd = d // cfg.num_heads
    _conv(sd, f"{prefix}.patch_embed.proj", 3, d, cfg.patch_size, rng)
    n = cfg.pretrain_img_size // cfg.patch_size
    sd[f"{prefix}.pos_embed"] = rng.randn(1, n * n + 1, d).astype(np.float32) * 0.02
    for i in range(cfg.depth):
        pre = f"{prefix}.blocks.{i}"
        _ln(sd, pre + ".norm1", d, rng)
        _lin(sd, pre + ".attn.qkv", d, 3 * d, rng)
        _lin(sd, pre + ".attn.proj", d, d, rng)
        size = cfg.window_size if i in cfg.window_block_indexes else n
        sd[pre + ".attn.rel_pos_h"] = rng.randn(2 * size - 1, hd).astype(np.float32) * 0.02
        sd[pre + ".attn.rel_pos_w"] = rng.randn(2 * size - 1, hd).astype(np.float32) * 0.02
        _ln(sd, pre + ".norm2", d, rng)
        _lin(sd, pre + ".mlp.fc1", d, int(d * cfg.mlp_ratio), rng)
        _lin(sd, pre + ".mlp.fc2", int(d * cfg.mlp_ratio), d, rng)
        if i in cfg.residual_block_indexes:
            _conv(sd, pre + ".residual.conv1", d, d // 2, 1, rng, bias=False)
            _ln(sd, pre + ".residual.norm1", d // 2, rng)
            _conv(sd, pre + ".residual.conv2", d // 2, d // 2, 3, rng, bias=False)
            _ln(sd, pre + ".residual.norm2", d // 2, rng)
            _conv(sd, pre + ".residual.conv3", d // 2, d, 1, rng, bias=False)
            _ln(sd, pre + ".residual.norm3", d, rng)
    return sd


def test_vit_converter_structure_and_layout(rng):
    from rba_tpu.models.vit import vit_init

    cfg = _tiny_vit_cfg()
    sd = _vit_sd(cfg, rng)
    p = convert_vit_backbone(sd)
    _assert_same_tree(p, vit_init(jax.random.PRNGKey(0), cfg))
    # layout: linear kernels transposed, conv OIHW->HWIO, tables verbatim
    np.testing.assert_array_equal(
        p["blocks"][0]["attn"]["qkv"]["kernel"], sd["backbone.blocks.0.attn.qkv.weight"].T
    )
    np.testing.assert_array_equal(
        p["patch_embed"]["proj"]["kernel"],
        sd["backbone.patch_embed.proj.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_array_equal(
        p["blocks"][0]["attn"]["rel_pos_h"], sd["backbone.blocks.0.attn.rel_pos_h"]
    )


def test_vit_converted_forward_runs(rng):
    from rba_tpu.models.vit import vit_apply

    cfg = _tiny_vit_cfg()
    sd = _vit_sd(cfg, rng)
    p = jax.tree.map(jnp.asarray, convert_vit_backbone(sd))
    out = vit_apply(p, cfg, jnp.asarray(rng.rand(1, 32, 48, 3), jnp.float32),
                    compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(out["last_feat"])).all()


def test_sfp_converter_structure(rng):
    from rba_tpu.models.vit import sfp_init

    dim, out = 32, 16
    sd = {}
    # scale 4 (simfp_2): convT@0, LN@1, GELU@2, convT@3, lateral@4, output@5
    sd["backbone.simfp_2.0.weight"] = rng.randn(dim, dim // 2, 2, 2).astype(np.float32)
    sd["backbone.simfp_2.0.bias"] = rng.randn(dim // 2).astype(np.float32)
    _ln(sd, "backbone.simfp_2.1", dim // 2, rng)
    sd["backbone.simfp_2.3.weight"] = rng.randn(dim // 2, dim // 4, 2, 2).astype(np.float32)
    sd["backbone.simfp_2.3.bias"] = rng.randn(dim // 4).astype(np.float32)
    for pre, cin, lat, outp in (
        ("backbone.simfp_2", dim // 4, 4, 5),
        ("backbone.simfp_3", dim // 2, 1, 2),
        ("backbone.simfp_4", dim, 0, 1),
        ("backbone.simfp_5", dim, 1, 2),
    ):
        _conv(sd, f"{pre}.{lat}", cin, out, 1, rng, bias=False)
        _ln(sd, f"{pre}.{lat}.norm", out, rng)
        _conv(sd, f"{pre}.{outp}", out, out, 3, rng, bias=False)
        _ln(sd, f"{pre}.{outp}.norm", out, rng)
    sd["backbone.simfp_3.0.weight"] = rng.randn(dim, dim // 2, 2, 2).astype(np.float32)
    sd["backbone.simfp_3.0.bias"] = rng.randn(dim // 2).astype(np.float32)

    p = convert_sfp(sd)
    _assert_same_tree(p, sfp_init(jax.random.PRNGKey(0), dim, out))
    # ConvTranspose IOHW -> HWIO
    np.testing.assert_array_equal(
        p["stages"][0]["up1"]["kernel"],
        sd["backbone.simfp_2.0.weight"].transpose(2, 3, 0, 1),
    )


# ---------------------------------------------------------------------------
# MViT
# ---------------------------------------------------------------------------

def _tiny_mvit_cfg():
    from rba_tpu.models.mvit import MViTConfig

    return MViTConfig(
        img_size=64, embed_dim=16, depth=4, num_heads=1,
        last_block_indexes=(0, 1, 2, 3), adaptive_window_size=8,
        adaptive_kv_stride=2,
    )


def test_mvit_converter_structure(rng):
    from rba_tpu.config import tiny_test_config
    from rba_tpu.models.mvit import _block_schedule, mvit_init

    cfg = _tiny_mvit_cfg()
    sched = _block_schedule(cfg)
    sd = {}
    _conv(sd, "backbone.patch_embed.proj", 3, cfg.embed_dim, cfg.patch_kernel[0], rng)
    for i, s in enumerate(sched):
        pre = f"backbone.blocks.{i}"
        dim, dim_out, heads = s["dim"], s["dim_out"], s["heads"]
        hd = dim_out // heads
        _ln(sd, pre + ".norm1", dim, rng)
        _lin(sd, pre + ".attn.qkv", dim, 3 * dim_out, rng)
        _lin(sd, pre + ".attn.proj", dim_out, dim_out, rng)
        for nm in ("q", "k", "v"):
            _conv(sd, pre + f".attn.pool_{nm}", hd, hd, 3, rng, bias=False, groups=hd)
            _ln(sd, pre + f".attn.norm_{nm}", hd, rng)
        rel_dim = 2 * max(s["input_size"] // s["stride_q"], s["input_size"] // s["stride_kv"]) - 1
        sd[pre + ".attn.rel_pos_h"] = rng.randn(rel_dim, hd).astype(np.float32) * 0.02
        sd[pre + ".attn.rel_pos_w"] = rng.randn(rel_dim, hd).astype(np.float32) * 0.02
        _ln(sd, pre + ".norm2", dim_out, rng)
        _lin(sd, pre + ".mlp.fc1", dim_out, int(dim_out * cfg.mlp_ratio), rng)
        _lin(sd, pre + ".mlp.fc2", int(dim_out * cfg.mlp_ratio), dim_out, rng)
        if dim != dim_out:
            _lin(sd, pre + ".proj", dim, dim_out, rng)
    for k, i in zip((2, 3, 4, 5), cfg.last_block_indexes):
        _ln(sd, f"backbone.scale{k}_norm", sched[i]["dim_out"], rng)

    p = convert_mvit_backbone(sd, tiny_test_config())
    _assert_same_tree(p, mvit_init(jax.random.PRNGKey(0), cfg))
    # depthwise pool conv (C,1,k,k) -> (k,k,1,C)
    np.testing.assert_array_equal(
        p["blocks"][0]["attn"]["pool_q"]["kernel"],
        sd["backbone.blocks.0.attn.pool_q.weight"].transpose(2, 3, 1, 0),
    )


# ---------------------------------------------------------------------------
# MixTransformer
# ---------------------------------------------------------------------------

def test_mit_converter_structure_and_forward(rng):
    from rba_tpu.models.mix_transformer import MIT_VARIANTS, mit_apply, mit_init

    cfg = MIT_VARIANTS["mit_b0"]
    sd = {}
    in_ch = 3
    patch = ((7, 4), (3, 2), (3, 2), (3, 2))
    for s in range(1, 5):
        dim = cfg.embed_dims[s - 1]
        k, _ = patch[s - 1]
        _conv(sd, f"backbone.patch_embed{s}.proj", in_ch, dim, k, rng)
        _ln(sd, f"backbone.patch_embed{s}.norm", dim, rng)
        for b in range(cfg.depths[s - 1]):
            pre = f"backbone.block{s}.{b}"
            _ln(sd, pre + ".norm1", dim, rng)
            _lin(sd, pre + ".attn.q", dim, dim, rng)
            _lin(sd, pre + ".attn.kv", dim, 2 * dim, rng)
            _lin(sd, pre + ".attn.proj", dim, dim, rng)
            if cfg.sr_ratios[s - 1] > 1:
                _conv(sd, pre + ".attn.sr", dim, dim, cfg.sr_ratios[s - 1], rng)
                _ln(sd, pre + ".attn.norm", dim, rng)
            _ln(sd, pre + ".norm2", dim, rng)
            hidden = dim * cfg.mlp_ratios[s - 1]
            _lin(sd, pre + ".mlp.fc1", dim, hidden, rng)
            _conv(sd, pre + ".mlp.dwconv.dwconv", hidden, hidden, 3, rng, groups=hidden)
            _lin(sd, pre + ".mlp.fc2", hidden, dim, rng)
        _ln(sd, f"backbone.norm{s}", dim, rng)
        in_ch = dim

    p = convert_mit_backbone(sd)
    _assert_same_tree(p, mit_init(jax.random.PRNGKey(0), cfg))

    out = mit_apply(
        jax.tree.map(jnp.asarray, p), cfg,
        jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32), compute_dtype=jnp.float32,
    )
    for f in ("res2", "res3", "res4", "res5"):
        assert np.isfinite(np.asarray(out[f])).all()


# ---------------------------------------------------------------------------
# WideResNet-38 A2
# ---------------------------------------------------------------------------

def test_wideresnet_converter_structure_and_forward(rng):
    from rba_tpu.models.wideresnet import (
        MODULE_CHANNELS,
        WideResNetConfig,
        _first_block_stride,
        wideresnet_apply,
        wideresnet_init,
    )

    cfg = WideResNetConfig(structure=(1, 1, 1, 1, 1, 1))
    sd = {}
    _conv(sd, "backbone.mod1.conv1", 3, 64, 3, rng, bias=False)
    in_ch = 64
    for mod in range(2, 8):
        chans = MODULE_CHANNELS[mod - 2]
        for b in range(1, cfg.structure[mod - 2] + 1):
            pre = f"backbone.mod{mod}.block{b}"
            _bn(sd, pre + ".bn1", in_ch, rng)
            if len(chans) == 2:
                _conv(sd, pre + ".convs.conv1", in_ch, chans[0], 3, rng, bias=False)
                _bn(sd, pre + ".convs.bn2", chans[0], rng)
                _conv(sd, pre + ".convs.conv2", chans[0], chans[1], 3, rng, bias=False)
            else:
                _conv(sd, pre + ".convs.conv1", in_ch, chans[0], 1, rng, bias=False)
                _bn(sd, pre + ".convs.bn2", chans[0], rng)
                _conv(sd, pre + ".convs.conv2", chans[0], chans[1], 3, rng, bias=False)
                _bn(sd, pre + ".convs.bn3", chans[1], rng)
                _conv(sd, pre + ".convs.conv3", chans[1], chans[2], 1, rng, bias=False)
            stride = _first_block_stride(mod, cfg.dilation) if b == 1 else 1
            if stride != 1 or in_ch != chans[-1]:
                _conv(sd, pre + ".proj_conv", in_ch, chans[-1], 1, rng, bias=False)
            in_ch = chans[-1]
    _bn(sd, "backbone.bn_out", in_ch, rng)

    p = convert_wideresnet_backbone(sd)
    _assert_same_tree(p, wideresnet_init(jax.random.PRNGKey(0), cfg))

    out = wideresnet_apply(
        jax.tree.map(jnp.asarray, p), cfg,
        jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32), compute_dtype=jnp.float32,
    )
    for f in ("res4", "res5", "res6", "res7", "res7_bn"):
        assert np.isfinite(np.asarray(out[f])).all()
