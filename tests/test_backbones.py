import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp


def test_mix_transformer_shapes():
    from rba_tpu.models.mix_transformer import MIT_VARIANTS, mit_apply, mit_init

    cfg = MIT_VARIANTS["mit_b0"]
    params = mit_init(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 64, 96, 3))
    outs = mit_apply(params, cfg, x, compute_dtype=jnp.float32)
    assert outs["res2"].shape == (1, 16, 24, 32)
    assert outs["res3"].shape == (1, 8, 12, 64)
    assert outs["res4"].shape == (1, 4, 6, 160)
    assert outs["res5"].shape == (1, 2, 3, 256)


def test_mix_transformer_attention_matches_torch(rng):
    """Spatial-reduction attention vs a direct torch construction."""
    import torch.nn as nn

    from rba_tpu.models.mix_transformer import MiTConfig, _attention
    from tests.test_decoder import t2j_linear, t2j_ln

    dim, heads, sr = 32, 2, 2
    h, w = 8, 12
    q_l = nn.Linear(dim, dim)
    kv_l = nn.Linear(dim, 2 * dim)
    proj_l = nn.Linear(dim, dim)
    sr_conv = nn.Conv2d(dim, dim, sr, stride=sr)
    sr_norm = nn.LayerNorm(dim, eps=1e-6)

    x = rng.randn(2, h * w, dim).astype(np.float32)
    with torch.no_grad():
        xt = torch.from_numpy(x)
        q = q_l(xt).reshape(2, h * w, heads, dim // heads).permute(0, 2, 1, 3)
        x_ = xt.permute(0, 2, 1).reshape(2, dim, h, w)
        x_ = sr_conv(x_).reshape(2, dim, -1).permute(0, 2, 1)
        x_ = sr_norm(x_)
        kv = kv_l(x_).reshape(2, -1, 2, heads, dim // heads).permute(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        attn = (q @ k.transpose(-2, -1)) * (dim // heads) ** -0.5
        attn = attn.softmax(dim=-1)
        want = proj_l((attn @ v).transpose(1, 2).reshape(2, h * w, dim)).numpy()

    p = {
        "q": t2j_linear(q_l),
        "kv": t2j_linear(kv_l),
        "proj": t2j_linear(proj_l),
        "sr": {
            "kernel": jnp.asarray(sr_conv.weight.detach().numpy().transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(sr_conv.bias.detach().numpy()),
        },
        "sr_norm": t2j_ln(sr_norm),
    }
    got = _attention(p, jnp.asarray(x), h, w, heads, sr, 1e-6)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_wideresnet_shapes():
    from rba_tpu.models.wideresnet import WideResNetConfig, wideresnet_apply, wideresnet_init

    cfg = WideResNetConfig(structure=(1, 1, 1, 1, 1, 1), dilation=True)
    params = wideresnet_init(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 64, 64, 3))
    outs = wideresnet_apply(params, cfg, x, compute_dtype=jnp.float32)
    # dilation=True: everything at stride 8 after mod4; channels follow the
    # reference's [2^9..2^12, 2^12] table (wideresnet38.py:370-378)
    assert outs["res4"].shape == (1, 8, 8, 512)
    assert outs["res5"].shape == (1, 8, 8, 1024)
    assert outs["res6"].shape == (1, 8, 8, 2048)
    assert outs["res7"].shape == (1, 8, 8, 4096)
    assert outs["res7_bn"].shape == (1, 8, 8, 4096)


def test_vit_shapes():
    from rba_tpu.models.vit import ViTConfig, sfp_apply, sfp_init, vit_apply, vit_init

    cfg = ViTConfig(embed_dim=64, depth=2, num_heads=2, window_size=4,
                    window_block_indexes=(0,), pretrain_img_size=64)
    params = vit_init(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 64, 96, 3))
    outs = vit_apply(params, cfg, x, compute_dtype=jnp.float32)
    assert outs["last_feat"].shape == (1, 4, 6, 64)

    sfp = sfp_init(jax.random.PRNGKey(1), 64, out_channels=32)
    pyr = sfp_apply(sfp, outs["last_feat"])
    assert pyr["res2"].shape == (1, 16, 24, 32)
    assert pyr["res3"].shape == (1, 8, 12, 32)
    assert pyr["res4"].shape == (1, 4, 6, 32)
    assert pyr["res5"].shape == (1, 2, 3, 32)


def test_vit_rel_pos_matches_torch(rng):
    """Decomposed rel-pos attention vs the ViTDet formula in torch."""
    import torch.nn.functional as F

    from rba_tpu.models.vit import _rel_pos_resampled

    # same-size q/k path (the live config)
    rel = rng.randn(2 * 7 - 1, 8).astype(np.float32)
    got = np.asarray(_rel_pos_resampled(jnp.asarray(rel), 7, 7))
    q_coords = np.arange(7)[:, None]
    k_coords = np.arange(7)[None, :]
    idx = (q_coords - k_coords) + 6
    np.testing.assert_allclose(got, rel[idx], atol=1e-6)

    # resampled path vs torch F.interpolate(linear)
    rel2 = rng.randn(9, 8).astype(np.float32)
    got2 = np.asarray(_rel_pos_resampled(jnp.asarray(rel2), 7, 7))
    want_tab = F.interpolate(
        torch.from_numpy(rel2).reshape(1, 9, 8).permute(0, 2, 1), size=13, mode="linear"
    ).reshape(8, 13).permute(1, 0).numpy()
    np.testing.assert_allclose(got2, want_tab[idx], rtol=1e-4, atol=1e-5)


def test_mvit_shapes():
    from rba_tpu.models.mvit import MViTConfig, mvit_apply, mvit_init

    cfg = MViTConfig(
        img_size=64, embed_dim=32, depth=4, num_heads=1,
        last_block_indexes=(0, 1, 2, 3), adaptive_kv_stride=2, adaptive_window_size=8,
    )
    params = mvit_init(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 64, 64, 3))
    outs = mvit_apply(params, cfg, x, compute_dtype=jnp.float32)
    assert outs["scale2"].shape == (1, 16, 16, 32)
    assert outs["scale3"].shape == (1, 8, 8, 64)
    assert outs["scale4"].shape == (1, 4, 4, 128)
    assert outs["scale5"].shape == (1, 2, 2, 256)
