import numpy as np
import torch

import jax
import jax.numpy as jnp

from rba_tpu.config import tiny_test_config
from rba_tpu.models.pixel_decoder import (
    _reference_points_np,
    encoder_layer_apply,
    ms_deform_attn_apply,
    pixel_decoder_apply,
    pixel_decoder_init,
)
from tests.test_decoder import t2j_linear, t2j_ln


def _t2j_deform_attn(tm):
    return {
        "sampling_offsets": t2j_linear(tm.sampling_offsets),
        "attention_weights": t2j_linear(tm.attention_weights),
        "value_proj": t2j_linear(tm.value_proj),
        "output_proj": t2j_linear(tm.output_proj),
    }


def test_deform_attn_module_parity(rng):
    from tests.torch_refs import TorchDeformAttnModule

    d, L, M, P = 32, 2, 4, 3
    shapes = ((6, 8), (3, 4))
    s = sum(h * w for h, w in shapes)
    tm = TorchDeformAttnModule(d, L, M, P)
    with torch.no_grad():
        tm.sampling_offsets.weight.normal_(0, 0.02)
        tm.sampling_offsets.bias.normal_(0, 0.5)

    query = rng.randn(2, s, d).astype(np.float32)
    src = rng.randn(2, s, d).astype(np.float32)
    ref = _reference_points_np(shapes)[None].repeat(2, axis=0).astype(np.float32)

    want = tm(
        torch.from_numpy(query), torch.from_numpy(ref), torch.from_numpy(src), list(shapes)
    ).detach().numpy()
    got = ms_deform_attn_apply(
        _t2j_deform_attn(tm), jnp.asarray(query), jnp.asarray(ref), jnp.asarray(src),
        shapes, n_heads=M, n_points=P,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_deform_encoder_layer_parity(rng):
    from tests.torch_refs import TorchDeformEncoderLayer

    d, L, M, P, ffn = 32, 1, 4, 4, 64
    shapes = ((5, 7),)
    s = 35
    tl = TorchDeformEncoderLayer(d, ffn, L, M, P)
    with torch.no_grad():
        tl.attn.sampling_offsets.weight.normal_(0, 0.02)
        tl.attn.sampling_offsets.bias.normal_(0, 0.5)

    src = rng.randn(2, s, d).astype(np.float32)
    pos = rng.randn(2, s, d).astype(np.float32)
    ref = _reference_points_np(shapes)[None].repeat(2, axis=0).astype(np.float32)

    want = tl(
        torch.from_numpy(src), torch.from_numpy(pos), torch.from_numpy(ref), list(shapes)
    ).detach().numpy()

    params = {
        "self_attn": _t2j_deform_attn(tl.attn),
        "norm1": t2j_ln(tl.norm1),
        "linear1": t2j_linear(tl.linear1),
        "linear2": t2j_linear(tl.linear2),
        "norm2": t2j_ln(tl.norm2),
    }
    got = encoder_layer_apply(
        params, jnp.asarray(src), jnp.asarray(pos), jnp.asarray(ref), shapes, M, P
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_group_norm_matches_torch(rng):
    from rba_tpu.ops.nn import group_norm

    x = rng.randn(2, 5, 7, 64).astype(np.float32)
    gn = torch.nn.GroupNorm(32, 64)
    with torch.no_grad():
        gn.weight.normal_(1, 0.2)
        gn.bias.normal_(0, 0.2)
    want = gn(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy().transpose(0, 2, 3, 1)
    params = {
        "scale": jnp.asarray(gn.weight.detach().numpy()),
        "bias": jnp.asarray(gn.bias.detach().numpy()),
    }
    got = group_norm(params, jnp.asarray(x), num_groups=32)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_reference_points_center_grid():
    ref = _reference_points_np(((2, 4),))
    assert ref.shape == (8, 1, 2)
    # first point is the center of the top-left cell: ((0.5/4), (0.5/2))
    np.testing.assert_allclose(ref[0, 0], [0.125, 0.25])
    np.testing.assert_allclose(ref[-1, 0], [0.875, 0.75])


def test_pixel_decoder_shapes():
    cfg = tiny_test_config()
    in_channels = cfg.swin.out_channels  # res2: 32, res3: 64
    params = pixel_decoder_init(jax.random.PRNGKey(0), cfg.pixel_decoder, in_channels)
    feats = {
        "res2": jnp.ones((2, 16, 24, 32)),
        "res3": jnp.ones((2, 8, 12, 64)),
    }
    mask_features, enc_feat, ms = pixel_decoder_apply(params, cfg.pixel_decoder, feats)
    assert mask_features.shape == (2, 16, 24, cfg.pixel_decoder.mask_dim)
    assert enc_feat.shape == (2, 8, 12, cfg.pixel_decoder.conv_dim)
    assert len(ms) == 1 and ms[0].shape == (2, 8, 12, cfg.pixel_decoder.conv_dim)


def test_conv2d_3x3_rowtiled_matches_plain_conv():
    """The manual space-to-batch 3x3 conv is bit-equivalent arithmetic per
    output pixel for ANY batch (images fold into the tile axis), and falls
    back to the plain conv when rows don't tile."""
    from rba_tpu.ops.nn import conv2d, conv2d_3x3_rowtiled

    rs = np.random.RandomState(0)
    params = {
        "kernel": jnp.asarray(rs.randn(3, 3, 5, 7).astype(np.float32)),
        "bias": jnp.asarray(rs.randn(7).astype(np.float32)),
    }
    for n, h, w in [(1, 16, 12), (2, 16, 12), (3, 24, 8), (2, 13, 8)]:
        x = jnp.asarray(rs.randn(n, h, w, 5).astype(np.float32))
        got = conv2d_3x3_rowtiled(params, x)
        want = conv2d(params, x, padding=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
