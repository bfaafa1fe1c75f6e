"""The standard (non-1dl) Mask2Former configuration: 3 deformable levels
(res3/res4/res5) and round-robin cross-attention over them — exercising the
multi-level paths of the pixel decoder and masked decoder."""
import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from rba_tpu.config import DecoderConfig, PixelDecoderConfig, SwinConfig, tiny_test_config
from rba_tpu.models.maskformer import maskformer_forward, maskformer_infer, maskformer_init, preprocess


def _three_level_config():
    base = tiny_test_config()
    return dataclasses.replace(
        base,
        swin=SwinConfig(
            embed_dim=32, depths=(2, 2, 2, 2), num_heads=(2, 2, 4, 4), window_size=4,
            out_features=("res2", "res3", "res4", "res5"),
        ),
        pixel_decoder=PixelDecoderConfig(
            conv_dim=64, mask_dim=64,
            transformer_in_features=("res3", "res4", "res5"),
            in_features=("res2", "res3", "res4", "res5"),
            transformer_enc_layers=2, transformer_nheads=4,
            transformer_dim_feedforward=128,
        ),
        decoder=DecoderConfig(
            hidden_dim=64, num_queries=10, nheads=4, dim_feedforward=128,
            dec_layers=6,  # 2 round-robin passes over 3 levels
            mask_dim=64, num_feature_levels=3,
        ),
    )


def test_three_level_forward_shapes():
    cfg = _three_level_config()
    params = maskformer_init(jax.random.PRNGKey(0), cfg)
    x = preprocess(cfg, jnp.ones((1, 64, 96, 3)) * 127)
    out = maskformer_forward(params, cfg, x)
    assert out["pred_logits"].shape == (1, 10, cfg.num_classes + 1)
    assert out["pred_masks"].shape == (1, 10, 16, 24)  # stride 4
    assert len(out["aux_outputs"]) == 6
    for v in jax.tree.leaves(out):
        assert np.isfinite(np.asarray(v)).all()


def test_three_level_infer():
    cfg = _three_level_config()
    params = maskformer_init(jax.random.PRNGKey(1), cfg)
    img = jnp.ones((1, 64, 96, 3)) * 100
    out = maskformer_infer(params, cfg, img)
    assert out["rba"].shape == (1, 64, 96)
    assert np.isfinite(np.asarray(out["rba"])).all()


def test_three_level_multiscale_features_order():
    """multi_scale_features must be the encoder outputs in top-down order
    (res3 enc, res4 enc, res5 enc reversed: res5 first) matching
    msdeformattn.py:344-365 (out[0] is the lowest-resolution level)."""
    from rba_tpu.models.pixel_decoder import pixel_decoder_apply, pixel_decoder_init

    cfg = _three_level_config()
    in_ch = cfg.swin.out_channels
    params = pixel_decoder_init(jax.random.PRNGKey(0), cfg.pixel_decoder, in_ch)
    feats = {
        "res2": jnp.ones((1, 16, 24, 32)),
        "res3": jnp.ones((1, 8, 12, 64)),
        "res4": jnp.ones((1, 4, 6, 128)),
        "res5": jnp.ones((1, 2, 3, 256)),
    }
    mask_features, enc_feat, ms = pixel_decoder_apply(params, cfg.pixel_decoder, feats)
    assert mask_features.shape == (1, 16, 24, 64)
    assert len(ms) == 3
    assert ms[0].shape[1:3] == (2, 3)  # res5 (lowest res) first
    assert ms[1].shape[1:3] == (4, 6)
    assert ms[2].shape[1:3] == (8, 12)
