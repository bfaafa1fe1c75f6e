import numpy as np

import jax
import jax.numpy as jnp

from rba_tpu.config import tiny_test_config
from rba_tpu.models.baseline_heads import (
    fpn_pixel_decoder_apply,
    fpn_pixel_decoder_init,
    per_pixel_head_apply,
    per_pixel_head_init,
    standard_decoder_apply,
    standard_decoder_init,
)


def _feats(cfg):
    return {
        "res2": jnp.ones((2, 16, 24, 32)),
        "res3": jnp.ones((2, 8, 12, 64)),
    }


def test_fpn_pixel_decoder():
    cfg = tiny_test_config()
    params = fpn_pixel_decoder_init(
        jax.random.PRNGKey(0), cfg.pixel_decoder, cfg.swin.out_channels
    )
    mask_features, _, ms = fpn_pixel_decoder_apply(params, cfg.pixel_decoder, _feats(cfg))
    assert mask_features.shape == (2, 16, 24, cfg.pixel_decoder.mask_dim)
    assert ms[0].shape[1:3] == (8, 12)  # lowest-res first
    assert np.isfinite(np.asarray(mask_features)).all()


def test_standard_decoder():
    cfg = tiny_test_config()
    params = standard_decoder_init(jax.random.PRNGKey(0), cfg, in_channels=64,
                                   enc_layers=1, dec_layers=2)
    x = jnp.ones((2, 8, 12, 64))
    mask_features = jnp.ones((2, 16, 24, cfg.decoder.mask_dim))
    out = standard_decoder_apply(params, cfg, x, mask_features)
    assert out["pred_logits"].shape == (2, cfg.decoder.num_queries, cfg.num_classes + 1)
    assert out["pred_masks"].shape == (2, cfg.decoder.num_queries, 16, 24)


def test_per_pixel_head():
    cfg = tiny_test_config()
    params = per_pixel_head_init(jax.random.PRNGKey(0), cfg, cfg.swin.out_channels)
    logits = per_pixel_head_apply(params, cfg, _feats(cfg))
    assert logits.shape == (2, cfg.num_classes, 16, 24)
