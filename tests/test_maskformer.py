import numpy as np

import jax
import jax.numpy as jnp

from rba_tpu.config import tiny_test_config
from rba_tpu.models.maskformer import (
    maskformer_forward,
    maskformer_infer,
    maskformer_init,
    preprocess,
)


def test_preprocess_pads_to_divisibility():
    cfg = tiny_test_config()
    x = jnp.ones((1, 50, 70, 3)) * 128.0
    y = preprocess(cfg, x)
    assert y.shape == (1, 64, 96, 3)  # padded to 32-divisible
    # padding region is zero post-normalization
    assert float(jnp.abs(y[:, 50:, :, :]).max()) == 0.0
    assert float(jnp.abs(y[:, :, 70:, :]).max()) == 0.0


def test_end_to_end_infer_shapes():
    cfg = tiny_test_config()
    params = maskformer_init(jax.random.PRNGKey(0), cfg)
    img = jnp.asarray(np.random.RandomState(0).rand(1, 48, 64, 3) * 255, jnp.float32)
    out = jax.jit(
        lambda p, x: maskformer_infer(p, cfg, x, out_hw=(97, 130))
    )(params, img)
    assert out["sem_seg"].shape == (1, cfg.num_classes, 97, 130)
    assert out["rba"].shape == (1, 97, 130)
    assert np.isfinite(np.asarray(out["sem_seg"])).all()
    assert np.isfinite(np.asarray(out["rba"])).all()
    # RbA score bounds: each tanh term in [-1,1], sum over K classes
    rba = np.asarray(out["rba"])
    assert rba.min() >= -cfg.num_classes - 1e-4
    assert rba.max() <= cfg.num_classes + 1e-4


def test_forward_training_outputs():
    cfg = tiny_test_config()
    params = maskformer_init(jax.random.PRNGKey(1), cfg)
    x = preprocess(cfg, jnp.ones((2, 64, 64, 3)) * 100)
    out = maskformer_forward(params, cfg, x)
    q = cfg.decoder.num_queries
    assert out["pred_logits"].shape == (2, q, cfg.num_classes + 1)
    assert out["pred_masks"].shape == (2, q, 16, 16)  # stride 4
    assert len(out["aux_outputs"]) == cfg.decoder.dec_layers
