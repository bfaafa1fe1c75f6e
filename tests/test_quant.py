"""Weight-only int8 experiment (ops/quant.py): eligibility rules + end-to-end
score sanity through the evaluator hook (cfg.weight_quant="int8")."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import jax
import pytest

from rba_tpu.config import tiny_test_config
from rba_tpu.models.maskformer import maskformer_init
from rba_tpu.ops.nn import linear
from rba_tpu.ops.quant import count_quantized, quantize_linear_int8, quantize_params_int8


def test_quantize_linear_roundtrip_error():
    rng = np.random.RandomState(0)
    k = rng.randn(128, 256).astype(np.float32) * 0.05
    p = {"kernel": jnp.asarray(k), "bias": jnp.asarray(rng.randn(256), jnp.float32)}
    q = quantize_linear_int8(p)
    assert q["kernel_q"].dtype == jnp.int8
    deq = np.asarray(q["kernel_q"], np.float32) * np.asarray(q["kscale"])
    # symmetric per-channel: error bounded by scale/2 = amax/254 per element
    amax = np.abs(k).max(axis=0)
    assert (np.abs(deq - k) <= amax / 254.0 + 1e-8).all()
    # linear() consumes the quantized dict
    x = jnp.asarray(rng.randn(4, 128), jnp.float32)
    y = linear(q, x)
    yref = x @ jnp.asarray(deq) + p["bias"]
    np.testing.assert_allclose(np.asarray(y), np.asarray(yref), rtol=1e-5, atol=1e-5)


def test_eligibility_rules():
    params = {
        "patch_embed": {"proj": {"kernel": jnp.zeros((4, 4, 3, 96)), "bias": jnp.zeros(96)}},
        "in_proj": {"kernel": jnp.ones((256, 768)), "bias": jnp.zeros(768)},
        "big": {"kernel": jnp.ones((128, 512)), "bias": jnp.zeros(512)},
        "tiny_head": {"kernel": jnp.ones((256, 20)), "bias": jnp.zeros(20)},
        "blocks": [{"fc": {"kernel": jnp.ones((64, 64)), "bias": None}}],
    }
    q = quantize_params_int8(params)
    assert "kernel" in q["patch_embed"]["proj"]  # conv: 4-D kernel kept
    assert "kernel" in q["in_proj"]  # raw-access name skipped
    assert "kernel_q" in q["big"]
    assert "kernel" in q["tiny_head"]  # min dim 20 < 64
    assert "kernel_q" in q["blocks"][0]["fc"]
    stats = count_quantized(q)
    assert stats["quantized"] == 2


def test_int8_scores_close_to_fp(tiny_cfg=None):
    cfg = tiny_test_config()
    params = maskformer_init(jax.random.PRNGKey(0), cfg)
    from rba_tpu.evalx.evaluator import make_score_fn

    img = np.asarray(
        np.random.RandomState(1).rand(1, 64, 96, 3) * 255, np.float32
    )
    s_fp = np.asarray(make_score_fn(cfg, params)(img))
    cfg8 = dataclasses.replace(cfg, weight_quant="int8")
    s_q = np.asarray(make_score_fn(cfg8, params)(img))
    assert np.isfinite(s_q).all()
    # int8 weights perturb logits but the RbA score map must stay close in
    # rank terms; guard with a loose absolute bound (score range is [-K, K])
    assert np.abs(s_q - s_fp).mean() < 0.5


def test_config_dependent_skip_names():
    """MViT's proj and the fused-MLP fc1/fc2 are accessed as raw ["kernel"]
    in their modules; quantizing them would KeyError at trace time
    (ADVICE r4) — cfg-aware quantization must leave them fp."""
    from rba_tpu.ops.quant import config_skip_names

    cfg = tiny_test_config()
    assert config_skip_names(None) == frozenset()
    assert config_skip_names(cfg) == frozenset()
    mvit_cfg = dataclasses.replace(cfg, backbone_name="mvit")
    assert "proj" in config_skip_names(mvit_cfg)
    fused_cfg = dataclasses.replace(
        cfg, swin=dataclasses.replace(cfg.swin, mlp_impl="fused")
    )
    assert config_skip_names(fused_cfg) >= {"fc1", "fc2"}

    params = {
        "proj": {"kernel": jnp.ones((128, 128)), "bias": jnp.zeros(128)},
        "fc1": {"kernel": jnp.ones((128, 512)), "bias": jnp.zeros(512)},
        "other": {"kernel": jnp.ones((128, 512)), "bias": jnp.zeros(512)},
    }
    q = quantize_params_int8(params, cfg=mvit_cfg)
    assert "kernel" in q["proj"] and "kernel_q" in q["fc1"] and "kernel_q" in q["other"]
    q = quantize_params_int8(params, cfg=fused_cfg)
    assert "kernel_q" in q["proj"] and "kernel" in q["fc1"]
