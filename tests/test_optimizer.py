import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
import optax

from rba_tpu.config import SolverConfig, tiny_test_config
from rba_tpu.models.maskformer import maskformer_init
from rba_tpu.train.optimizer import build_optimizer, poly_lr_schedule


def test_poly_lr_schedule_matches_reference_formula():
    """WarmupPolyLR: lr·(1 − t/T)^0.9 with linear warmup (train_net.py:282-301)."""
    s = SolverConfig(base_lr=1e-4, max_iter=1000, warmup_iters=100, warmup_factor=0.1,
                     poly_lr_power=0.9)
    sched = poly_lr_schedule(s)
    # at t=0: warmup_factor * base * poly(0)
    np.testing.assert_allclose(float(sched(0)), 1e-4 * 0.1, rtol=1e-6)
    # end of warmup
    np.testing.assert_allclose(
        float(sched(100)), 1e-4 * (1 - 100 / 1000) ** 0.9, rtol=1e-5
    )
    # mid-training
    t = 500
    np.testing.assert_allclose(float(sched(t)), 1e-4 * (1 - t / 1000) ** 0.9, rtol=1e-5)
    # final step ~0
    assert float(sched(1000)) == 0.0


def test_optimizer_param_groups():
    """Backbone LR multiplier and no-decay masks actually shape the update."""
    cfg = tiny_test_config()
    params = maskformer_init(jax.random.PRNGKey(0), cfg)
    tx = build_optimizer(cfg, params)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)

    # backbone updates scaled by backbone_multiplier relative to head updates
    u_backbone = float(jnp.abs(updates["backbone"]["patch_embed"]["proj"]["kernel"]).mean())
    u_head = float(
        jnp.abs(updates["sem_seg_head"]["predictor"]["class_embed"]["kernel"]).mean()
    )
    ratio = u_backbone / u_head
    assert 0.05 < ratio < 0.2, ratio  # ≈ 0.1 (weight-decay term perturbs slightly)


def test_frozen_backbone():
    cfg = dataclasses.replace(
        tiny_test_config(),
        solver=SolverConfig(freeze_backbone=True),
    )
    params = maskformer_init(jax.random.PRNGKey(0), cfg)
    tx = build_optimizer(cfg, params)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["backbone"]["patch_embed"]["proj"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(updates["sem_seg_head"]["predictor"]["class_embed"]["kernel"]).max()) > 0


def test_global_norm_clip():
    cfg = tiny_test_config()
    params = maskformer_init(jax.random.PRNGKey(0), cfg)
    tx = build_optimizer(cfg, params)
    state = tx.init(params)
    big = jax.tree.map(lambda p: 1e3 * jnp.ones_like(p), params)
    clipped, _ = optax.clip_by_global_norm(cfg.solver.clip_value).update(big, optax.EmptyState())
    assert float(optax.global_norm(clipped)) <= cfg.solver.clip_value * 1.001


def test_fixed_matcher_wiring(rng):
    from rba_tpu.config import LossConfig
    from rba_tpu.models.maskformer import maskformer_forward, preprocess
    from rba_tpu.train.criterion import criterion

    cfg = dataclasses.replace(tiny_test_config(), loss=LossConfig(matcher="FixedMatcher"))
    params = maskformer_init(jax.random.PRNGKey(0), cfg)
    b, t, hw = 1, 3, 32
    batch = {
        "gt_labels": jnp.asarray(rng.randint(0, cfg.num_classes, (b, t)), jnp.int32),
        "gt_masks": jnp.asarray((rng.rand(b, t, hw, hw) > 0.5).astype(np.float32)),
        "gt_valid": jnp.ones((b, t), jnp.float32),
    }
    x = preprocess(cfg, jnp.ones((b, hw, hw, 3)) * 100)
    out = maskformer_forward(params, cfg, x)
    losses = criterion(cfg, jax.random.PRNGKey(1), out, batch)
    assert np.isfinite(float(losses["total"]))
