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


def test_full_optimizer_chain_matches_torch_adamw():
    """The whole update math — global-norm clip → Adam moments → decoupled
    weight decay → per-group LR multiplier → WarmupPolyLR — against
    torch.optim.AdamW driven exactly like the reference trainer
    (clip_grad_norm_ over all params, per-group lr = mult·schedule(t),
    decay only on decay-eligible leaves), over steps that cross the warmup
    boundary.  Group ASSIGNMENT parity is covered by
    test_optimizer_param_groups; this pins the arithmetic: optax's
    add_decayed_weights-then-lr-scale equals torch AdamW's
    p·(1−lr_g·wd) decoupled decay because both multiply decay by the
    group learning rate."""
    import torch

    from rba_tpu.train.optimizer import _is_backbone, _is_no_decay, _path_str

    cfg = dataclasses.replace(
        tiny_test_config(),
        solver=SolverConfig(
            base_lr=3e-3, weight_decay=0.05, backbone_multiplier=0.1,
            clip_gradients=True, clip_value=0.01, max_iter=50,
            warmup_iters=3, warmup_factor=0.1,
        ),
    )
    params = maskformer_init(jax.random.PRNGKey(0), cfg)
    tx = build_optimizer(cfg, params)
    sched = poly_lr_schedule(cfg.solver)

    leaves_p, treedef = jax.tree_util.tree_flatten_with_path(params)
    paths = [_path_str(p) for p, _ in leaves_p]
    tparams = [
        torch.nn.Parameter(torch.from_numpy(np.asarray(v, np.float32).copy()))
        for _, v in leaves_p
    ]
    opt = torch.optim.AdamW(
        [
            {
                "params": [tp],
                "lr": 1.0,  # set per step from the schedule
                "weight_decay": 0.0 if _is_no_decay(path) else cfg.solver.weight_decay,
            }
            for tp, path in zip(tparams, paths)
        ],
        betas=(0.9, 0.999),
        eps=1e-8,
    )

    rs = np.random.RandomState(3)
    opt_state = tx.init(params)
    for t in range(6):
        grads_np = [rs.randn(*np.shape(v)).astype(np.float32) for _, v in leaves_p]
        gtree = jax.tree_util.tree_unflatten(treedef, [jnp.asarray(g) for g in grads_np])
        updates, opt_state = tx.update(gtree, opt_state, params)
        params = optax.apply_updates(params, updates)

        for tp, g in zip(tparams, grads_np):
            tp.grad = torch.from_numpy(g.copy())
        torch.nn.utils.clip_grad_norm_(tparams, cfg.solver.clip_value)
        lr_t = float(sched(t))
        for group, path in zip(opt.param_groups, paths):
            group["lr"] = lr_t * (
                cfg.solver.backbone_multiplier if _is_backbone(path) else 1.0
            )
        opt.step()

    got = jax.tree_util.tree_leaves(params)
    for g, tp, path in zip(got, tparams, paths):
        np.testing.assert_allclose(
            np.asarray(g), tp.detach().numpy(), rtol=2e-5, atol=1e-7,
            err_msg=f"param drift at {path}",
        )
