"""Optimizer with Detectron2-style per-module hyperparameters.

Behavioral spec: /root/reference/train_net.py:219-333 (build_optimizer):
  * AdamW, base LR 1e-4, weight decay 0.05
  * backbone parameters get LR × BACKBONE_MULTIPLIER (0.1)
  * no weight decay on: norms (WEIGHT_DECAY_NORM=0), embeddings
    (WEIGHT_DECAY_EMBED=0 — query_feat/query_embed/level_embed,
    relative_position_bias_table, absolute_pos_embed)
  * full-model gradient clipping to L2 norm 0.01
  * WarmupPolyLR schedule: lr·(1 − iter/max_iter)^0.9 with linear warmup
  * component freezing flags (freeze = zero the update)

Implemented as one optax chain with pytree-path masks — the idiomatic JAX
replacement for torch param groups.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ..config import RbAConfig, SolverConfig


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _mask_from_predicate(params, pred: Callable[[str], bool]):
    return jax.tree_util.tree_map_with_path(lambda path, _: pred(_path_str(path)), params)


def _is_no_decay(path: str) -> bool:
    p = path.lower()
    if "relative_position_bias_table" in p or "absolute_pos_embed" in p:
        return True
    if "query_feat" in p or "query_embed" in p or "level_embed" in p:
        return True
    # norm params live under segments named norm*/gn (LayerNorm & GroupNorm)
    return any("norm" in seg or seg == "gn" for seg in p.split("/"))


def _is_backbone(path: str) -> bool:
    return path.startswith("backbone")


def poly_lr_schedule(solver: SolverConfig) -> optax.Schedule:
    def schedule(step):
        step = jnp.minimum(step, solver.max_iter)
        warm = jnp.where(
            step < solver.warmup_iters,
            solver.warmup_factor + (1 - solver.warmup_factor) * step / max(solver.warmup_iters, 1),
            1.0,
        )
        poly = (1.0 - step / solver.max_iter) ** solver.poly_lr_power
        poly = jnp.maximum(poly, solver.poly_lr_constant_ending)
        return solver.base_lr * warm * poly

    return schedule


def build_optimizer(cfg: RbAConfig, params) -> optax.GradientTransformation:
    solver = cfg.solver
    schedule = poly_lr_schedule(solver)

    decay_mask = _mask_from_predicate(params, lambda p: not _is_no_decay(p))
    backbone_mask = _mask_from_predicate(params, _is_backbone)

    def lr_scale(path: str) -> float:
        mult = solver.backbone_multiplier if _is_backbone(path) else 1.0
        if solver.freeze_backbone and _is_backbone(path):
            mult = 0.0
        if solver.freeze_pixel_decoder and "pixel_decoder" in path:
            mult = 0.0
        if solver.freeze_transformer_decoder and "predictor" in path:
            mult = 0.0
        return mult

    scales = jax.tree_util.tree_map_with_path(lambda p, _: lr_scale(_path_str(p)), params)

    tx = optax.chain(
        optax.clip_by_global_norm(solver.clip_value),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.add_decayed_weights(solver.weight_decay, mask=decay_mask),
        # per-leaf LR multiplier (backbone ×0.1, frozen ×0)
        optax.GradientTransformation(
            init=lambda params: optax.EmptyState(),
            update=lambda updates, state, params=None: (
                jax.tree.map(lambda u, s: u * s, updates, scales),
                state,
            ),
        ),
        optax.scale_by_learning_rate(schedule),
    )
    return tx
