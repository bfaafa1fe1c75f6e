"""Jitted training step over a device mesh.

Replaces the reference's Detectron2 ``DefaultTrainer`` loop + DDP
(/root/reference/train_net.py:70-349): one pjit-compiled function holds the
forward, Hungarian matching, losses, backward, clip, and AdamW update; the
batch is sharded over the ``data`` mesh axis and XLA inserts the gradient
all-reduce (the reference's NCCL allreduce) from the shardings.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RbAConfig
from ..models.maskformer import maskformer_forward, maskformer_init, preprocess
from .criterion import criterion
from .optimizer import build_optimizer


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array
    rng: jax.Array


def make_train_state(rng: jax.Array, cfg: RbAConfig) -> TrainState:
    k1, k2 = jax.random.split(rng)
    params = maskformer_init(k1, cfg)
    tx = build_optimizer(cfg, params)
    return TrainState(
        params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32), rng=k2
    )


def make_train_step(cfg: RbAConfig, mesh: Mesh):
    """Returns a jitted (state, batch) -> (state, metrics) step.  ``batch``:
    images (B,H,W,3) raw RGB; gt_labels (B,T); gt_masks (B,T,H,W);
    gt_valid (B,T); optional outlier_masks / sem_seg (B,H,W)."""

    def loss_fn(params, batch, rng):
        images = preprocess(cfg, batch["images"])
        outputs = maskformer_forward(params, cfg, images)
        targets = {k: v for k, v in batch.items() if k != "images"}
        losses = criterion(cfg, rng, outputs, targets)
        return losses["total"], losses

    def step_fn(state: TrainState, batch: Dict[str, jax.Array]):
        rng, sub = jax.random.split(state.rng)
        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, sub
        )
        # the optimizer is stateless config + masks; building it under jit
        # traces once and folds the masks/multipliers in as constants
        tx = build_optimizer(cfg, state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, opt_state, state.step + 1, rng), metrics

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    # sharding pytree prefixes: whole state replicated, every batch leaf
    # sharded along dim 0 (the DDP-equivalent layout)
    return jax.jit(step_fn, in_shardings=(repl, data), donate_argnums=(0,))
