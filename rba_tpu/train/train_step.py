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


def make_train_state(
    rng: jax.Array, cfg: RbAConfig, mesh: Mesh | None = None, tp: bool = False
) -> TrainState:
    """Builds the initial state; pass ``mesh`` to commit it with the
    sharding the train step expects.  Without it the first step() call
    sees uncommitted-input avals and pjit compiles TWICE (once more when
    the donated outputs come back committed) — through the remote TPU
    tunnel that second compile costs minutes (measured 227 s at Swin-B
    512×1024).

    ``tp=True`` lays the MLP weights (and their optimizer moments) out
    tensor-parallel over the mesh's ``model`` axis (parallel/tp.py);
    pass the matching tree to ``make_train_step(state_sharding=...)``."""
    k1, k2 = jax.random.split(rng)
    params = maskformer_init(k1, cfg)
    tx = build_optimizer(cfg, params)
    state = TrainState(
        params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32), rng=k2
    )
    if mesh is not None:
        if tp:
            from ..parallel.tp import tp_shardings

            state = jax.device_put(state, tp_shardings(state, mesh))
        else:
            state = jax.device_put(state, NamedSharding(mesh, P()))
    return state


def make_train_step(
    cfg: RbAConfig,
    mesh: Mesh,
    grad_accum: int = 1,
    state_sharding=None,
    tp: bool = False,
):
    """Returns a jitted (state, batch) -> (state, metrics) step.  ``batch``:
    images (B,H,W,3) raw RGB; gt_labels (B,T); gt_masks (B,T,H,W);
    gt_valid (B,T); optional outlier_masks / sem_seg (B,H,W).

    ``tp=True`` derives the tensor-parallel state sharding tree itself
    (via ``jax.eval_shape`` — no arrays materialized) so it always agrees
    with ``make_train_state(..., tp=True)``; passing a TP state into a
    step built with the default replicated sharding would otherwise force
    a silent full all-gather resharding of the parameters every step.
    ``state_sharding`` still overrides for custom layouts.

    ``grad_accum`` > 1 splits the leading batch dim into that many
    micro-batches accumulated with lax.scan before one optimizer update —
    large global batches (the reference trains at IMS_PER_BATCH 16) without
    the activation memory; losses are averaged across micro-batches."""

    def loss_fn(params, batch, rng):
        images = preprocess(cfg, batch["images"])
        if cfg.sem_seg_head_name != "MaskFormerHead":
            # per-pixel baseline heads train on plain CE over sem_seg labels
            # (reference meta_arch/per_pixel_baseline.py losses(), via the
            # D2 SemanticSegmentor meta-arch) — no matching/criterion
            from ..models.baseline_heads import per_pixel_losses
            from ..models.maskformer import per_pixel_forward

            logits, aux = per_pixel_forward(params, cfg, images)
            losses = dict(per_pixel_losses(cfg, rng, logits, aux, batch["sem_seg"]))
            losses["total"] = sum(losses.values())
            return losses["total"], losses
        outputs = maskformer_forward(params, cfg, images)
        targets = {k: v for k, v in batch.items() if k != "images"}
        losses = criterion(cfg, rng, outputs, targets)
        return losses["total"], losses

    def grads_and_losses(params, batch, rng):
        if grad_accum <= 1:
            (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, rng
            )
            return grads, losses

        micro = {
            k: v.reshape((grad_accum, v.shape[0] // grad_accum) + v.shape[1:])
            for k, v in batch.items()
        }
        rngs = jax.random.split(rng, grad_accum)

        def body(carry, xs):
            acc, loss_acc = carry
            mb, r = xs
            (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, mb, r)
            acc = jax.tree.map(lambda a, g: a + g, acc, grads)
            loss_acc = jax.tree.map(lambda a, l: a + l, loss_acc, losses)
            return (acc, loss_acc), None

        zero_g = jax.tree.map(jnp.zeros_like, params)
        # shapes only — no extra forward is traced into the program
        _, loss_shapes = jax.eval_shape(
            loss_fn, params, jax.tree.map(lambda v: v[0], micro), rngs[0]
        )
        zero_l = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), loss_shapes)
        (acc, loss_acc), _ = jax.lax.scan(body, (zero_g, zero_l), (micro, rngs))
        inv = 1.0 / grad_accum
        return (
            jax.tree.map(lambda g: g * inv, acc),
            jax.tree.map(lambda l: l * inv, loss_acc),
        )

    def step_fn(state: TrainState, batch: Dict[str, jax.Array]):
        rng, sub = jax.random.split(state.rng)
        grads, losses = grads_and_losses(state.params, batch, sub)
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
    # sharding pytree prefixes: state replicated (the DDP-equivalent layout)
    # unless a tensor-parallel tree is supplied (parallel/tp.py), every
    # batch leaf sharded along dim 0.  out_shardings pins the updated state
    # to the input layout so step N+1 never reshards.
    if tp and state_sharding is None:
        from ..parallel.tp import tp_shardings

        state_shapes = jax.eval_shape(
            lambda: make_train_state(jax.random.PRNGKey(0), cfg)
        )
        state_sharding = tp_shardings(state_shapes, mesh)
    ss = repl if state_sharding is None else state_sharding
    return jax.jit(
        step_fn, in_shardings=(ss, data), out_shardings=(ss, repl), donate_argnums=(0,)
    )
