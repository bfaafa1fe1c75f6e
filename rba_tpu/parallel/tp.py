"""Tensor-parallel weight sharding over the ``model`` mesh axis.

The reference has NO model parallelism — its only distribution is NCCL
DDP (/root/reference/train_net.py:393-403).  This module is TPU-native
new capability: a 2-D ``(data, model)`` mesh where batches shard over
``data`` (the DDP equivalent) and the transformer MLP weights shard
Megatron-style over ``model``; XLA/GSPMD derives every collective (the
fc2 partial-sum all-reduce, the gradient reductions) from the weight
shardings alone — no explicit collectives, per the scaling-book recipe.

What is sharded, and why only that:

* **Column-parallel** ``mlp/fc1`` and ``linear1`` kernels ``(C, H)`` →
  ``P(None, "model")`` with bias ``P("model")``: each shard computes its
  own slice of the hidden activation, so the GELU stays local.
* **Row-parallel** ``mlp/fc2`` and ``linear2`` kernels ``(H, C)`` →
  ``P("model", None)``: consumes the sharded hidden dim; the matmul
  produces partial sums that GSPMD finishes with one all-reduce per
  block over ICI.
* Everything else stays replicated.  The fused ``qkv``/``in_proj``
  kernels pack their output dim as ``(3, heads, hd)`` (models/swin.py:195)
  — a shard of the packed dim straddles the q/k/v group boundaries for
  any model-axis size not divisible by 3, so GSPMD would insert
  all-gather+slice reshards rather than clean head-parallelism; the MLP
  holds 2/3 of each block's parameters (8C² of 12C²), so it is where the
  sharding pays.

The rules are applied by *path suffix* to any params-like pytree.  Optax
states mirror the parameter dict structure inside ``mu``/``nu`` (same
dict keys), so the same walk shards optimizer moments identically to
their parameters; scalars (step counts) and unmatched leaves replicate.

Sizing note: every released RbA checkpoint fits one v5e chip, so TP is
off by default (pure-DP ``make_train_step``); this path exists for
larger derivatives and is proven by ``tests/test_tp.py`` (TP-vs-DP loss
parity on the virtual CPU mesh) and the driver's ``dryrun_multichip``.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import DictKey, FlattenedIndexKey, GetAttrKey, SequenceKey

_COLUMN = ("fc1", "linear1")  # shard the output dim
_ROW = ("fc2", "linear2")  # shard the input dim


def _key_name(k) -> str:
    if isinstance(k, DictKey):
        return str(k.key)
    if isinstance(k, GetAttrKey):
        return k.name
    if isinstance(k, (SequenceKey, FlattenedIndexKey)):
        return str(k.idx if isinstance(k, SequenceKey) else k.key)
    return str(k)


def tp_spec(path, shape, model_size: int) -> P:
    """PartitionSpec for one leaf, by (module name, leaf name) suffix."""
    names = [_key_name(k) for k in path]
    if len(names) < 2 or model_size <= 1:
        return P()
    parent, leaf = names[-2], names[-1]
    if leaf == "kernel" and len(shape) == 2:
        if parent in _COLUMN and shape[1] % model_size == 0:
            return P(None, "model")
        if parent in _ROW and shape[0] % model_size == 0:
            return P("model", None)
    if leaf == "bias" and len(shape) == 1:
        if parent in _COLUMN and shape[0] % model_size == 0:
            return P("model")
    return P()


def tp_shardings(tree: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for params / optax state / TrainState.

    Works on concrete arrays or ``jax.eval_shape`` abstractions — only
    path names and shapes are read.  Warns when a >1 model axis is
    requested but no leaf matches the TP rules (e.g. hidden dims not
    divisible by the axis size): the caller would otherwise silently get
    full replication instead of tensor parallelism."""
    m = mesh.shape.get("model", 1)
    out = jax.tree_util.tree_map_with_path(
        lambda path, x: NamedSharding(mesh, tp_spec(path, x.shape, m)), tree
    )
    if m > 1:
        n_sharded = sum(
            1 for s in jax.tree.leaves(out) if s.spec != P()
        )
        if n_sharded == 0:
            import warnings

            warnings.warn(
                f"tp_shardings: model axis size {m} requested but no parameter "
                f"matched the TP rules (MLP dims must be divisible by {m}); "
                f"the tree is fully replicated — no tensor parallelism",
                stacklevel=2,
            )
    return out


def shard_params_tp(params: Any, mesh: Mesh) -> Any:
    """Place a parameter pytree on the mesh with the TP layout."""
    return jax.device_put(params, tp_shardings(params, mesh))
