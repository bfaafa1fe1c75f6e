"""Multi-chip data-parallel OOD evaluation.

The reference evaluates its model zoo one image at a time on one GPU
(support.py:353-398); scaling is manual process-level splitting.  Here the
whole evaluation is SPMD over a ``data`` mesh: images are batched to
n_devices, the jitted scoring function runs batch-sharded with replicated
params (XLA inserts nothing extra — inference has no cross-image terms),
and the histogram reduction is a per-device sum followed by one final
host-side add, so pixel scores never leave their chip.

For the model-zoo sweep across HOSTS, see the work-list sharding in
rba_tpu/evalx/sweep.py (--shard i/n).
"""
from __future__ import annotations

from typing import Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RbAConfig
from ..evalx.metrics import DEFAULT_BINS, DEFAULT_RANGE, histogram_update, metrics_from_histograms
from ..models.maskformer import maskformer_infer_rba


def make_sharded_rba_hist_fn(cfg: RbAConfig, mesh: Mesh, bins: int = DEFAULT_BINS):
    """Returns a jitted (params, images, labels) -> (pos_hist, neg_hist)
    function with images/labels sharded over the data axis and the
    histograms reduced to replicated outputs."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    def fn(params, images, labels):
        scores = maskformer_infer_rba(params, cfg, images)
        return histogram_update(scores, labels, bins=bins)

    return jax.jit(fn, in_shardings=(repl, data, data), out_shardings=(repl, repl))


def evaluate_dataset_sharded(
    cfg: RbAConfig,
    params,
    dataset,
    mesh: Mesh,
    upper_limit: int = 1300,
    bins: int = DEFAULT_BINS,
) -> Dict[str, float]:
    """Batch images to the mesh size (padding the tail batch with repeats and
    ignore-labels) and stream histograms.  Requires a fixed-resolution
    dataset (true for all the standard OOD suites)."""
    n_dev = int(np.prod(mesh.devices.shape))
    fn = make_sharded_rba_hist_fn(cfg, mesh, bins)

    pos = np.zeros((bins,), np.int64)
    neg = np.zeros((bins,), np.int64)

    batch_imgs, batch_labels = [], []

    def flush():
        nonlocal pos, neg
        if not batch_imgs:
            return
        while len(batch_imgs) < n_dev:  # pad with ignored copies
            batch_imgs.append(batch_imgs[-1])
            batch_labels.append(np.full_like(batch_labels[-1], 255))
        imgs = jnp.asarray(np.stack(batch_imgs), jnp.float32)
        labels = jnp.asarray(np.stack(batch_labels))
        p, n = fn(params, imgs, labels)
        pos += np.asarray(p, np.int64)
        neg += np.asarray(n, np.int64)
        batch_imgs.clear()
        batch_labels.clear()

    for i, sample in enumerate(dataset):
        if i >= upper_limit:
            break
        batch_imgs.append(sample.image)
        batch_labels.append(sample.label)
        if len(batch_imgs) == n_dev:
            flush()
    flush()

    m = metrics_from_histograms(pos, neg)
    return {"auroc": m["AUROC"], "aupr": m["AUPRC"], "fpr95": m["FPR@95TPR"]}
