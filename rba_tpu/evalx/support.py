"""Drop-in equivalents of the reference's ``support.py`` helper surface
(/root/reference/support.py:27-226): score-function variants, the logistic
squashing helper, visualization utilities, and image/mask conveniences —
numpy/JAX instead of torch, model calls through our jitted inference.

The heavyweight pieces live elsewhere: ``get_datasets`` in
``rba_tpu.data.ood_datasets``, ``OODEvaluator`` in ``rba_tpu.evalx.evaluator``.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..config import RbAConfig
from ..models.maskformer import maskformer_infer
from ..ops.resize import resize_bilinear


def get_logits(params, cfg: RbAConfig, images) -> jax.Array:
    """(B, H, W, 3) raw RGB → (B, K, H, W) sem_seg logits
    (reference support.py:108-113)."""
    return maskformer_infer(params, cfg, jnp.asarray(images, jnp.float32))["sem_seg"]


def get_logits_plus(params, cfg: RbAConfig, images, return_aux: bool = False):
    """Logits plus the auxiliary outputs dict (reference :98-106)."""
    out = maskformer_infer(params, cfg, jnp.asarray(images, jnp.float32))
    if return_aux:
        return out["sem_seg"], {k: v for k, v in out.items() if k != "sem_seg"}
    return out["sem_seg"]


def get_neg_logit_sum(params, cfg: RbAConfig, images) -> jax.Array:
    """Anomaly score = −Σ_k logit_k (reference :115-132)."""
    return -get_logits(params, cfg, images).sum(axis=1)


def get_RbA(params, cfg: RbAConfig, images) -> jax.Array:
    """Anomaly score = −Σ_k tanh(logit_k) (reference :135-142)."""
    return -jnp.tanh(get_logits(params, cfg, images)).sum(axis=1)


def logistic(x, k: float = 1.0, x0: float = 0.0, L: float = 1.0):
    """(reference :144-146)"""
    return L / (1.0 + jnp.exp(-k * (jnp.asarray(x) - x0)))


def resize_mask(m, shape) -> jax.Array:
    """Bilinear align_corners=False mask resize (reference :217-226)."""
    return resize_bilinear(jnp.asarray(m), (int(shape[0]), int(shape[1])))


def proc_img(img) -> np.ndarray:
    """CHW → HWC normalization for plotting (reference :199-215)."""
    arr = np.asarray(img).copy()
    if arr.ndim == 3 and arr.shape[0] == 3:
        arr = arr.transpose(1, 2, 0)
    return arr


def get_seg_colormap(preds: np.ndarray, colors: Sequence) -> np.ndarray:
    """(H, W) class-id map → (H, W, 3) int color map (reference :184-197)."""
    preds = np.asarray(preds)
    color_map = np.zeros(preds.shape + (3,), np.int64)
    for i, c in enumerate(colors):
        mask = preds == i
        if mask.any():
            color_map[mask] = np.asarray(c)
    return color_map


def show_mask(mask, ax, random_color: bool = False):
    """Overlay a binary mask on a matplotlib axis (reference :148-155)."""
    if random_color:
        color = np.concatenate([np.random.random(3), [0.6]])
    else:
        color = np.array([30 / 255, 144 / 255, 255 / 255, 0.6])
    h, w = np.asarray(mask).shape[-2:]
    ax.imshow(np.asarray(mask).reshape(h, w, 1) * color.reshape(1, 1, -1))


def show_points(coords, labels, ax, marker_size: int = 375):
    """(reference :157-161)"""
    coords, labels = np.asarray(coords), np.asarray(labels)
    pos, neg = coords[labels == 1], coords[labels == 0]
    ax.scatter(pos[:, 0], pos[:, 1], color="green", marker="*", s=marker_size,
               edgecolor="white", linewidth=1.25)
    ax.scatter(neg[:, 0], neg[:, 1], color="red", marker="*", s=marker_size,
               edgecolor="white", linewidth=1.25)


def show_box(box, ax):
    """(reference :163-166)"""
    import matplotlib.pyplot as plt

    x0, y0 = box[0], box[1]
    w, h = box[2] - box[0], box[3] - box[1]
    ax.add_patch(plt.Rectangle((x0, y0), w, h, edgecolor="green",
                               facecolor=(0, 0, 0, 0), lw=2))


def show_anns(anns, strength: float = 0.35):
    """Overlay a list of {"segmentation", "area"} dicts (reference :168-182)."""
    if len(anns) == 0:
        return
    import matplotlib.pyplot as plt

    ax = plt.gca()
    ax.set_autoscale_on(False)
    for ann in sorted(anns, key=lambda a: a["area"], reverse=True):
        m = np.asarray(ann["segmentation"])
        img = np.ones(m.shape + (3,)) * np.random.random(3)
        ax.imshow(np.dstack((img, m * strength)))
