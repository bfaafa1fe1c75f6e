"""Panoptic / instance / open-panoptic inference heads.

Behavioral spec: /root/reference/mask2former/maskformer_model.py
  * panoptic_inference :394-486 — query filtering, prob-mask argmax,
    overlap filtering, stuff merging, and the open-panoptic RbA branch
    (threshold → morphological open/close → connected components → new
    "unknown" segments with category 255)
  * instance_inference :488-527 — per-(query, class) top-k + mask scoring

TPU split: the dense work (softmax/sigmoid, prob-mask argmax, per-query
areas via one-hot sums, top-k, mask scores) runs in one jitted device
function with static shapes; the tiny O(Q) segment-id bookkeeping runs on
host numpy.  cv2 morphology/connected-components are replaced with
scipy.ndimage (binary_opening/closing with a 3×3 structuring element and
4-connectivity labeling — same semantics).
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RbAConfig

# Cityscapes thing classes (contiguous train ids); metadata-driven in D2
CITYSCAPES_THING_IDS = (11, 12, 13, 14, 15, 16, 17, 18)


@functools.partial(jax.jit, static_argnums=(2,))
def _panoptic_device(mask_cls: jax.Array, mask_pred: jax.Array, object_mask_threshold: float):
    """Per-image (Q, K+1) logits + (Q, H, W) mask logits → dense maps.
    Non-kept queries get -inf prob masks so argmax never selects them."""
    probs = jax.nn.softmax(mask_cls.astype(jnp.float32), axis=-1)
    scores = probs.max(-1)
    labels = probs.argmax(-1)
    num_classes = mask_cls.shape[-1] - 1
    keep = (labels != num_classes) & (scores > object_mask_threshold)

    masks = jax.nn.sigmoid(mask_pred.astype(jnp.float32))  # (Q, H, W)
    prob_masks = jnp.where(keep[:, None, None], scores[:, None, None] * masks, -1.0)
    mask_ids = jnp.argmax(prob_masks, axis=0)  # (H, W)

    q = mask_pred.shape[0]
    binary = masks >= 0.5
    original_area = binary.sum(axis=(1, 2))  # (Q,)
    won = mask_ids[None] == jnp.arange(q)[:, None, None]
    mask_area = won.sum(axis=(1, 2))
    final_area = (won & binary).sum(axis=(1, 2))
    any_kept = jnp.any(keep)
    return keep, labels, scores, mask_ids, original_area, mask_area, final_area, binary, any_kept


def panoptic_inference(
    cfg: RbAConfig,
    mask_cls: np.ndarray,  # (Q, K+1)
    mask_pred: np.ndarray,  # (Q, H, W) logits at output resolution
    thing_ids: Sequence[int] = CITYSCAPES_THING_IDS,
    open_panoptic: Optional[bool] = None,
    ood_threshold: float = -0.1,
    pixel_min: int = 300,
    rba_map: Optional[np.ndarray] = None,  # (H, W) RbA score for the open branch
) -> Tuple[np.ndarray, List[Dict]]:
    (keep, labels, scores, mask_ids, orig_area, mask_area, final_area, binary, any_kept) = (
        jax.device_get(
            _panoptic_device(
                jnp.asarray(mask_cls), jnp.asarray(mask_pred), cfg.test.object_mask_threshold
            )
        )
    )
    h, w = mask_pred.shape[-2:]
    panoptic = np.zeros((h, w), np.int32)
    segments: List[Dict] = []
    if not any_kept:
        return panoptic, segments

    mask_ids = np.asarray(mask_ids)
    current_id = 0
    stuff_memory: Dict[int, int] = {}
    thing_set = set(thing_ids)
    for k in range(mask_pred.shape[0]):
        if not keep[k]:
            continue
        if mask_area[k] <= 0 or orig_area[k] <= 0 or final_area[k] <= 0:
            continue
        if mask_area[k] / orig_area[k] < cfg.test.overlap_threshold:
            continue
        cls = int(labels[k])
        isthing = cls in thing_set
        seg_mask = (mask_ids == k) & np.asarray(binary[k])
        if not isthing and cls in stuff_memory:
            panoptic[seg_mask] = stuff_memory[cls]
            continue
        current_id += 1
        if not isthing:
            stuff_memory[cls] = current_id
        panoptic[seg_mask] = current_id
        segments.append({"id": current_id, "isthing": isthing, "category_id": cls})

    if open_panoptic is None:
        open_panoptic = False
    if open_panoptic:
        from scipy import ndimage

        if rba_map is None:
            probs = jax.nn.softmax(jnp.asarray(mask_cls, jnp.float32), axis=-1)[:, :-1]
            sem = jnp.einsum(
                "qc,qhw->chw", probs, jax.nn.sigmoid(jnp.asarray(mask_pred, jnp.float32))
            )
            rba_map = np.asarray(-jnp.tanh(sem).sum(0))
        ood_binary = (rba_map > ood_threshold).astype(np.uint8)
        structure = np.ones((3, 3), np.uint8)
        # cv2.morphologyEx border semantics (maskformer_model.py:464-465):
        # erosion treats outside pixels as 1 (border-touching regions
        # survive), dilation as 0.  scipy's binary_opening defaults to
        # border_value=0 for BOTH stages, which erodes away any unknown
        # segment flush against the image edge — so the two stages are
        # composed explicitly with cv2's per-stage border values
        # (pinned against cv2 in tests/test_literal_semantics.py).
        ood_binary = ndimage.binary_dilation(  # MORPH_OPEN = erode ∘ dilate
            ndimage.binary_erosion(ood_binary, structure=structure, border_value=1),
            structure=structure, border_value=0,
        )
        ood_binary = ndimage.binary_erosion(  # MORPH_CLOSE = dilate ∘ erode
            ndimage.binary_dilation(ood_binary, structure=structure, border_value=0),
            structure=structure, border_value=1,
        ).astype(np.uint8)
        # 4-connectivity labeling (cv2 connectivity=4 equivalent)
        labels_im, num = ndimage.label(ood_binary, structure=np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]]))
        for i in range(1, num + 1):
            seg_mask = (labels_im == i) & (panoptic == 0)
            if seg_mask.sum() < pixel_min:
                continue
            current_id += 1
            panoptic[seg_mask] = current_id
            segments.append({"id": current_id, "isthing": True, "category_id": 255})

    return panoptic, segments


@functools.partial(jax.jit, static_argnums=(2, 3))
def _instance_device(mask_cls: jax.Array, mask_pred: jax.Array, topk: int, num_classes: int):
    scores = jax.nn.softmax(mask_cls.astype(jnp.float32), axis=-1)[:, :-1]  # (Q, K)
    flat = scores.reshape(-1)
    # small configs can have Q·K < the default top-100 proposal budget
    scores_topk, idx = jax.lax.top_k(flat, min(topk, flat.shape[0]))
    labels_topk = idx % num_classes
    query_idx = idx // num_classes
    masks = mask_pred[query_idx]  # (topk, H, W) logits
    hard = (masks > 0).astype(jnp.float32)
    mask_scores = (jax.nn.sigmoid(masks.astype(jnp.float32)) * hard).sum(axis=(1, 2)) / (
        hard.sum(axis=(1, 2)) + 1e-6
    )
    return {
        "pred_masks": hard,
        "scores": scores_topk * mask_scores,
        "pred_classes": labels_topk,
    }


def instance_inference(
    cfg: RbAConfig,
    mask_cls: np.ndarray,
    mask_pred: np.ndarray,
    topk: int = 100,
    thing_ids: Sequence[int] = CITYSCAPES_THING_IDS,
) -> Dict[str, np.ndarray]:
    out = jax.device_get(
        _instance_device(
            jnp.asarray(mask_cls), jnp.asarray(mask_pred), topk, cfg.num_classes
        )
    )
    if cfg.test.panoptic_on:
        keep = np.isin(out["pred_classes"], np.asarray(thing_ids))
        out = {k: v[keep] for k, v in out.items()}
    return out
