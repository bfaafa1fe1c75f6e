"""Sliding-window inference for very high resolution images.

The reference avoids OOM on high-res Mapillary inputs with
``sem_seg_postprocess_before_inference`` (per-mask early postprocessing,
maskformer_model.py:316-320) and `retry_if_cuda_oom` fallbacks — dynamic
strategies that do not fit XLA's static allocation (SURVEY.md §2.5 "OOM
resilience").  The TPU-native replacement: run the jitted fixed-size model
over overlapping tiles and blend the class-probability maps with a linear
feathering window, so any input resolution compiles exactly one tile shape.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RbAConfig
from .maskformer import maskformer_infer, rba_score


@functools.lru_cache(maxsize=16)
def _feather_weight(th: int, tw: int, overlap: int) -> np.ndarray:
    """(th, tw) blending weight: linear ramp across the overlap margins."""
    def ramp(n, size):
        w = np.ones(size, np.float32)
        if n > 0:
            r = (np.arange(n) + 1) / (n + 1)
            w[:n] = r
            w[size - n :] = r[::-1]
        return w

    return np.outer(ramp(overlap, th), ramp(overlap, tw))


@functools.lru_cache(maxsize=16)
def _tile_infer_fn(cfg: RbAConfig):
    """Jitted tile-inference fn, cached per cfg at module level.  A
    ``jax.jit(lambda ...)`` built inside ``sliding_window_sem_seg`` would be
    a fresh function identity per call — every image would recompile (1-5 min
    each through the TPU tunnel).  jit itself then caches per tile shape."""
    return jax.jit(lambda p, x: maskformer_infer(p, cfg, x)["sem_seg"][0])


def sliding_window_sem_seg(
    params,
    cfg: RbAConfig,
    image: np.ndarray,  # (H, W, 3) raw RGB, arbitrarily large
    tile_hw: Tuple[int, int] = (1024, 1024),
    overlap: int = 256,
) -> jax.Array:
    """Weighted-blend (K, H, W) class probabilities over overlapping tiles."""
    h, w = image.shape[:2]
    th, tw = min(tile_hw[0], h), min(tile_hw[1], w)
    overlap = min(overlap, th // 2, tw // 2)
    stride_h = max(th - overlap, 1)
    stride_w = max(tw - overlap, 1)

    ys = list(range(0, max(h - th, 0) + 1, stride_h))
    xs = list(range(0, max(w - tw, 0) + 1, stride_w))
    if ys[-1] + th < h:
        ys.append(h - th)
    if xs[-1] + tw < w:
        xs.append(w - tw)

    infer = _tile_infer_fn(cfg)
    weight = jnp.asarray(_feather_weight(th, tw, overlap))

    total = jnp.zeros((cfg.num_classes, h, w), jnp.float32)
    norm = jnp.zeros((h, w), jnp.float32)
    img = jnp.asarray(image, jnp.float32)
    for y in ys:
        for x in xs:
            tile = img[None, y : y + th, x : x + tw]
            sem = infer(params, tile)  # (K, th, tw)
            total = total.at[:, y : y + th, x : x + tw].add(sem * weight[None])
            norm = norm.at[y : y + th, x : x + tw].add(weight)
    return total / jnp.maximum(norm, 1e-6)[None]


def sliding_window_rba(params, cfg: RbAConfig, image: np.ndarray, **kw) -> jax.Array:
    """RbA score from the blended probability map."""
    sem = sliding_window_sem_seg(params, cfg, image, **kw)
    return rba_score(sem[None])[0]
