"""Shared deterministic batch builder for the multi-process test — imported
by BOTH the pytest process (single-process reference run) and the spawned
jax.distributed workers, so every participant sees byte-identical data."""
import numpy as np


def global_batch(cfg, seed: int, b: int = 8, hw: int = 32, t: int = 3):
    rng = np.random.RandomState(1000 + seed)
    h = w = hw
    return {
        "images": (rng.rand(b, h, w, 3) * 255).astype(np.float32),
        "gt_labels": rng.randint(0, cfg.num_classes, (b, t)).astype(np.int32),
        "gt_masks": (rng.rand(b, t, h, w) > 0.5).astype(np.float32),
        "gt_valid": np.tile(np.array([[1, 1, 0]], np.float32), (b, 1)),
    }
