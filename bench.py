"""Benchmark: RbA anomaly-segmentation inference throughput on TPU.

Flagship config: swin_b_1dl (the released checkpoint architecture,
/root/reference/ckpts/swin_b_1dl/config.yaml) at 1024×2048 Cityscapes
resolution — the north-star metric from BASELINE.md (target ≥8 img/s/chip
on v5e; the reference publishes no throughput numbers, vs_baseline is
measured against that 8 img/s target).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from rba_tpu.config import fast_serving, load_d2_config
    from rba_tpu.models.maskformer import maskformer_infer_rba, maskformer_init

    # fast serving mode (bf16 pixel decoder + bf16 attention softmax) is the
    # promoted default: the checkpoint-weight numerics ablation (ABLATION.json)
    # measured <=0.003 AUROC pts vs the fp32-pinned parity mode
    cfg = fast_serving(load_d2_config("/root/reference/ckpts/swin_b_1dl/config.yaml"))

    h, w = 1024, 2048
    batch = 1
    params = maskformer_init(jax.random.PRNGKey(0), cfg)

    # reduce to a scalar on device; float() forces a real host sync every
    # iteration (block_until_ready proved unreliable through the TPU tunnel)
    fn = jax.jit(lambda p, x: maskformer_infer_rba(p, cfg, x).sum())
    img = jnp.asarray(np.random.RandomState(0).rand(batch, h, w, 3) * 255, jnp.float32)

    # compile + warmup
    float(fn(params, img))
    t0 = time.perf_counter()
    float(fn(params, img))
    warm = time.perf_counter() - t0

    # throughput with a 3-deep pipeline: JAX async dispatch keeps the chip
    # busy while the host round-trips (the tunnel adds ~26 ms/fetch; profiled
    # device time is ~41 ms/image fast mode; depth 3 measured 20.8 vs 20.4
    # img/s at depth 2 — one extra in-flight request fully hides the fetch
    # RTT).  Tunnel RTT jitter moves a single trial by ±1.5 img/s, so report
    # the median of 3 trials.
    from collections import deque

    del warm
    iters = 64
    rates = []
    for _ in range(3):
        pending = deque()
        t0 = time.perf_counter()
        for _ in range(iters):
            pending.append(fn(params, img))
            if len(pending) > 3:
                float(pending.popleft())
        while pending:
            float(pending.popleft())
        rates.append(batch * iters / (time.perf_counter() - t0))

    ips = sorted(rates)[1]
    print(
        json.dumps(
            {
                "metric": "rba_infer_imgs_per_sec_1024x2048_swinB",
                "value": round(ips, 3),
                "unit": "img/s/chip",
                "vs_baseline": round(ips / 8.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
