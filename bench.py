"""Benchmark: RbA anomaly-segmentation inference throughput on TPU.

Flagship config: swin_b_1dl (the released checkpoint architecture,
/root/reference/ckpts/swin_b_1dl/config.yaml) at 1024×2048 Cityscapes
resolution — the north-star metric from BASELINE.md (target ≥8 img/s/chip
on v5e; the reference publishes no throughput numbers, vs_baseline is
measured against that 8 img/s target).

Serving shape: a queue of COHORT distinct device-resident uint8 images is
drained by one jitted ``lax.scan`` per dispatch (each scan iteration is a
full single-image inference consuming its own xs slice, so nothing is
loop-invariant), with two calls kept in flight.  This amortizes the
per-call tunnel overhead (~26 ms fetch RTT + dispatch RPC) over COHORT
images; the previous one-image-per-dispatch pipeline read ~22.9 img/s
against a 24.3 img/s device rate.  Images are uint8 on device and cast to
fp32 in-graph, matching the evaluator's upload convention.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

COHORT = 8   # distinct resident images per dispatch
CALLS = 8    # timed dispatches per trial (COHORT*CALLS images)
TRIALS = 3   # report the median (tunnel RTT jitter moves single trials)


def main():
    from rba_tpu.config import fast_serving, load_d2_config
    from rba_tpu.models.maskformer import maskformer_infer_rba, maskformer_init

    # fast serving mode (bf16 pixel decoder + bf16 attention softmax) is the
    # promoted default: the checkpoint-weight numerics ablation (ABLATION.json)
    # measured <=0.003 AUROC pts vs the fp32-pinned parity mode
    cfg = fast_serving(load_d2_config("/root/reference/ckpts/swin_b_1dl/config.yaml"))

    h, w = 1024, 2048
    params = maskformer_init(jax.random.PRNGKey(0), cfg)

    imgs = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (COHORT, 1, h, w, 3)), jnp.uint8
    )

    @jax.jit
    def drain(params, imgs):
        def body(carry, im):
            r = maskformer_infer_rba(params, cfg, im.astype(jnp.float32))
            return carry + jnp.mean(r), None

        out, _ = jax.lax.scan(body, jnp.float32(0), imgs)
        return out

    # compile + warmup; float() forces a real host sync (block_until_ready
    # proved unreliable through the TPU tunnel)
    float(drain(params, imgs))
    float(drain(params, imgs))

    from collections import deque

    rates = []
    for _ in range(TRIALS):
        pending = deque()
        t0 = time.perf_counter()
        for _ in range(CALLS):
            pending.append(drain(params, imgs))
            if len(pending) > 2:
                float(pending.popleft())
        while pending:
            float(pending.popleft())
        rates.append(COHORT * CALLS / (time.perf_counter() - t0))

    ips = sorted(rates)[TRIALS // 2]
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
