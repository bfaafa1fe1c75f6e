"""Benchmark: RbA anomaly-segmentation inference throughput on TPU.

Flagship config: swin_b_1dl (the released checkpoint architecture,
/root/reference/ckpts/swin_b_1dl/config.yaml) at 1024×2048 Cityscapes
resolution — the north-star metric from BASELINE.md (target ≥8 img/s/chip
on v5e; the reference publishes no throughput numbers, vs_baseline is
measured against that 8 img/s target).

Also measured (r5, VERDICT item 4): swin_l_1dl — the leaderboard model of
the reference's MODEL_ZOO.md:142-150 (Swin-L + Mapillary + COCO) — so the
serving flagship regresses round-over-round too.  It rides in the same
single JSON line under "extra" (the driver contract is ONE line whose
metric/value track the Swin-B headline), with a smaller cohort to bound
the extra compile+run cost; failures there never break the headline.

Serving shape: a queue of COHORT distinct device-resident uint8 images is
drained by one jitted ``lax.scan`` per dispatch (each scan iteration is a
full single-image inference consuming its own xs slice, so nothing is
loop-invariant), with two calls kept in flight.  This amortizes the
per-call tunnel overhead (~26 ms fetch RTT + dispatch RPC) over COHORT
images; the previous one-image-per-dispatch pipeline read ~22.9 img/s
against a 24.3 img/s device rate.  Images are uint8 on device and cast to
fp32 in-graph, matching the evaluator's upload convention.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from rba_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

COHORT = 8   # distinct resident images per dispatch
CALLS = 8    # timed dispatches per trial (COHORT*CALLS images)
TRIALS = 3   # report the median (tunnel RTT jitter moves single trials)


def measure(cfg, h, w, cohort, calls, trials):
    """Median img/s of the pipelined cohort-scan serving loop."""
    from rba_tpu.models.maskformer import maskformer_infer_rba, maskformer_init

    params = maskformer_init(jax.random.PRNGKey(0), cfg)
    imgs = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (cohort, 1, h, w, 3)), jnp.uint8
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
    for _ in range(trials):
        pending = deque()
        t0 = time.perf_counter()
        for _ in range(calls):
            pending.append(drain(params, imgs))
            if len(pending) > 2:
                float(pending.popleft())
        while pending:
            float(pending.popleft())
        rates.append(cohort * calls / (time.perf_counter() - t0))
    return sorted(rates)[len(rates) // 2]


def main():
    from rba_tpu.config import fast_serving, load_d2_config

    # fast serving mode (bf16 pixel decoder + bf16 attention softmax) is the
    # promoted default: the checkpoint-weight numerics ablation (ABLATION.json)
    # measured <=0.003 AUROC pts vs the fp32-pinned parity mode
    cfg_b = fast_serving(load_d2_config("/root/reference/ckpts/swin_b_1dl/config.yaml"))
    ips = measure(cfg_b, 1024, 2048, COHORT, CALLS, TRIALS)

    extra = {}
    try:
        cfg_l = fast_serving(
            load_d2_config("/root/reference/ckpts/swin_l_1dl/config.yaml")
        )
        extra["swin_l_imgs_per_sec"] = round(
            measure(cfg_l, 1024, 2048, 4, 4, 1), 3
        )
    except Exception as e:  # never let the L line break the headline metric
        extra["swin_l_imgs_per_sec"] = None
        extra["swin_l_error"] = f"{type(e).__name__}: {e}"[:200]

    print(
        json.dumps(
            {
                "metric": "rba_infer_imgs_per_sec_1024x2048_swinB",
                "value": round(ips, 3),
                "unit": "img/s/chip",
                "vs_baseline": round(ips / 8.0, 3),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
