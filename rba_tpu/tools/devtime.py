"""Device-time probe: amortized per-inference device ms via a lax.scan loop.

Why this exists (CLAUDE.md "Environment gotchas"): through the remote TPU
tunnel a host↔device round-trip costs ~26 ms and ``block_until_ready`` does
not reliably block, so single-call wall-clock timing is useless.  This tool
jits a ``lax.scan`` of N back-to-back inferences (iterations serialized via
a numerically-invisible carry data dependency, since the tunnel AOT compiler
hoists loop-invariant work even across ``optimization_barrier``) and fetches
ONE scalar per repetition — the RTT amortizes to ~26/N ms and is
additionally subtracted via a no-op fetch probe.

Usage (real TPU):
    python -m rba_tpu.tools.devtime                 # parity mode
    python -m rba_tpu.tools.devtime --fast          # fast serving mode
    python -m rba_tpu.tools.devtime --hw 512x1024 --iters 32

Prints one JSON line: {"mode", "hw", "device_ms_per_img", "imgs_per_sec", ...}.

Reference analogue: none — the reference publishes no throughput numbers
(SURVEY.md §6); this is the rebuild's own perf instrumentation.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="/root/reference/ckpts/swin_b_1dl/config.yaml")
    ap.add_argument("--hw", default="1024x2048", help="input HxW")
    ap.add_argument("--batch", type=int, default=1, help="images per inference")
    ap.add_argument("--iters", type=int, default=16, help="inferences per scan/fetch")
    ap.add_argument("--reps", type=int, default=6, help="timed scan fetches")
    ap.add_argument(
        "--fast",
        action="store_true",
        help="fast serving mode: pixel_decoder_dtype=bfloat16 + fast_math=True",
    )
    ap.add_argument(
        "--attn-layout", default=None,
        help="window-attention lowering experiment (SwinConfig.attn_layout): "
        "partition | nested | resident | proj_canvas, or the per-stage form "
        "'resident:0,1' (resident on the listed stages, partition elsewhere)",
    )
    ap.add_argument(
        "--sampling-dtype", default=None, choices=["float32", "bfloat16"],
        help="one-hot deform A-matrix dtype (PixelDecoderConfig.sampling_dtype)",
    )
    ap.add_argument(
        "--sampling-method", default=None,
        choices=["auto", "gather", "onehot", "gather_scatter"],
        help="deform sampling lowering (PixelDecoderConfig.sampling_method); "
        "gather_scatter = the pre-r5 plain-autodiff gather (scatter bwd)",
    )
    ap.add_argument(
        "--mlp-impl", default=None, choices=["xla", "fused"],
        help="MLP lowering (SwinConfig.mlp_impl; 'fused' = Pallas VMEM kernel)",
    )
    ap.add_argument(
        "--int8", action="store_true",
        help="weight-only int8 linear kernels (ops/quant.py experiment)",
    )
    ap.add_argument(
        "--train",
        action="store_true",
        help="measure the training step (fwd+matcher+losses+bwd+AdamW) instead "
        "of inference; --hw is the crop size, --batch the global batch",
    )
    ap.add_argument(
        "--grad-accum", type=int, default=1,
        help="micro-batch accumulation factor for --train (lax.scan "
        "accumulation, train_step.py); --batch must divide by it",
    )
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rba_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from rba_tpu.config import fast_serving, load_config
    from rba_tpu.models.maskformer import maskformer_infer_rba, maskformer_init

    cfg = load_config(args.config)
    if args.fast:
        cfg = fast_serving(cfg)
    if args.attn_layout:
        cfg = dataclasses.replace(
            cfg, swin=dataclasses.replace(cfg.swin, attn_layout=args.attn_layout)
        )
    if args.mlp_impl:
        cfg = dataclasses.replace(
            cfg, swin=dataclasses.replace(cfg.swin, mlp_impl=args.mlp_impl)
        )
    if args.sampling_method:
        cfg = dataclasses.replace(
            cfg, pixel_decoder=dataclasses.replace(
                cfg.pixel_decoder, sampling_method=args.sampling_method
            )
        )
    if args.sampling_dtype:
        cfg = dataclasses.replace(
            cfg,
            pixel_decoder=dataclasses.replace(
                cfg.pixel_decoder, sampling_dtype=args.sampling_dtype
            ),
        )

    h, w = (int(v) for v in args.hw.split("x"))

    if args.train:
        # sequential timed calls (the donated state can't thread a scan);
        # skip TWO warmup calls — pjit may compile twice if shardings shift
        from ..parallel.mesh import make_mesh, shard_batch
        from ..train.train_step import make_train_state, make_train_step

        mesh = make_mesh()
        state = make_train_state(jax.random.PRNGKey(0), cfg, mesh)
        step = make_train_step(cfg, mesh, grad_accum=args.grad_accum)
        b, t = args.batch, 16
        rng = np.random.RandomState(0)
        batch = shard_batch(mesh, {
            "images": jnp.asarray(rng.rand(b, h, w, 3) * 255, jnp.float32),
            "gt_labels": jnp.asarray(rng.randint(0, cfg.num_classes, (b, t)), jnp.int32),
            "gt_masks": jnp.asarray((rng.rand(b, t, h, w) > 0.7).astype(np.float32)),
            "gt_valid": jnp.asarray(
                np.concatenate([np.ones((b, 8)), np.zeros((b, t - 8))], 1), jnp.float32
            ),
        })
        for _ in range(2):  # compile + possible second-specialization call
            state, m = step(state, batch)
            float(m["total"])
        times = []
        for _ in range(max(args.reps, 4)):
            t0 = time.perf_counter()
            state, m = step(state, batch)
            float(m["total"])
            times.append(time.perf_counter() - t0)
        sec = min(times)
        print(json.dumps({
            "mode": "train",
            "batch": args.batch,
            "grad_accum": args.grad_accum,
            "hw": args.hw,
            "sec_per_step": round(sec, 3),
            "steps_per_sec": round(1.0 / sec, 2),
            "imgs_per_sec": round(args.batch / sec, 2),
            "backend": jax.default_backend(),
        }))
        return

    params = maskformer_init(jax.random.PRNGKey(0), cfg)
    if args.int8:
        from rba_tpu.ops.quant import count_quantized, quantize_params_int8

        params = quantize_params_int8(params, cfg=cfg)
        print(json.dumps(count_quantized(params)), flush=True)
    img = jnp.asarray(np.random.RandomState(0).rand(args.batch, h, w, 3) * 255, jnp.float32)

    @jax.jit
    def loop(params, img):
        def body(carry, _):
            # chain iterations through a real (but numerically invisible,
            # ~1e-37 on [0,255] pixels) data dependency: this tunnel's AOT
            # compiler hoists loop-invariant work even across
            # lax.optimization_barrier (measured: the barrier form ran the
            # model once for a 16-iteration scan)
            im = img + carry * jnp.float32(1e-38)
            r = maskformer_infer_rba(params, cfg, im)
            return jnp.mean(r), None

        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=args.iters)
        return out

    # no-op RTT probe (scalar fetch of an already-resident value)
    noop = jax.jit(lambda x: x + 1.0)
    float(noop(jnp.float32(0)))
    rtts = []
    for _ in range(8):
        t0 = time.perf_counter()
        float(noop(jnp.float32(0)))
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)

    float(loop(params, img))  # compile + warmup
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        float(loop(params, img))
        times.append(time.perf_counter() - t0)
    best = min(times)
    dev_ms = (best - rtt) / (args.iters * args.batch) * 1000.0

    print(
        json.dumps(
            {
                "mode": ("fast" if args.fast else "parity") + ("+int8" if args.int8 else ""),
                "batch": args.batch,
                "hw": args.hw,
                "device_ms_per_img": round(dev_ms, 2),
                "imgs_per_sec": round(1000.0 / dev_ms, 2),
                "rtt_ms": round(rtt * 1000.0, 2),
                "iters": args.iters,
                "reps": args.reps,
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
