"""Multi-level deformable-sampling perf table at TRAIN shapes (VERDICT r3
task 8).

The released eval configs use one deformable level (res5), where the
one-hot-matmul lowering wins (tools/perf_deform_onehot.py).  The TRAINING
configs run 3 levels (res3/res4/res5; reference
ckpts/*/config.yaml DEFORMABLE_TRANSFORMER_ENCODER_IN_FEATURES for train
recipes, msdeformattn.py:101-140): at a 512x1024 crop the level shapes are
(64,128)/(32,64)/(16,32) and Lq = 8192+2048+512 = 10752 queries.  The
one-hot row matrix for the big levels is far over the 48M-element cap
(8*10752*8192 = 704M), so the open question is per-level MIXING: one-hot
for res5 (44M elements at bs1), gather for the rest.

This probe times ``ms_deform_attn_core`` per encoder layer at the train
shapes for each method assignment, amortized via lax.scan with the RTT
subtracted (methodology of tools/devtime.py):

    python -m rba_tpu.tools.perf_deform_multilevel [--hw 512x1024] [--batch 1]

Prints one JSON line per variant plus a summary table.
"""
from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--hw", default="512x1024", help="train crop HxW")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--points", type=int, default=4)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cap", type=int, default=192 * 1024 * 1024,
                    help="per-level one-hot element cap for variant selection "
                         "(the probe passes explicit method tuples, so this "
                         "only gates which mixes get measured)")
    ap.add_argument("--variant", default=None,
                    help="run only this named variant (one process per "
                         "variant isolates TPU-worker faults)")
    ap.add_argument("--grad", action="store_true",
                    help="time value_and_grad (fwd+bwd) per layer instead of "
                         "the forward — exercises the r5 recompute-A custom "
                         "VJP of the one-hot path (no A residual saved)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rba_tpu.ops.deform_sampling import ms_deform_attn_core

    h, w = (int(v) for v in args.hw.split("x"))
    shapes = [(h // s, w // s) for s in (8, 16, 32)]  # res3/res4/res5
    lq = sum(hh * ww for hh, ww in shapes)
    n, m, p, d = args.batch, args.heads, args.points, args.dim
    s_total = lq
    rng = np.random.RandomState(0)

    value = jnp.asarray(rng.randn(n, s_total, m, d), jnp.float32)
    loc = jnp.asarray(rng.rand(n, lq, m, len(shapes), p, 2), jnp.float32)
    attn = jax.nn.softmax(
        jnp.asarray(rng.randn(n, lq, m, len(shapes) * p), jnp.float32), -1
    ).reshape(n, lq, m, len(shapes), p)

    cap = args.cap
    fits = [n * m * lq * hh * ww <= cap for hh, ww in shapes]

    variants = {"all_gather": ("gather",) * 3}
    if fits[2]:
        variants["mix_onehot_res5"] = ("gather", "gather", "onehot")
    if fits[1] and fits[2]:
        variants["mix_onehot_res45"] = ("gather", "onehot", "onehot")
    variants["auto"] = "auto"
    if args.variant is not None:
        variants = {args.variant: variants[args.variant]}

    def timed(method):
        def one(value, loc, attn):
            return jnp.mean(
                ms_deform_attn_core(value, shapes, loc, attn, method=method)
                .astype(jnp.float32) ** 2
            )

        @jax.jit
        def loop(value, loc, attn):
            def body(carry, _):
                shifted = loc + carry * jnp.float32(1e-38)
                if args.grad:
                    l, grads = jax.value_and_grad(one, argnums=(0, 1, 2))(
                        value, shifted, attn
                    )
                    # fold every grad into the carry so nothing is hoisted
                    r = l + sum(jnp.mean(g.astype(jnp.float32)) for g in grads)
                else:
                    r = one(value, shifted, attn)
                return r, None

            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=args.iters)
            return out

        noop = jax.jit(lambda x: x + 1.0)
        float(noop(jnp.float32(0)))
        rtts = []
        for _ in range(6):
            t0 = time.perf_counter()
            float(noop(jnp.float32(0)))
            rtts.append(time.perf_counter() - t0)
        rtt = min(rtts)
        float(loop(value, loc, attn))
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(loop(value, loc, attn))
            times.append(time.perf_counter() - t0)
        return round((min(times) - rtt) / args.iters * 1000.0, 4)

    # numeric cross-check first (onehot is exact vs gather at fp32 HIGHEST)
    ref = np.asarray(ms_deform_attn_core(value, shapes, loc, attn, method="gather"))
    results = {}
    for name, method in variants.items():
        got = np.asarray(ms_deform_attn_core(value, shapes, loc, attn, method=method))
        r = {
            "ms_per_layer": timed(method),
            "max_abs_err_vs_gather": float(np.abs(got - ref).max()),
            "method": method if isinstance(method, str) else list(method),
        }
        results[name] = r
        print(json.dumps({name: r}), flush=True)

    print(json.dumps({
        "hw": args.hw, "batch": n, "lq": lq,
        "level_shapes": shapes, "onehot_fits_per_level": fits,
        "backend": jax.default_backend(),
        "results": {k: v["ms_per_layer"] for k, v in results.items()},
    }))
    return results


if __name__ == "__main__":
    main()
