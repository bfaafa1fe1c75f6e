"""Per-level fwd+bwd decomposition of the deformable-sampling op (r5).

The combined 3-level grad probe read 1433 ms/layer for the
gather/onehot/onehot mix — far above the forward numbers — so this probe
times value_and_grad of ONE level at a time for each method, isolating
whether the cost is the gather level's scatter backward, the one-hot
custom-VJP backward, or something else.

    python -m rba_tpu.tools.perf_deform_grad_split [--hw 512x1024] [--batch 1]
"""
from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--hw", default="512x1024")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--points", type=int, default=4)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--levels", default="res3,res4,res5")
    ap.add_argument("--methods", default="gather,onehot")
    ap.add_argument("--fwd-only", action="store_true")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rba_tpu.ops.deform_sampling import ms_deform_attn_core

    h, w = (int(v) for v in args.hw.split("x"))
    level_shapes = {"res3": (h // 8, w // 8), "res4": (h // 16, w // 16),
                    "res5": (h // 32, w // 32)}
    # Lq matches the 3-level train shape regardless of which level we time
    lq = sum(hh * ww for hh, ww in level_shapes.values())
    n, m, p, d = args.batch, args.heads, args.points, args.dim
    rng = np.random.RandomState(0)

    def timed(level, method):
        hh, ww = level_shapes[level]
        shapes = [(hh, ww)]
        value = jnp.asarray(rng.randn(n, hh * ww, m, d), jnp.float32)
        loc = jnp.asarray(rng.rand(n, lq, m, 1, p, 2), jnp.float32)
        attn = jax.nn.softmax(
            jnp.asarray(rng.randn(n, lq, m, p), jnp.float32), -1
        ).reshape(n, lq, m, 1, p)

        def one(value, loc, attn):
            return jnp.mean(
                ms_deform_attn_core(value, shapes, loc, attn, method=method)
                .astype(jnp.float32) ** 2
            )

        @jax.jit
        def loop(value, loc, attn):
            def body(carry, _):
                shifted = loc + carry * jnp.float32(1e-38)
                if args.fwd_only:
                    r = one(value, shifted, attn)
                else:
                    l, grads = jax.value_and_grad(one, argnums=(0, 1, 2))(
                        value, shifted, attn
                    )
                    r = l + sum(jnp.mean(g.astype(jnp.float32)) for g in grads)
                return r, None

            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=args.iters)
            return out

        noop = jax.jit(lambda x: x + 1.0)
        float(noop(jnp.float32(0)))
        rtts = []
        for _ in range(4):
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
        return round((min(times) - rtt) / args.iters * 1000.0, 3)

    results = {}
    for level in args.levels.split(","):
        for method in args.methods.split(","):
            ms = timed(level, method)
            results[f"{level}/{method}"] = ms
            print(json.dumps({f"{level}/{method}": ms}), flush=True)
    print(json.dumps({"hw": args.hw, "batch": n, "lq": lq,
                      "fwd_only": args.fwd_only, "results": results}))
    return results


if __name__ == "__main__":
    main()
