"""Measure the Pallas fused MLP-block kernel vs the unfused XLA chain at the
Swin-B 1024x2048 per-stage shapes (devtime lax.scan methodology: iterations
chained through a +carry*1e-38 data dep, RTT subtracted).

Usage:
    python -m rba_tpu.tools.perf_fused_mlp [--stages 0,1,2] [--iters 16]
"""
from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--stages", default="0,1,2")
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--embed", type=int, default=128, help="Swin embed dim")
    ap.add_argument("--hw", default="1024x2048", help="input resolution")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rba_tpu.ops.nn import layer_norm, linear
    from rba_tpu.ops.pallas.fused_mlp import fused_mlp_residual, supports

    h0, w0 = (int(v) for v in args.hw.split("x"))

    def xla_chain(x, ln, fc1, fc2):
        y = layer_norm(ln, x)
        y = linear(fc2, jax.nn.gelu(linear(fc1, y), approximate=False))
        return x + y

    def timed(fn, arrs):
        @jax.jit
        def loop(x, ln, fc1, fc2):
            def body(carry, _):
                r = fn(x + carry * jnp.bfloat16(1e-30), ln, fc1, fc2)
                return jnp.mean(r.astype(jnp.float32)).astype(jnp.bfloat16), None

            out, _ = jax.lax.scan(body, jnp.bfloat16(0), None, length=args.iters)
            return out

        noop = jax.jit(lambda x: x + 1.0)
        float(noop(jnp.float32(0)))
        rtts = []
        for _ in range(6):
            t0 = time.perf_counter()
            float(noop(jnp.float32(0)))
            rtts.append(time.perf_counter() - t0)
        rtt = min(rtts)
        float(loop(*arrs))
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(loop(*arrs))
            times.append(time.perf_counter() - t0)
        return round((min(times) - rtt) / args.iters * 1000.0, 4)

    results = {"backend": jax.default_backend(), "hw": args.hw, "stages": {}}
    for s in (int(v) for v in args.stages.split(",")):
        c = args.embed * 2**s
        hs, ws_ = h0 // (4 * 2**s), w0 // (4 * 2**s)
        t = hs * ws_
        hid = 4 * c
        rng = np.random.RandomState(s)
        x = jnp.asarray(rng.randn(1, hs, ws_, c), jnp.bfloat16)
        ln = {"scale": jnp.asarray(rng.randn(c) * 0.1 + 1, jnp.float32),
              "bias": jnp.asarray(rng.randn(c) * 0.1, jnp.float32)}
        fc1 = {"kernel": jnp.asarray(rng.randn(c, hid) * 0.03, jnp.float32),
               "bias": jnp.asarray(rng.randn(hid) * 0.01, jnp.float32)}
        fc2 = {"kernel": jnp.asarray(rng.randn(hid, c) * 0.03, jnp.float32),
               "bias": jnp.asarray(rng.randn(c) * 0.01, jnp.float32)}
        arrs = (x, ln, fc1, fc2)

        row = {"tokens": t, "C": c, "supported": supports(t, c)}
        want = np.asarray(xla_chain(*arrs), np.float32)
        if row["supported"]:
            got = np.asarray(fused_mlp_residual(*arrs), np.float32)
            row["max_abs_err"] = float(np.abs(got - want).max())
            row["ms_fused"] = timed(fused_mlp_residual, arrs)
        row["ms_xla"] = timed(xla_chain, arrs)
        results["stages"][f"stage{s}"] = row
        print(json.dumps({f"stage{s}": row}), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
