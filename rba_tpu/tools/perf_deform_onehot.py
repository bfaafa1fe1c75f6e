"""Measure the one-hot-matmul deformable-sampling variant vs the production
patch-gather (VERDICT r2 task 5b: "measure it instead of penciling").

Formulation: for the released 1-level config (res5 = 32x64 at 1024x2048,
Lq = HW = 2048, M = 8 heads, P = 4 points, D = 32), the whole
sample+weight+sum reduces to one matmul per head,

    out[q, d] = sum_hw A[q, hw] * V[hw, d]

where A folds the 16 (point x corner) contributions of each query row:
A = sum_k w_k[q] * onehot(idx_k[q], HW).  The matmul is MXU-trivial
(8 x 2048x2048x32 = 2.1 GFLOP/layer); the open question is the VPU cost of
building A (16 compare-select-accumulate passes over an (M, Lq, HW) fp32
tensor = 134 MB/pass of VMEM/HBM traffic).  This probe times, on-device via
lax.scan loops:

  a) A-construction alone,
  b) A-construction + matmul (the full one-hot path),
  c) the production gather path (ms_deform_attn_core) at the same shape,

each amortized over --iters iterations per fetch with the RTT subtracted
(same methodology as tools/devtime.py).
"""
from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--hw", default="32x64", help="level spatial shape")
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--points", type=int, default=4)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rba_tpu.ops.deform_sampling import ms_deform_attn_core

    h, w = (int(v) for v in args.hw.split("x"))
    hw = h * w
    lq = hw
    m, p, d = args.heads, args.points, args.dim
    rng = np.random.RandomState(0)

    value = jnp.asarray(rng.randn(1, hw, m, d), jnp.float32)
    loc = jnp.asarray(rng.rand(1, lq, m, 1, p, 2), jnp.float32)
    attn = jax.nn.softmax(jnp.asarray(rng.randn(1, lq, m, 1 * p), jnp.float32), -1)
    attn = attn.reshape(1, lq, m, 1, p)

    def prep(loc, attn):
        """(M, Lq, 16) flat corner indices + folded weights."""
        x = loc[0, :, :, 0, :, 0] * w - 0.5  # (Lq, M, P)
        y = loc[0, :, :, 0, :, 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx, ty = x - x0, y - y0
        x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
        idxs, ws = [], []
        for dy, dx, wt in ((0, 0, (1 - tx) * (1 - ty)), (0, 1, tx * (1 - ty)),
                           (1, 0, (1 - tx) * ty), (1, 1, tx * ty)):
            yi, xi = y0i + dy, x0i + dx
            valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            idxs.append(jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1))
            ws.append(jnp.where(valid, wt, 0.0) * attn[0, :, :, 0])
        idx = jnp.stack(idxs, -1).reshape(lq, m, p * 4)  # (Lq, M, 16)
        wgt = jnp.stack(ws, -1).reshape(lq, m, p * 4)
        return (jnp.transpose(idx, (1, 0, 2)), jnp.transpose(wgt, (1, 0, 2)))

    iota = jnp.arange(hw, dtype=jnp.int32)

    def build_A(idx, wgt):
        a = jnp.zeros((m, lq, hw), jnp.float32)
        for k in range(p * 4):
            oh = (iota[None, None, :] == idx[:, :, k : k + 1]).astype(jnp.float32)
            a = a + wgt[:, :, k : k + 1] * oh
        return a

    def make_onehot_full(precision):
        def onehot_full(value, loc, attn):
            idx, wgt = prep(loc, attn)
            a = build_A(idx, wgt)
            vh = jnp.transpose(value[0], (1, 0, 2))  # (M, HW, D)
            out = jnp.einsum("mqs,msd->mqd", a, vh, precision=precision)  # MXU
            return jnp.transpose(out, (1, 0, 2)).reshape(1, lq, m * d)

        return onehot_full

    onehot_full = make_onehot_full(None)

    def onehot_build_only(value, loc, attn):
        idx, wgt = prep(loc, attn)
        return build_A(idx, wgt)

    def gather_path(value, loc, attn):
        # pin the gather lowering: method="auto" would itself pick the
        # one-hot path at this probe's default shape, making the baseline
        # (and the error comparison) onehot-vs-onehot
        return ms_deform_attn_core(value, [(h, w)], loc, attn, method="gather")

    # correctness first
    ref = np.asarray(gather_path(value, loc, attn))
    got = np.asarray(onehot_full(value, loc, attn))
    err = float(np.abs(ref - got).max())
    got_hi = np.asarray(make_onehot_full(jax.lax.Precision.HIGHEST)(value, loc, attn))
    err_hi = float(np.abs(ref - got_hi).max())

    def timed(fn, label):
        @jax.jit
        def loop(value, loc, attn):
            def body(carry, _):
                r = fn(value, loc + carry * jnp.float32(1e-38), attn)
                return jnp.mean(r.astype(jnp.float32)), None

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
        ms = (min(times) - rtt) / args.iters * 1000.0
        return round(ms, 4)

    out = {
        "shape": {"hw": args.hw, "Lq": lq, "M": m, "P": p, "D": d},
        "backend": jax.default_backend(),
        "max_abs_err_vs_gather": err,
        "max_abs_err_vs_gather_highest": err_hi,
        "ms_onehot_build_only": timed(onehot_build_only, "build"),
        "ms_onehot_full": timed(onehot_full, "full"),
        "ms_onehot_full_highest": timed(
            make_onehot_full(jax.lax.Precision.HIGHEST), "full_hi"
        ),
        "ms_onehot_full_float32pref": timed(
            make_onehot_full(jax.lax.Precision.DEFAULT), "full_f32"
        ),
        "ms_gather": timed(gather_path, "gather"),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
