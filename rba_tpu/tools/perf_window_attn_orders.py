"""Window-attention einsum-order probe (VERDICT r4 item 7 — final
falsifiable attack on the ~7-10 TF/s attention-einsum floor).

The per-(window, head) matmuls are small for the 128x128 MXU: the score
matmul (N=144, hd=32) @ (hd, N) pads its 144-lane output to 256 (1.78x) and
the @v matmul (N, N) @ (N, hd=32) pads its 32-lane output to 128 (4x).
Candidate re-orderings measured here, all computing the identical math:

  v0_current     S = qk^T -> softmax -> S @ v          (the production form)
  v1_outT        @v emitted output-transposed (d, q): lane dim becomes
                 q=144 (1.78x pad) instead of d=32 (4x pad)
  v2_kmajor      scores built k-major (S^T) so BOTH matmuls contract with
                 ws^2 in sublanes
  v3_headpack    fold pairs of heads into the lane dim of v ((k, 2hd=64)
                 lanes) with a block-diagonal score matrix — 2x A-matrix
                 traffic for 2x lane utilization

Each variant runs the full per-stage window population of Swin-B @
1024x2048 (windows axis = batch), bf16 inputs, fp32 softmax, lax.scan
devtime methodology.  Reports ms + real-FLOPs TF/s.

    python -m rba_tpu.tools.perf_window_attn_orders [--stage 2] [--iters 16]
"""
from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--stage", type=int, default=2, help="Swin-B stage (0-3)")
    ap.add_argument("--hw", default="1024x2048")
    ap.add_argument("--ws", type=int, default=12)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--variants", default="v0_current,v1_outT,v2_kmajor,v3_headpack")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    h_img, w_img = (int(v) for v in args.hw.split("x"))
    stride = 4 * (2 ** args.stage)
    hs, ws_img = h_img // stride, w_img // stride
    ws = args.ws
    nw = ((hs + ws - 1) // ws) * ((ws_img + ws - 1) // ws)
    n = ws * ws
    c = 128 * (2 ** args.stage)
    nh = 4 * (2 ** args.stage)
    hd = c // nh
    w_cnt = nw  # batch folded into windows (B=1)

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(w_cnt, n, nh, hd), jnp.bfloat16)
    k = jnp.asarray(rng.randn(w_cnt, n, nh, hd), jnp.bfloat16)
    v = jnp.asarray(rng.randn(w_cnt, n, nh, hd), jnp.bfloat16)
    scale = hd ** -0.5

    def softmax_rows(s32, axis):
        m = jnp.max(s32, axis=axis, keepdims=True)
        e = jnp.exp(s32 - m)
        return (e / jnp.sum(e, axis=axis, keepdims=True)).astype(jnp.bfloat16)

    def v0_current(q, k, v):
        s = jnp.einsum("wqhd,wkhd->whqk", q * scale, k,
                       preferred_element_type=jnp.bfloat16)
        a = softmax_rows(s.astype(jnp.float32), -1)
        o = jnp.einsum("whqk,wkhd->wqhd", a, v, preferred_element_type=jnp.float32)
        return o.astype(jnp.bfloat16)

    def v1_outT(q, k, v):
        s = jnp.einsum("wqhd,wkhd->whqk", q * scale, k,
                       preferred_element_type=jnp.bfloat16)
        a = softmax_rows(s.astype(jnp.float32), -1)
        # output-transposed @v: lanes become q (144 -> 256 pad) not d (32 -> 128)
        ot = jnp.einsum("whqk,wkhd->whdq", a, v, preferred_element_type=jnp.float32)
        return jnp.transpose(ot, (0, 3, 1, 2)).astype(jnp.bfloat16)

    def v2_kmajor(q, k, v):
        # scores k-major: S^T (w, h, k, q); softmax over the SUBLANE axis
        st = jnp.einsum("wkhd,wqhd->whkq", k, q * scale,
                        preferred_element_type=jnp.bfloat16)
        a = softmax_rows(st.astype(jnp.float32), -2)  # normalize over k
        o = jnp.einsum("whkq,wkhd->wqhd", a, v, preferred_element_type=jnp.float32)
        return o.astype(jnp.bfloat16)

    def v3_headpack(q, k, v):
        # pairs of heads share one (q, 2k) x (2k, 2hd) block-diagonal matmul:
        # lanes of the @v output become 2hd = 64 (2x pad instead of 4x), at
        # the cost of materializing the zero off-blocks (2x score traffic)
        s = jnp.einsum("wqhd,wkhd->whqk", q * scale, k,
                       preferred_element_type=jnp.bfloat16)
        a = softmax_rows(s.astype(jnp.float32), -1)  # (w, nh, n, n)
        a2 = a.reshape(w_cnt, nh // 2, 2, n, n)
        # block-diag over the pair: (w, h2, q, 2k) with zeros off-block
        z = jnp.zeros_like(a2[:, :, 0])
        row0 = jnp.concatenate([a2[:, :, 0], z], -1)  # (w, h2, n, 2n)
        row1 = jnp.concatenate([z, a2[:, :, 1]], -1)
        v2 = jnp.transpose(v.reshape(w_cnt, n, nh // 2, 2, hd), (0, 2, 3, 1, 4))
        v2 = v2.reshape(w_cnt, nh // 2, 2 * n, hd)  # (w, h2, 2k, hd)
        # pack pair outputs in lanes: rhs (2k, 2hd) block-diag of v pair
        zv = jnp.zeros_like(v2[:, :, :n])
        rhs = jnp.concatenate(
            [jnp.concatenate([v2[:, :, :n], zv[:, :, :n]], -1),
             jnp.concatenate([zv[:, :, :n], v2[:, :, n:]], -1)], -2
        )  # (w, h2, 2n, 2hd)
        o0 = jnp.einsum("whqk,whkd->whqd", row0, rhs,
                        preferred_element_type=jnp.float32)
        o1 = jnp.einsum("whqk,whkd->whqd", row1, rhs,
                        preferred_element_type=jnp.float32)
        o = jnp.stack([o0[..., :hd], o1[..., hd:]], 2)  # (w, h2, 2, n, hd)
        return (jnp.transpose(o.reshape(w_cnt, nh, n, hd), (0, 2, 1, 3))
                .astype(jnp.bfloat16))

    fns = {f.__name__: f for f in (v0_current, v1_outT, v2_kmajor, v3_headpack)}

    # real FLOPs: 2 matmuls, 2*N^2*hd MACs each, per window per head
    flops = 2 * (2 * n * n * hd) * nh * w_cnt

    ref = np.asarray(v0_current(q, k, v), np.float32)
    results = {}
    for name in args.variants.split(","):
        f = fns[name]
        got = np.asarray(f(q, k, v), np.float32)
        err = float(np.abs(got - ref).max())

        @jax.jit
        def loop(q, k, v, f=f):
            def body(carry, _):
                o = f(q + carry * jnp.bfloat16(1e-30), k, v)
                return jnp.mean(o.astype(jnp.float32)), None
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
        float(loop(q, k, v))
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(loop(q, k, v))
            times.append(time.perf_counter() - t0)
        ms = (min(times) - rtt) / args.iters * 1000.0
        results[name] = {
            "ms": round(ms, 4),
            "tflops": round(flops / (ms / 1e3) / 1e12, 2),
            "max_err_vs_v0": err,
        }
        print(json.dumps({name: results[name]}), flush=True)

    print(json.dumps({
        "stage": args.stage, "windows": w_cnt, "n": n, "heads": nh, "hd": hd,
        "backend": jax.default_backend(), "results": results,
    }))
    return results


if __name__ == "__main__":
    main()
