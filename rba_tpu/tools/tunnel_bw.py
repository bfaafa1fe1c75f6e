"""Raw host→device transfer probe through the session device (tunnel).

Measures device_put bandwidth vs buffer size, plus overlap behavior (two
concurrent transfers from separate threads).  Explains the end-to-end sweep
ceiling measured by tools/e2e_throughput.py: through the axon tunnel the
upload path is the serving bottleneck (CLAUDE.md: ~30-50 MB/s), while on a
real TPU VM host DMA runs ~GB/s and the device rate (bench.py) dominates.

Usage: python -m rba_tpu.tools.tunnel_bw [--sizes 1,4,8,16,33]
"""
from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sizes", default="1,4,8,16,33", help="MB list")
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    out = {"device": str(dev), "mb_per_s": {}}
    for mb in (float(s) for s in args.sizes.split(",")):
        n = int(mb * 1e6)
        buf = np.random.randint(0, 255, (n,), np.uint8)
        # warmup (allocator paths)
        x = jax.device_put(buf, dev)
        float(jnp.sum(x[:8].astype(jnp.float32)))
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            x = jax.device_put(buf, dev)
            float(jnp.sum(x[:8].astype(jnp.float32)))  # force completion
            times.append(time.perf_counter() - t0)
        best = min(times)
        out["mb_per_s"][f"{mb:g}MB"] = round(mb / best, 1)
        print(json.dumps({"mb": mb, "s": round(best, 3),
                          "mb_per_s": round(mb / best, 1)}), flush=True)

    # overlap: two 8 MB transfers from two threads vs serial
    import threading

    buf = np.random.randint(0, 255, (8_000_000,), np.uint8)
    bufs = [buf.copy(), buf.copy()]

    def put(i, results):
        x = jax.device_put(bufs[i], dev)
        float(jnp.sum(x[:8].astype(jnp.float32)))
        results[i] = True

    t0 = time.perf_counter()
    for i in range(2):
        put(i, [None, None])
    serial = time.perf_counter() - t0

    res = [None, None]
    t0 = time.perf_counter()
    ts = [threading.Thread(target=put, args=(i, res)) for i in range(2)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    overlap = time.perf_counter() - t0
    out["serial_2x8MB_s"] = round(serial, 3)
    out["threaded_2x8MB_s"] = round(overlap, 3)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
