"""Per-category device-time split from a jax.profiler trace (the tool behind
the CLAUDE.md trace-split numbers).

Captures an xplane trace of N inference iterations on the session device,
then aggregates HLO self-time by category via xprof's ``hlo_stats`` tool
(tensorboard_plugin_profile / xprof are in the image).  Output: one JSON
line with total device ms per category per inference, plus the top-k
individual ops — the measurement that drives layout work (e.g. the window
partition copy/reshape attack, VERDICT r3 task 3).

Usage (real TPU):
    python -m rba_tpu.tools.trace_split [--fast] [--hw 1024x2048] [--top 25]
    python -m rba_tpu.tools.trace_split --config /root/reference/ckpts/swin_l_1dl/config.yaml

Reference analogue: none (SURVEY.md §5 — the reference has no tracing).
"""
from __future__ import annotations

import argparse
import dataclasses
import glob
import json
import os
import tempfile


def hlo_stats_rows(xspace_path: str):
    """Parse xprof's hlo_stats DataTable JSON for one xplane file →
    list of {col_id: value} rows."""
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data([xspace_path], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    table = json.loads(data)
    if isinstance(table, list):  # some tools wrap in a list
        table = table[0]
    ids = [c["id"] for c in table["cols"]]
    rows = []
    for r in table.get("rows", []):
        rows.append({
            i: (cell or {}).get("v") for i, cell in zip(ids, r.get("c", []))
        })
    return rows


def aggregate(rows, iters: int, op_text_len: int = 220):
    """Sum self-time (us) by HLO category, normalized per inference."""
    cats = {}
    ops = {}
    for r in rows:
        cat = str(r.get("category") or "?").strip()
        # hlo_stats reports occurrences + total self time in microseconds
        t = r.get("total_self_time") or 0
        occ = r.get("occurrences") or 0
        name = str(r.get("hlo_op_expression") or r.get("hlo_op_name") or "?")
        try:
            t = float(t)
        except (TypeError, ValueError):
            continue
        cats[cat] = cats.get(cat, 0.0) + t
        key = (cat, name[:op_text_len])
        acc = ops.setdefault(key, [0.0, 0])
        acc[0] += t
        acc[1] += int(float(occ))
    per_inf = {k: round(v / iters / 1000.0, 3) for k, v in cats.items()}
    top = sorted(ops.items(), key=lambda kv: -kv[1][0])
    return per_inf, [
        {"category": c, "ms": round(v / iters / 1000.0, 3),
         "occ_per_inf": round(n / iters, 1), "op": nm}
        for (c, nm), (v, n) in top
    ]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="/root/reference/ckpts/swin_b_1dl/config.yaml")
    ap.add_argument("--hw", default="1024x2048")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--batch", type=int, default=1, help="images per inference")
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument(
        "--train",
        action="store_true",
        help="split the TRAIN step (fwd+matcher+losses+bwd+AdamW) instead of "
        "inference; --hw is the crop size, --batch the global batch "
        "(mirrors devtime --train's synthetic batch)",
    )
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--logdir", default=None)
    ap.add_argument("--keep", action="store_true", help="keep the trace dir")
    ap.add_argument("--tiny", action="store_true", help="tiny arch (CI smoke)")
    ap.add_argument("--platform", default="default", choices=("cpu", "default"))
    args = ap.parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from rba_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from rba_tpu.config import fast_serving, load_config, tiny_test_config
    from rba_tpu.models.maskformer import maskformer_infer_rba, maskformer_init

    cfg = tiny_test_config() if args.tiny else load_config(args.config)
    if args.fast:
        cfg = fast_serving(cfg)
    h, w = (int(v) for v in args.hw.split("x"))

    if args.train:
        from ..parallel.mesh import make_mesh, shard_batch
        from ..train.train_step import make_train_state, make_train_step

        mesh = make_mesh()
        state = make_train_state(jax.random.PRNGKey(0), cfg, mesh)
        step = make_train_step(cfg, mesh)
        b, t = args.batch, min(16, cfg.decoder.num_queries)
        rng = np.random.RandomState(0)
        batch = shard_batch(mesh, {
            "images": jnp.asarray(rng.rand(b, h, w, 3) * 255, jnp.float32),
            "gt_labels": jnp.asarray(rng.randint(0, cfg.num_classes, (b, t)), jnp.int32),
            "gt_masks": jnp.asarray((rng.rand(b, t, h, w) > 0.7).astype(np.float32)),
            "gt_valid": jnp.asarray(np.ones((b, t), np.float32)),
        })
        # two warmup calls: the second may be pjit's second compile (CLAUDE.md)
        state, m = step(state, batch)
        state, m = step(state, batch)
        float(m["total"])

        logdir = args.logdir or tempfile.mkdtemp(prefix="rba_trace_")
        jax.profiler.start_trace(logdir)
        for _ in range(args.iters):
            state, m = step(state, batch)
        float(m["total"])
        jax.profiler.stop_trace()
        _report(args, logdir, mode="train")
        return

    params = maskformer_init(jax.random.PRNGKey(0), cfg)
    if args.int8:
        from rba_tpu.ops.quant import quantize_params_int8

        params = quantize_params_int8(params, cfg=cfg)
    img = jnp.asarray(
        np.random.RandomState(0).rand(args.batch, h, w, 3) * 255, jnp.float32
    )

    # Direct (non-scan) calls: ops inside lax.scan get NO per-HLO events in
    # the xplane (verified on this image with the CPU backend), and device-
    # side event durations don't include the tunnel RTT — each call's HLO
    # self-times are exact; only host-side gaps between calls see the RTT.
    @jax.jit
    def infer(params, img):
        return jnp.mean(maskformer_infer_rba(params, cfg, img))

    float(infer(params, img))  # compile + warmup outside the trace

    logdir = args.logdir or tempfile.mkdtemp(prefix="rba_trace_")
    jax.profiler.start_trace(logdir)
    for _ in range(args.iters):
        v = infer(params, img)
    float(v)
    jax.profiler.stop_trace()

    return _report(args, logdir, mode="fast" if args.fast else "parity")


def _report(args, logdir, mode):
    import jax

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        raise SystemExit(f"no xplane.pb under {logdir}")
    rows = hlo_stats_rows(paths[-1])
    per_inf, top = aggregate(rows, args.iters)

    out = {
        "config": os.path.basename(os.path.dirname(args.config)),
        "hw": args.hw,
        "mode": mode + ("+int8" if args.int8 else ""),
        "iters": args.iters,
        "batch": args.batch,
        "backend": jax.default_backend(),
        "category_ms_per_inference": dict(
            sorted(per_inf.items(), key=lambda kv: -kv[1])
        ),
        "total_ms": round(sum(per_inf.values()), 2),
    }
    print(json.dumps(out, indent=2), flush=True)
    print(json.dumps({"top_ops": top[: args.top]}, indent=2))
    # per-category top ops: the categories whose cost is spread across many
    # small ops (data formatting!) never surface in the global top list
    by_cat = {}
    for t in top:
        by_cat.setdefault(t["category"], []).append(t)
    for cat, items in sorted(by_cat.items(),
                             key=lambda kv: -sum(i["ms"] for i in kv[1])):
        if cat in ("convolution fusion",):
            continue
        print(json.dumps({f"top[{cat}]": items[: args.top // 2 or 5]}, indent=2))
    if not args.keep:
        import shutil

        shutil.rmtree(logdir, ignore_errors=True)
    else:
        print("trace kept at", logdir)
    return out, top


if __name__ == "__main__":
    main()
