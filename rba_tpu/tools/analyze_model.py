"""Model analysis: parameter counts, FLOPs, activations, structure.

Behavioral spec: /root/reference/tools/analyze_model.py:53-177 (fvcore
parameter/flop/activation/structure tasks).  TPU-native: FLOPs come from
XLA's own cost analysis of the compiled inference program — the number that
actually hits the MXU — instead of fvcore op-counting.

Usage:
    python -m rba_tpu.tools.analyze_model --config-file ckpts/swin_b_1dl/config.yaml \
        --tasks parameter flop structure [--height 1024 --width 2048]
"""
from __future__ import annotations

import argparse
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np


def parameter_count(params, max_depth: int = 3):
    counts = defaultdict(int)
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = [str(p.key) if hasattr(p, "key") else str(p.idx) for p in path]
        n = int(np.prod(leaf.shape))
        counts[""] += n
        for d in range(1, min(len(keys), max_depth) + 1):
            counts[".".join(keys[:d])] += n
    return dict(counts)


def flop_count(fn, *args) -> float:
    """FLOPs of the jitted function from XLA cost analysis."""
    compiled = jax.jit(fn).lower(*args).compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return float(analysis.get("flops", float("nan")))


def flop_table(fn, *args) -> dict:
    """Per-operator FLOPs from the jaxpr: dot_general / conv FLOPs bucketed
    by primitive (the analogue of fvcore's by-operator table in the
    reference's do_flop, analyze_model.py:64-85)."""
    jaxpr = jax.make_jaxpr(fn)(*args)
    counts: dict = defaultdict(float)

    def visit(jpr):
        for eqn in jpr.eqns:
            for sub in jax.core.jaxprs_in_params(eqn.params) if hasattr(jax.core, "jaxprs_in_params") else []:
                visit(sub)
            for v in eqn.params.values():
                if hasattr(v, "jaxpr"):
                    visit(v.jaxpr)
            if eqn.primitive.name == "dot_general":
                lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
                out = eqn.outvars[0].aval
                ((lc, _), _) = eqn.params["dimension_numbers"]
                k = int(np.prod([lhs.shape[i] for i in lc]))
                counts["dot_general"] += 2.0 * k * int(np.prod(out.shape))
            elif eqn.primitive.name == "conv_general_dilated":
                rhs = eqn.invars[1].aval
                out = eqn.outvars[0].aval
                # kernel contributes k_elems/out_channel MACs per output elem
                out_ch = rhs.shape[eqn.params["dimension_numbers"].rhs_spec[0]]
                counts["conv"] += 2.0 * int(np.prod(rhs.shape)) / out_ch * int(np.prod(out.shape))
    visit(jaxpr.jaxpr)
    return dict(counts)


def activation_count(fn, *args) -> float:
    """Total intermediate activation elements (millions) from the jaxpr —
    the analogue of fvcore's activation_count_operators (reference
    do_activation, analyze_model.py:88-113)."""
    jaxpr = jax.make_jaxpr(fn)(*args)
    total = 0

    def visit(jpr):
        nonlocal total
        for eqn in jpr.eqns:
            for v in eqn.params.values():
                if hasattr(v, "jaxpr"):
                    visit(v.jaxpr)
            if eqn.primitive.name in ("dot_general", "conv_general_dilated"):
                total += sum(int(np.prod(o.aval.shape)) for o in eqn.outvars)
    visit(jaxpr.jaxpr)
    return total / 1e6


def memory_analysis(fn, *args) -> dict:
    """Compiled-program memory footprint from XLA (bytes)."""
    compiled = jax.jit(fn).lower(*args).compile()
    ma = compiled.memory_analysis()
    if ma is None:
        return {}
    return {
        "argument_mb": getattr(ma, "argument_size_in_bytes", 0) / 1e6,
        "output_mb": getattr(ma, "output_size_in_bytes", 0) / 1e6,
        "temp_mb": getattr(ma, "temp_size_in_bytes", 0) / 1e6,
    }


def structure_string(params, depth: int = 4) -> str:
    lines = []

    def rec(node, name, level):
        if level >= depth and not hasattr(node, "shape"):
            lines.append(f"{name}: <subtree>")
            return
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, f"{name}.{k}" if name else k, level + 1)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                rec(v, f"{name}[{i}]", level + 1)
        else:
            lines.append(f"{name}: {tuple(node.shape)} {node.dtype}")

    rec(params, "", 0)
    return "\n".join(lines)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config-file", required=True)
    p.add_argument("--tasks", nargs="+", default=["parameter"],
                   choices=["parameter", "flop", "activation", "structure", "memory"])
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=2048)
    args = p.parse_args(argv)

    from ..config import load_d2_config
    from ..models.maskformer import maskformer_infer_rba, maskformer_init

    cfg = load_d2_config(args.config_file)
    params = maskformer_init(jax.random.PRNGKey(0), cfg)

    for task in args.tasks:
        if task == "parameter":
            counts = parameter_count(params)
            print(f"total parameters: {counts[''] / 1e6:.2f}M")
            for k in sorted(counts):
                if k and k.count(".") <= 1:
                    print(f"  {k}: {counts[k] / 1e6:.2f}M")
        elif task == "flop":
            img = jnp.zeros((1, args.height, args.width, 3), jnp.float32)
            flops = flop_count(lambda p_, x: maskformer_infer_rba(p_, cfg, x), params, img)
            print(f"inference FLOPs @{args.height}x{args.width}: {flops / 1e9:.1f} GFLOPs")
            table = flop_table(lambda p_, x: maskformer_infer_rba(p_, cfg, x), params, img)
            for k, v in sorted(table.items()):
                print(f"  {k}: {v / 1e9:.1f} GFLOPs")
        elif task == "activation":
            img = jnp.zeros((1, args.height, args.width, 3), jnp.float32)
            acts = activation_count(lambda p_, x: maskformer_infer_rba(p_, cfg, x), params, img)
            print(f"(Million) activations @{args.height}x{args.width}: {acts:.1f}")
        elif task == "memory":
            img = jnp.zeros((1, args.height, args.width, 3), jnp.float32)
            for k, v in memory_analysis(
                lambda p_, x: maskformer_infer_rba(p_, cfg, x), params, img
            ).items():
                print(f"  {k}: {v:.1f}")
        elif task == "structure":
            print(structure_string(params))


if __name__ == "__main__":
    main()
