"""Numerics ablation: parity (fp32 pixel decoder) vs fast serving modes.

Decides whether the fast modes are safe defaults by measuring what they do
to OOD metrics end-to-end (VERDICT r2 task 4): build the full-scale-golden
torch model at the released swin_b_1dl architecture, convert its exported
D2 checkpoint through the production pipeline, then score a synthetic
labeled set under each precision mode and report AUPRC/AUROC/FPR95 plus
per-pixel score deltas vs the fp32 torch reference.

Modes:
  parity     compute_dtype=bfloat16, pixel_decoder_dtype=float32 (default)
  pd_bf16    pixel_decoder_dtype=bfloat16
  fast       pd_bf16 + fast_math=True (bf16 window-attention softmax)
  fp32       everything fp32 (CPU-parity arithmetic, for scale)

Runs on whatever backend JAX selects (the real TPU under axon; CPU with
--cpu).  Both the exact all-pixel path and the streaming-histogram path are
reported.

Usage:
    python -m rba_tpu.tools.ablation [--images 50] [--hw 512x1024] [--cpu]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import tempfile


MODES = {
    "fp32": dict(compute_dtype="float32", pixel_decoder_dtype="float32", fast_math=False),
    "parity": dict(compute_dtype="bfloat16", pixel_decoder_dtype="float32", fast_math=False),
    "pd_bf16": dict(compute_dtype="bfloat16", pixel_decoder_dtype="bfloat16", fast_math=False),
    "fast": dict(compute_dtype="bfloat16", pixel_decoder_dtype="bfloat16", fast_math=True),
    # weight-only int8 on top of fast serving (ops/quant.py experiment)
    "fast_int8": dict(
        compute_dtype="bfloat16", pixel_decoder_dtype="bfloat16", fast_math=True,
        weight_quant="int8",
    ),
    # fast + bf16 one-hot deform row matrix (PixelDecoderConfig.sampling_dtype
    # — nested; applied specially in main()).  Measured 40.6 vs 41.2 ms on
    # v5e at Swin-B 1024x2048.
    "fast_bf16s": dict(
        compute_dtype="bfloat16", pixel_decoder_dtype="bfloat16", fast_math=True,
    ),
}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--images", type=int, default=50)
    ap.add_argument("--hw", default="512x1024")
    ap.add_argument("--dataset", choices=("noise", "structured"), default="noise",
                    help="'structured' composites gradients/textures/objects "
                         "(SyntheticStructured) instead of uniform noise — "
                         "closer to real-photo spatial statistics")
    ap.add_argument("--logit_scale", type=float, default=1.0,
                    help="scale the class_embed and mask_embed output heads "
                         "by this factor BEFORE export, pushing softmax/"
                         "sigmoid/tanh into the saturated regime of trained "
                         "checkpoints (random-init logits are tiny, so a "
                         "scale-1 ablation understates precision deltas)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true", help="miniature arch (CI smoke)")
    ap.add_argument("--modes", default="parity,pd_bf16,fast")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--ref_cache", default=None,
                    help="npz path for the torch fp32 reference scores: loaded "
                         "if present, else computed and saved (the reference "
                         "pass is ~30 s/image on CPU at 1024x2048 — caching "
                         "makes re-runs and crash recovery cheap).  Only valid "
                         "with --workdir (the checkpoint export must be the "
                         "one the scores were computed from)")
    ap.add_argument("--out", default=None,
                    help="write the result JSON here in addition to stdout")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from ..config import load_d2_config, tiny_test_config
    from ..data.ood_datasets import SyntheticAnomaly
    from ..evalx.evaluator import OODEvaluator
    from ..evalx.sweep import load_model
    from .selfcheck import build_torch_model, export_checkpoint, torch_rba_scores

    hw = tuple(int(v) for v in args.hw.split("x"))
    workdir = args.workdir or tempfile.mkdtemp(prefix="rba_ablation_")
    model_dir = os.path.join(workdir, "ckpts", "ablation")

    arch = tiny_test_config() if args.tiny else load_d2_config(
        "/root/reference/ckpts/swin_b_1dl/config.yaml"
    )
    def scale_heads(dec):
        if args.logit_scale != 1.0:
            import torch

            with torch.no_grad():
                for lin in (dec.class_embed, dec.mask_mlp[2]):
                    lin.weight.mul_(args.logit_scale)
                    lin.bias.mul_(args.logit_scale)
        return dec

    if not os.path.exists(os.path.join(model_dir, "config.yaml")):
        swin, pd, dec = build_torch_model(arch)
        dec = scale_heads(dec)
        export_checkpoint(swin, pd, dec, arch, model_dir)
    else:
        swin = pd = dec = None

    base_cfg, params = load_model(model_dir)
    if args.dataset == "structured":
        from ..data.ood_datasets import SyntheticStructured

        ds = SyntheticStructured(n=args.images, hw=hw)
    else:
        ds = SyntheticAnomaly(n=args.images, hw=hw)

    # fp32 torch reference scores (the ground-truth arithmetic)
    if args.ref_cache and not args.workdir:
        ap.error("--ref_cache requires --workdir (scores are tied to the export)")
    if args.ref_cache and os.path.exists(args.ref_cache):
        ref_scores = np.load(args.ref_cache)["ref_scores"]
        if ref_scores.shape[0] != args.images:
            ap.error(f"--ref_cache holds {ref_scores.shape[0]} images, want {args.images}")
    else:
        if swin is None:
            swin, pd, dec = build_torch_model(arch)
            dec = scale_heads(dec)
        images = [ds[i].image for i in range(len(ds))]
        ref_scores = torch_rba_scores(swin, pd, dec, base_cfg, images)
        if args.ref_cache:
            np.savez_compressed(args.ref_cache, ref_scores=ref_scores)
    gts = np.stack([ds[i].label for i in range(len(ds))])

    ref_eval = OODEvaluator(base_cfg, params)
    m_ref = ref_eval.evaluate_ood(ref_scores, gts)

    results = {"reference_torch_fp32": {k: round(100 * v, 4) for k, v in m_ref.items()}}
    for mode in args.modes.split(","):
        cfg = dataclasses.replace(base_cfg, **MODES[mode])
        # base_cfg comes through load_model's fast_serving defaults, whose
        # NESTED pixel_decoder.sampling_dtype="bfloat16" would otherwise leak
        # into the fp32/parity rows (MODES only overrides top-level fields) —
        # pin it per mode so each row measures exactly what it claims
        cfg = dataclasses.replace(
            cfg,
            pixel_decoder=dataclasses.replace(
                cfg.pixel_decoder,
                sampling_dtype="bfloat16" if mode == "fast_bf16s" else "float32",
            ),
        )
        ev = OODEvaluator(cfg, params)
        scores, _ = ev.compute_anomaly_scores(ds)
        m_exact = ev.evaluate_ood(scores, gts)
        m_stream = ev.evaluate_dataset(ds)
        results[mode] = {
            "exact": {k: round(100 * v, 4) for k, v in m_exact.items()},
            "streaming": {k: round(100 * v, 4) for k, v in m_stream.items()},
            "delta_vs_torch_pts": {
                k: round(100 * (m_exact[k] - m_ref[k]), 4) for k in m_exact
            },
            "score_map_max_abs_delta": float(np.abs(scores - ref_scores).max()),
            "score_map_mean_abs_delta": float(np.abs(scores - ref_scores).mean()),
        }
        print(json.dumps({mode: results[mode]}), flush=True)
        # each mode's jit executables/constants stay alive in jax's global
        # caches; at 64 images x 1024x2048 a 5-mode run OOM-killed a 125 GB
        # host after mode 2 — release before the next mode compiles
        del ev, scores, m_exact, m_stream
        jax.clear_caches()

    out = {
        "arch": "tiny" if args.tiny else "swin_b_1dl",
        "hw": list(hw),
        "n_images": args.images,
        "dataset": args.dataset,
        "logit_scale": args.logit_scale,
        "backend": jax.default_backend(),
        "results": results,
    }
    print(json.dumps(out, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    return out


if __name__ == "__main__":
    main()
