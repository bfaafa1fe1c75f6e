"""Training CLI — the TPU-native equivalent of the reference's train_net.py.

Behavioral spec: /root/reference/train_net.py (Trainer :70-349, launch
:393-403): config-driven training with the mapper selected by
INPUT.DATASET_MAPPER_NAME, AdamW with per-module hyperparameters, poly LR,
checkpointing every CHECKPOINT_PERIOD, eval every EVAL_PERIOD.

Usage:
    python -m rba_tpu.train.train_net --config-file ckpts/swin_b_1dl/config.yaml \
        --data-root datasets/cityscapes [--coco-root datasets/COCO] \
        [--max-iter N] [--resume]

Instead of `launch`-forked NCCL processes, the step is one pjit program over
the full device mesh (rba_tpu/train/train_step.py); the host loop only feeds
numpy batches and writes checkpoints/logs.
"""
from __future__ import annotations

import argparse
import json
import os
import queue
import threading
import time
from typing import Iterator

import jax
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config-file", required=True)
    p.add_argument("--data-root", required=True, help="cityscapes root (leftImg8bit/gtFine)")
    p.add_argument("--coco-root", default=None, help="COCO root for OOD mixing")
    p.add_argument("--output-dir", default="output/")
    p.add_argument("--max-iter", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--checkpoint-period", type=int, default=5000)
    p.add_argument("--log-period", type=int, default=20)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--workers", type=int, default=None,
                   help="mapper threads feeding the prefetch queue "
                        "(default: DATALOADER.NUM_WORKERS from the config)")
    p.add_argument("--mapper", default=None,
                   choices=[None, "mask_former_semantic", "mask_former_semantic_coco_mix",
                            "mask_former_semantic_void",
                            "mask_former_semantic_street_hazards",
                            "mask_former_semantic_street_hazards_coco_mix"])
    p.add_argument("--grad-accum", type=int, default=1,
                   help="gradient-accumulation steps (global batch = "
                        "batch_size x grad_accum)")
    p.add_argument("--eval-only", action="store_true",
                   help="evaluate mIoU on the val split from the latest "
                        "checkpoint and exit (reference train_net.py:372)")
    p.add_argument("--eval-period", type=int, default=None,
                   help="in-train val-eval period in steps (default: "
                        "TEST.EVAL_PERIOD from the config; 0 disables)")
    p.add_argument("--eval-max-images", type=int, default=None,
                   help="cap val images per in-train eval")
    return p.parse_args(argv)


def run_val_eval(cfg, params, data_root: str, max_images=None, tta: bool = False):
    """Val-split metrics with the current params (reference Trainer.test,
    train_net.py:83-168 evaluator factory; ``tta=True`` mirrors
    Trainer.test_with_TTA, :378-379).  The dataset comes from the first
    resolvable cfg.datasets_test name (DATASETS.TEST — e.g. the map_coco
    recipe evaluates on mapillary_cityscapes_sem_seg_val), falling back to
    Cityscapes val under ``data_root``; a panoptic test set (e.g.
    coco_2017_val_panoptic_open) routes to the PQ evaluator instead of
    mIoU.  Returns None when no val data exists."""
    from ..data.ood_datasets import CityscapesSemSeg, PanopticDataset
    from ..evalx.seg_evaluators import SemSegEvaluator

    ds, ds_name = None, None
    for name in cfg.datasets_test or ():
        try:
            d = _resolve_dataset(name, data_root, semantic_only=False)
            if len(d) > 0:
                ds, ds_name = d, name
                break
        except (KeyError, ValueError, OSError):
            continue
    if ds is None:
        try:
            ds = CityscapesSemSeg(data_root, split="val")
        except FileNotFoundError:
            return None
    if len(ds) == 0:
        return None
    params = jax.device_get(params)
    if isinstance(ds, PanopticDataset):
        if tta:
            # no panoptic TTA in the reference (test_with_TTA is semantic
            # only); don't re-run PQ and mislabel it as augmented
            return None
        return _run_panoptic_val_eval(cfg, params, ds, ds_name, max_images)
    ev = SemSegEvaluator(cfg, params)
    n = len(ds) if not max_images else min(int(max_images), len(ds))
    if tta:
        from ..models.tta import tta_inference

        k = cfg.num_classes
        for i in range(n):
            s = ds[i]
            pred = np.asarray(tta_inference(params, cfg, s.image)).argmax(0)
            valid = s.label != 255
            ev.conf += np.bincount(
                s.label[valid].astype(np.int64) * k + pred[valid],
                minlength=k * k,
            ).reshape(k, k)
    else:
        for i in range(n):
            s = ds[i]
            ev.process(s.image, s.label)
    out = ev.evaluate()
    out.pop("IoU_per_class", None)
    out["eval_images"] = n
    return out


def _run_panoptic_val_eval(cfg, params, ds, ds_name, max_images=None):
    """PQ on a panoptic DATASETS.TEST split (reference Trainer.build_evaluator
    routes evaluator_type coco_panoptic_seg to COCOPanopticOpenEvaluator,
    train_net.py:103-131).  Thing ids come from the catalog metadata's
    contiguous thing map."""
    from ..data import catalog
    from ..evalx.seg_evaluators import OpenPanopticEvaluator

    thing_ids = None
    if ds_name is not None:
        m = catalog.metadata(ds_name).get("thing_dataset_id_to_contiguous_id")
        if m:
            # open metadata maps unknown things to the 255 sentinel — not a
            # trainable thing id
            thing_ids = tuple(sorted(v for v in set(m.values()) if v != 255))
    ev = (OpenPanopticEvaluator(cfg, params, thing_ids=thing_ids)
          if thing_ids is not None else OpenPanopticEvaluator(cfg, params))
    n = len(ds) if not max_images else min(int(max_images), len(ds))
    out = {}
    # PANOPTIC_ON gates the PQ evaluator (train_net.py:108-117; the open
    # mapper adds it unconditionally, :124-126); fall back to PQ when no
    # TEST flag selects anything so eval never comes back empty
    do_pq = (cfg.test.panoptic_on
             or "open_panoptic" in cfg.input.dataset_mapper_name
             or not (cfg.test.semantic_on or cfg.test.instance_on))
    if do_pq:
        for i in range(n):
            image, pan_gt, segments_gt = ds[i]
            ev.process(image, pan_gt, segments_gt)
        for split, stats in ev.evaluate().items():
            if isinstance(stats, dict):
                for k, v in stats.items():
                    if isinstance(v, (int, float)):
                        out[f"{split}_{k}"] = float(v)
            elif isinstance(stats, (int, float)):
                out[split] = float(stats)
    if cfg.test.semantic_on:
        # SEMANTIC_ON adds mIoU over per-pixel labels derived from the same
        # panoptic gt (the reference evaluates the offline-prepared
        # panoptic_semseg_* maps with SemSegEvaluator, train_net.py:91-102)
        from ..data.ood_datasets import SemSegFromPanoptic
        from ..evalx.seg_evaluators import SemSegEvaluator

        sem_ev = SemSegEvaluator(cfg, params)
        sv = SemSegFromPanoptic(ds)
        for i in range(n):
            s = sv[i]
            sem_ev.process(s.image, s.label)
        sem_out = sem_ev.evaluate()
        sem_out.pop("IoU_per_class", None)
        out.update(sem_out)
    if cfg.test.instance_on:
        # TEST.INSTANCE_ON adds mask-AP over the thing segments of the same
        # split (reference build_evaluator appends COCOEvaluator for
        # coco_panoptic_seg when instance_on, train_net.py:103-131)
        from ..data.ood_datasets import InstanceFromPanoptic
        from ..evalx.seg_evaluators import InstanceEvaluator

        inst_ev = InstanceEvaluator(cfg, params)
        inst_ev._fwd = ev  # share the shape-keyed jitted forward cache
        iv = InstanceFromPanoptic(ds, thing_ids)
        for i in range(n):
            image, masks, classes = iv[i]
            inst_ev.process(image, masks, classes)
        for k, v in inst_ev.evaluate().items():
            if isinstance(v, (int, float)):
                out[f"instance_{k}"] = float(v)
    out["eval_images"] = n
    return out


def build_mapper(cfg, args):
    """Mapper dispatch by INPUT.DATASET_MAPPER_NAME (reference
    train_net.py:170-209), overridable with --mapper."""
    from ..data.mappers import (
        COCOProxyDataset,
        InstanceDatasetMapper,
        InstanceLSJDatasetMapper,
        MapperConfig,
        PanopticDatasetMapper,
        PanopticLSJDatasetMapper,
        SemanticCocoMixDatasetMapper,
        SemanticDatasetMapper,
        SemanticVoidDatasetMapper,
        StreetHazardsCocoMixMapper,
        StreetHazardsMapper,
    )

    # augmentation geometry from the config's INPUT section (reference
    # mask_former_semantic_dataset_mapper.py from_config: MIN_SIZE_TRAIN
    # ladder, CROP.SIZE, COLOR_AUG_SSD, SIZE_DIVISIBILITY — Mapillary
    # differs from Cityscapes on all four); each target needs a distinct
    # query, so the static target padding is capped at num_queries
    mcfg = MapperConfig(
        min_sizes=cfg.input.min_size_train,
        max_size=cfg.input.max_size_train,
        crop_hw=tuple(cfg.input.crop_size),
        single_category_max_area=cfg.input.single_category_max_area,
        color_aug=cfg.input.color_aug_ssd,
        flip=cfg.input.random_flip,
        ignore_label=cfg.sem_seg_head_ignore_value,
        ood_label=cfg.ood.ood_label,
        size_divisibility=cfg.input.train_size_divisibility,
        max_instances=min(32, cfg.decoder.num_queries),
        repeat_instance_masks=cfg.input.repeat_instance_masks,
    )
    # INPUT.DATASET_MAPPER_NAME (reference train_net.py:170-209), CLI wins
    mapper_name = args.mapper or cfg.input.dataset_mapper_name

    def coco():
        # --coco-root wins; else INPUT.COCO_ROOT, resolved against the
        # datasets dir (the parent of --data-root), mirroring the
        # reference's DETECTRON2_DATASETS join (coco_mix mapper :148)
        root = args.coco_root
        if not root:
            root = cfg.input.coco_root
            if not os.path.isabs(root):
                root = os.path.join(os.path.dirname(
                    os.path.abspath(args.data_root)), root)
            if not os.path.isdir(root):
                raise ValueError(
                    "--coco-root required for coco_mix mappers "
                    f"(INPUT.COCO_ROOT fallback {root!r} does not exist)"
                )
        return COCOProxyDataset(root, proxy_size=cfg.input.coco_proxy_size)

    if mapper_name == "mask_former_semantic_coco_mix":
        return SemanticCocoMixDatasetMapper(mcfg, coco(), ood_prob=cfg.ood.ood_prob, seed=args.seed)
    if mapper_name == "mask_former_semantic_void":
        return SemanticVoidDatasetMapper(mcfg, seed=args.seed)
    if mapper_name == "mask_former_semantic_street_hazards":
        return StreetHazardsMapper(mcfg, seed=args.seed)
    if mapper_name == "mask_former_semantic_street_hazards_coco_mix":
        return StreetHazardsCocoMixMapper(mcfg, coco(), ood_prob=cfg.ood.ood_prob, seed=args.seed)
    # panoptic / instance mappers (reference train_net.py:188-207); the
    # panoptic variants consume (image, pan_id_map, segments_info) tuples
    # from PanopticDataset readers, the instance variants (image, masks,
    # classes)
    if mapper_name in ("mask_former_panoptic", "open_panoptic_coco_mapper"):
        return PanopticDatasetMapper(
            mcfg, seed=args.seed,
            unseen_label_set=_unseen_label_set(cfg, args)
            if mapper_name == "open_panoptic_coco_mapper" else None,
        )
    if mapper_name == "mask_former_instance":
        return InstanceDatasetMapper(mcfg, seed=args.seed)
    if mapper_name == "coco_panoptic_lsj":
        return PanopticLSJDatasetMapper(
            mcfg, seed=args.seed, image_size=cfg.input.image_size,
            min_scale=cfg.input.min_scale, max_scale=cfg.input.max_scale,
            unseen_label_set=_unseen_label_set(cfg, args),
        )
    if mapper_name == "coco_instance_lsj":
        return InstanceLSJDatasetMapper(
            mcfg, seed=args.seed, image_size=cfg.input.image_size,
            min_scale=cfg.input.min_scale, max_scale=cfg.input.max_scale,
        )
    return SemanticDatasetMapper(mcfg, seed=args.seed)


def _unseen_label_set(cfg, args):
    """Resolve DATASETS.UNSEEN_LABEL_SET (a class-name list, relative to the
    datasets dir) to contiguous class indices against the train dataset's
    metadata (reference open_coco_mapper.py:100-126).  Returns None when the
    config leaves it empty or the file is absent (the reference ships the
    unknown_K* lists with the datasets, not the code)."""
    from ..data import catalog
    from ..data.mappers import load_unseen_label_set

    path = cfg.unseen_label_set
    if not path:
        return None
    datasets_dir = os.path.dirname(os.path.abspath(args.data_root))
    if not os.path.isabs(path):
        # the reference resolves the path against its CWD, where datasets/
        # IS the datasets dir — so 'datasets/unknown/unknown_K20.txt' means
        # <datasets_dir>/unknown/unknown_K20.txt here; accept both spellings
        candidates = [os.path.join(datasets_dir, path)]
        if path.startswith("datasets/"):
            candidates.append(
                os.path.join(datasets_dir, path[len("datasets/"):])
            )
        path = next((c for c in candidates if os.path.isfile(c)), candidates[0])
    if not os.path.isfile(path):
        print(f"WARNING: DATASETS.UNSEEN_LABEL_SET {path!r} not found; "
              "training with full supervision")
        return None
    catalog.register_standard_datasets(datasets_dir)
    # thing_classes of DATASETS.TRAIN[0] (open_coco_mapper.py:107-108);
    # catalog.metadata returns {} for unknown names
    names: list = []
    for name in cfg.datasets_train:
        names = list(catalog.metadata(name).get("thing_classes", []))
        if names:
            break
    if not names:
        print("WARNING: no thing_classes metadata for DATASETS.TRAIN; "
              "unseen-label names cannot be resolved — full supervision")
        return None
    return load_unseen_label_set(path, names)


def prefetching_iterator(ds, mapper, batch_size: int, seed: int, workers: int = 4):
    """Infinite shuffled batch iterator with ``workers`` mapper threads.

    Replaces the reference's 10-worker D2 dataloader (train_net.py:254-260
    via build_detection_train_loader).  A coordinator thread feeds seeded
    per-epoch permutations batch-by-batch to an index queue; worker threads
    decode + map + collate and push finished batches (PIL decode and the
    numpy augmentations release the GIL, so threads scale).  One worker was
    enough at the round-2 step time (0.5 s); at 0.105 s/step the host must
    sustain ~10 img/s, beyond a single ~100 ms/image mapper thread.

    Determinism (matching the reference's seed-per-worker D2 loader): each
    sample's augmentation draws come from a ``random.Random`` seeded by
    (seed, stream position) — not from a mapper RNG shared across threads,
    whose interleaving would be schedule-dependent — and a reorder buffer
    yields batches in stream order, so two runs with the same --seed see
    identical crops/flips/mixes in identical order for any worker count."""
    import copy
    import random as _random

    if len(ds) < batch_size:
        # the per-epoch loop below yields only full batches; a smaller
        # dataset would block the consumer forever
        raise ValueError(
            f"dataset has {len(ds)} samples < batch size {batch_size} "
            "(the loader drops partial batches)"
        )
    idx_q: queue.Queue = queue.Queue(maxsize=2 * max(workers, 1))
    out_q: queue.Queue = queue.Queue(maxsize=4 + max(workers, 1))

    def coordinator():
        rng = np.random.RandomState(seed)
        pos = 0  # global stream position (monotonic across epochs)
        bseq = 0
        while True:
            idx = rng.permutation(len(ds))
            for start in range(0, len(idx) - batch_size + 1, batch_size):
                idx_q.put((bseq, pos + start, idx[start : start + batch_size]))
                bseq += 1
            pos += len(idx)

    class _WorkerError:
        def __init__(self, exc):
            self.exc = exc

    def worker():
        from ..data.mappers import collate

        wmapper = copy.copy(mapper)  # private rng slot; shares heavy state
        while True:
            bseq, pos0, ib = idx_q.get()
            # a raising worker must still deliver its sequence number, or
            # the reorder buffer below waits on the missing batch forever
            try:
                samples = []
                for j, i in enumerate(ib):
                    s = ds[int(i)]
                    wmapper.rng = _random.Random(seed * 0x9E3779B1 + pos0 + j)
                    # panoptic/instance readers yield raw tuples matching
                    # their mapper's signature; semantic readers a Sample
                    samples.append(
                        wmapper(*s) if isinstance(s, tuple) else wmapper(s.image, s.label)
                    )
                out_q.put((bseq, collate(samples)))
            except BaseException as e:  # noqa: BLE001 — relayed to consumer
                out_q.put((bseq, _WorkerError(e)))

    threading.Thread(target=coordinator, daemon=True).start()
    for _ in range(max(workers, 1)):
        threading.Thread(target=worker, daemon=True).start()
    pending: dict = {}
    want = 0
    while True:
        while want not in pending:
            bseq, batch = out_q.get()
            pending[bseq] = batch
        batch = pending.pop(want)
        if isinstance(batch, _WorkerError):
            raise batch.exc
        yield batch
        want += 1


def _resolve_dataset(name: str, data_root: str, semantic_only: bool = True):
    """DATASETS.TRAIN/TEST catalog name → dataset reader.

    The reference resolves these names through D2's DatasetCatalog
    (train_net.py:170-209 via build_detection_train_loader).  Here,
    ``cityscapes_*`` names read --data-root directly (it points at the
    cityscapes root, backward compatible); every other name goes through
    ``data/catalog.py`` rooted at the PARENT of --data-root — the
    reference's $DETECTRON2_DATASETS convention, under which
    mapillary_vistas/, StreetHazards/ and coco/ are siblings of
    cityscapes/.  With ``semantic_only`` (the val-eval path) only (image,
    label) readers are accepted; the panoptic/instance mappers take the raw
    tuple readers (e.g. PanopticDataset).  Raises KeyError / ValueError /
    OSError when the name or its data is unavailable."""
    from ..data import catalog
    from ..data.ood_datasets import CityscapesSemSeg, OODDataset, PanopticDataset

    # --data-root shortcut only for the SEMANTIC cityscapes names; panoptic/
    # instance cityscapes names must go through the catalog like any other
    if name.startswith("cityscapes_") and ("sem_seg" in name or name.endswith("_mix")):
        split = (
            "train" if name.endswith(("_train", "_mix"))
            else "val" if name.endswith("_val") else "test"
        )
        return CityscapesSemSeg(data_root, split)
    root = os.path.dirname(os.path.abspath(data_root))
    catalog.register_standard_datasets(root)
    ds = catalog.get(name)
    if semantic_only and not isinstance(ds, OODDataset):
        raise ValueError(f"dataset {name!r} is not a semantic (image, label) reader")
    if not semantic_only and not isinstance(ds, (OODDataset, PanopticDataset)):
        raise ValueError(f"dataset {name!r} is not a training reader")
    return ds


def _instance_view(ds, name: str):
    """Instance-mapper data path: panoptic ground truth → per-segment
    (image, masks, classes) tuples, keeping only thing classes per the
    catalog metadata (the reference loads instances from COCO annotations;
    see InstanceFromPanoptic)."""
    from ..data import catalog
    from ..data.ood_datasets import InstanceFromPanoptic, PanopticDataset

    if not isinstance(ds, PanopticDataset):
        raise ValueError(
            f"dataset {name!r} has no instance annotations (need panoptic gt)"
        )
    thing_ids = None
    m = catalog.metadata(name).get("thing_dataset_id_to_contiguous_id")
    if m:
        thing_ids = sorted(v for v in set(m.values()) if v != 255)
    return InstanceFromPanoptic(ds, thing_ids)


def data_iterator(cfg, args, batch_size: int) -> Iterator[dict]:
    """Infinite shuffled iterator over the union of cfg.datasets_train
    (DATASETS.TRAIN; the map_coco recipes list two datasets — see
    ``ConcatDataset``), mapped + batched by ``prefetching_iterator``."""
    from ..data.ood_datasets import ConcatDataset

    mapper_name = args.mapper or cfg.input.dataset_mapper_name
    semantic_only = not (
        "panoptic" in mapper_name or "instance" in mapper_name
    )
    parts, errors = [], []
    for name in cfg.datasets_train or ("cityscapes_fine_sem_seg_train",):
        try:
            d = _resolve_dataset(name, args.data_root, semantic_only)
            if "instance" in mapper_name:
                d = _instance_view(d, name)
            if len(d) == 0:
                raise FileNotFoundError("no samples found")
            parts.append(d)
        except (KeyError, ValueError, OSError) as e:
            errors.append(f"{name}: {e}")
    if errors:
        print(f"WARNING: skipped train dataset(s): {'; '.join(errors)}")
    if not parts:
        raise FileNotFoundError(
            f"none of DATASETS.TRAIN {list(cfg.datasets_train)} found under "
            f"{args.data_root} (or its parent datasets dir)"
        )
    ds = parts[0] if len(parts) == 1 else ConcatDataset(parts)
    mapper = build_mapper(cfg, args)
    return prefetching_iterator(
        ds, mapper, batch_size, args.seed,
        workers=getattr(args, "workers", None) or cfg.solver.num_workers,
    )


def main(argv=None):
    args = parse_args(argv)
    from ..config import load_d2_config
    from ..convert.checkpoint import latest_step, restore_train_state, save_train_state
    from ..parallel.mesh import make_mesh, shard_batch
    from .train_step import make_train_state, make_train_step

    cfg = load_d2_config(args.config_file)
    os.makedirs(args.output_dir, exist_ok=True)
    ckpt_dir = os.path.join(args.output_dir, "checkpoints")

    mesh = make_mesh()
    n_dev = int(np.prod(mesh.devices.shape))
    batch_size = args.batch_size or max(cfg.solver.ims_per_batch, n_dev)
    batch_size = (batch_size // n_dev) * n_dev or n_dev
    max_iter = args.max_iter or cfg.solver.max_iter

    state = make_train_state(jax.random.PRNGKey(args.seed), cfg, mesh)
    start = 0
    if args.resume or args.eval_only:
        step0 = latest_step(ckpt_dir)
        if step0 is not None:
            state = restore_train_state(ckpt_dir, state, step0)
            start = step0
            print(f"resumed from step {step0}")
        elif args.eval_only:
            print("WARNING: --eval-only with no checkpoint: random-init weights")

    if args.eval_only:
        res = run_val_eval(cfg, state.params, args.data_root, args.eval_max_images)
        if res is None:
            raise FileNotFoundError(f"no cityscapes val data under {args.data_root}")
        if cfg.test.aug_enabled:
            # reference train_net.py:378-379: TEST.AUG.ENABLED adds a
            # test-time-augmentation pass on top of the plain eval
            res_tta = run_val_eval(
                cfg, state.params, args.data_root, args.eval_max_images, tta=True
            )
            if res_tta is not None:
                res.update({f"{k}_TTA": v for k, v in res_tta.items()
                            if k != "eval_images"})
        res["step"] = start
        print(json.dumps({k: round(v, 4) if isinstance(v, float) else v
                          for k, v in res.items()}))
        return res

    step_fn = make_train_step(cfg, mesh, grad_accum=max(1, args.grad_accum))
    it = data_iterator(cfg, args, batch_size)
    log_path = os.path.join(args.output_dir, "metrics.jsonl")

    # optional wandb mirror (SOLVER.USE_WANDB in the reference config schema)
    wandb_run = None
    if os.environ.get("WANDB_PROJECT"):
        try:
            import wandb

            wandb_run = wandb.init(project=os.environ["WANDB_PROJECT"])
        except ImportError:
            print("wandb requested via WANDB_PROJECT but not installed; logging to jsonl only")

    t0 = time.time()
    for i in range(start, max_iter):
        batch = shard_batch(mesh, it.__next__())
        state, metrics = step_fn(state, batch)
        if (i + 1) % args.log_period == 0:
            m = {k: float(v) for k, v in metrics.items()}
            m.update(step=i + 1, imgs_per_sec=batch_size * args.log_period / (time.time() - t0))
            t0 = time.time()
            print(json.dumps({k: round(v, 4) if isinstance(v, float) else v for k, v in m.items()}))
            with open(log_path, "a") as f:
                f.write(json.dumps(m) + "\n")
            if wandb_run is not None:
                wandb_run.log(m, step=i + 1)
        if (args.checkpoint_period > 0 and (i + 1) % args.checkpoint_period == 0) \
                or (i + 1) == max_iter:
            save_train_state(ckpt_dir, state, i + 1)
            print(f"saved checkpoint at step {i + 1}")
        eval_period = cfg.test.eval_period if args.eval_period is None else args.eval_period
        if eval_period > 0 and (i + 1) % eval_period == 0:
            res = run_val_eval(cfg, state.params, args.data_root, args.eval_max_images)
            if res is not None:
                res["step"] = i + 1
                print(json.dumps({k: round(v, 4) if isinstance(v, float) else v
                                  for k, v in res.items()}))
                with open(log_path, "a") as f:
                    f.write(json.dumps(res) + "\n")
                if wandb_run is not None:
                    wandb_run.log(res, step=i + 1)


if __name__ == "__main__":
    main()
