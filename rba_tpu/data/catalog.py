"""Dataset catalog: register/look up datasets by name.

Behavioral spec: Detectron2's DatasetCatalog/MetadataCatalog as used by the
reference's 9 registration modules
(/root/reference/mask2former/data/datasets/__init__.py:2-11).  Provides the
same register-by-name indirection (so configs can say
``cityscapes_fine_sem_seg_val``) with plain callables instead of global
import side effects.
"""
from __future__ import annotations

import os
from typing import Callable, Dict, Optional

_REGISTRY: Dict[str, Callable[[], object]] = {}
_METADATA: Dict[str, Dict] = {}


def register(name: str, factory: Callable[[], object], **metadata) -> None:
    if name in _REGISTRY:
        raise KeyError(f"dataset {name!r} already registered")
    _REGISTRY[name] = factory
    _METADATA[name] = metadata


def get(name: str):
    if name not in _REGISTRY:
        raise KeyError(f"dataset {name!r} not registered; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name]()


def metadata(name: str) -> Dict:
    return _METADATA.get(name, {})


def registered() -> list:
    return sorted(_REGISTRY)


# ---------------------------------------------------------------------------
# metadata builders (category tables in rba_tpu/data/categories.py)
# ---------------------------------------------------------------------------

def coco_panoptic_metadata(open_panoptic: bool = False) -> Dict:
    """COCO 133-class panoptic metadata: thing/stuff classes+colors and the
    original-id → contiguous-id maps (reference
    register_coco_panoptic_annos_semseg.py:35-71; open variant drops the 16
    unknown thing classes, register_coco_open_panoptic.py:30-75)."""
    from .categories import COCO_PANOPTIC_CATEGORIES, OPEN_PANOPTIC_UNKNOWN_CLASSES

    unknown = set(OPEN_PANOPTIC_UNKNOWN_CLASSES) if open_panoptic else set()
    cats = COCO_PANOPTIC_CATEGORIES
    thing = [(n, c) for _, isth, n, c in cats if isth == 1 and n not in unknown]
    if open_panoptic:
        # running contiguous index over KEPT classes; unknown things → 255
        # (register_coco_open_panoptic.py:77-94)
        thing_map, stuff_map = {}, {}
        index = 0
        for i, isth, n, _ in cats:
            if isth == 1 and n in unknown:
                thing_map[i] = 255
            elif isth == 1:
                thing_map[i] = index
                index += 1
            else:
                stuff_map[i] = index
                index += 1
    else:
        # full-list positions for both maps
        # (register_coco_panoptic_annos_semseg.py:57-70)
        thing_map = {i: idx for idx, (i, isth, _, _) in enumerate(cats) if isth == 1}
        stuff_map = {i: idx for idx, (i, _, _, _) in enumerate(cats)}
    meta = {
        "thing_classes": [n for n, _ in thing],
        "thing_colors": [list(c) for _, c in thing],
        "stuff_classes": [n for _, _, n, _ in cats],
        "stuff_colors": [list(c) for _, _, _, c in cats],
        "thing_dataset_id_to_contiguous_id": thing_map,
        "stuff_dataset_id_to_contiguous_id": stuff_map,
        "ignore_label": 255,
        "label_divisor": 1000,
    }
    if open_panoptic:
        meta["unknown_classes"] = list(OPEN_PANOPTIC_UNKNOWN_CLASSES)
    return meta


def coco_stuff_10k_metadata() -> Dict:
    """(reference register_coco_stuff_10k.py:182-199)"""
    from .categories import COCO_STUFF_10K_CATEGORIES

    return {
        "stuff_classes": [n for _, _, n, _ in COCO_STUFF_10K_CATEGORIES],
        "stuff_dataset_id_to_contiguous_id": {
            i: idx for idx, (i, _, _, _) in enumerate(COCO_STUFF_10K_CATEGORIES)
        },
        "ignore_label": 255,
        "evaluator_type": "sem_seg",
    }


def mapillary_metadata() -> Dict:
    """Full 66-class Mapillary Vistas meta; train id = table position,
    position 65 (void--unlabeled, evaluate=False) is the ignore label
    (reference register_mapillary_vistas.py:473-484)."""
    from .categories import MAPILLARY_VISTAS_CATEGORIES

    evaluated = [(r, c) for _, r, _, ev, c in MAPILLARY_VISTAS_CATEGORIES if ev]
    return {
        "stuff_classes": [r for r, _ in evaluated],
        "stuff_colors": [list(c) for _, c in evaluated],
        "ignore_label": 65,
        "evaluator_type": "sem_seg",
    }


def mapillary_panoptic_metadata() -> Dict:
    """(reference register_mapillary_vistas_panoptic.py)"""
    from .categories import MAPILLARY_VISTAS_PANOPTIC_CATEGORIES

    cats = MAPILLARY_VISTAS_PANOPTIC_CATEGORIES
    return {
        "thing_classes": [n for _, isth, n, _ in cats if isth],
        "thing_colors": [list(c) for _, isth, _, c in cats if isth],
        "stuff_classes": [n for _, _, n, _ in cats],
        "stuff_colors": [list(c) for _, _, _, c in cats],
        "thing_dataset_id_to_contiguous_id": {
            i: idx for idx, (i, isth, _, _) in enumerate(cats) if isth
        },
        "stuff_dataset_id_to_contiguous_id": {i: idx for idx, (i, _, _, _) in enumerate(cats)},
        "ignore_label": 65,
        "label_divisor": 1000,
        "evaluator_type": "coco_panoptic_seg",
    }


def street_hazards_metadata() -> Dict:
    """(reference register_street_hazards.py:47-74: ignore_label 12)"""
    from .categories import STREET_HAZARDS_CLASSES

    return {
        "thing_classes": list(STREET_HAZARDS_CLASSES),
        "stuff_classes": list(STREET_HAZARDS_CLASSES),
        "ignore_label": 12,
        "evaluator_type": "sem_seg",
    }


_STANDARD_ROOT: str | None = None
_STANDARD_OWNED: set = set()


def register_standard_datasets(root: str) -> None:
    """Register every catalog name the reference's registration modules
    provide, rooted at ``root`` (the 9 modules of
    /root/reference/mask2former/data/datasets/__init__.py plus the
    cityscapes-partial and coco-mix aliases).

    Calling again with a different ``root`` re-points the standard names at
    the new root (the reference re-reads $DETECTRON2_DATASETS at import, so
    the root is process-ambient there; here it is an explicit argument).
    User registrations via :func:`register` are never clobbered — only the
    standard spec names are refreshed."""
    from .ood_datasets import (
        BDD100KSeg,
        CityscapesSemSeg,
        FishyscapesLAF,
        FishyscapesStatic,
        LostAndFound,
        MapillarySemSeg,
        PanopticDataset,
        RoadAnomaly,
        RoadAnomaly21,
        RoadObstacle21,
        SemSegFolder,
        StreetHazards,
    )
    from .taxonomies import CITYSCAPES_CLASSES, CITYSCAPES_THING_CLASSES

    cs_meta = dict(
        stuff_classes=list(CITYSCAPES_CLASSES),
        thing_classes=list(CITYSCAPES_THING_CLASSES),
        ignore_label=255,
        evaluator_type="cityscapes_sem_seg",
    )
    cs = os.path.join(root, "cityscapes")
    coco = os.path.join(root, "coco")
    mapi = os.path.join(root, "mapillary_vistas")

    def cs_split(split):
        return lambda: CityscapesSemSeg(cs, split)

    def panoptic_reader(image_root, pan_root, json_path, meta):
        # raw json category ids → contiguous training ids, as the reference
        # does at registration (_convert_category_id); thing map wins on
        # overlap, matching its thing-first membership test
        cmap = {**meta["stuff_dataset_id_to_contiguous_id"],
                **meta["thing_dataset_id_to_contiguous_id"]}
        things = set(meta["thing_dataset_id_to_contiguous_id"])
        return lambda: PanopticDataset(
            image_root, pan_root, json_path,
            category_map=cmap, thing_dataset_ids=things,
        )

    def coco_panoptic(split, meta):
        return panoptic_reader(
            os.path.join(coco, f"{split}2017"),
            os.path.join(coco, f"panoptic_{split}2017"),
            os.path.join(coco, f"annotations/panoptic_{split}2017.json"),
            meta,
        )

    pan_meta = coco_panoptic_metadata()
    open_meta = coco_panoptic_metadata(open_panoptic=True)
    mapi_pan_meta = mapillary_panoptic_metadata()
    stuff_meta = coco_stuff_10k_metadata()
    mapi_meta = mapillary_metadata()
    sh_meta = street_hazards_metadata()
    sh_root = os.path.join(root, "StreetHazards")

    specs = {
        # cityscapes (incl. the partial module's test split + instance alias
        # and the coco-mix name that points at the ordinary train split,
        # cityscapes_coco_mix.py:16-35)
        "cityscapes_fine_sem_seg_train": (cs_split("train"), cs_meta),
        "cityscapes_fine_sem_seg_val": (cs_split("val"), cs_meta),
        "cityscapes_fine_sem_seg_test": (cs_split("test"), cs_meta),
        "cityscapes_coco_sem_seg_mix": (cs_split("train"), cs_meta),
        "cityscapes_fine_instance_seg_train": (
            cs_split("train"), {**cs_meta, "evaluator_type": "cityscapes_instance"}),
        "cityscapes_fine_instance_seg_val": (
            cs_split("val"), {**cs_meta, "evaluator_type": "cityscapes_instance"}),
        # mapillary full taxonomy + cityscapes-taxonomy + panoptic
        "mapillary_vistas_sem_seg_train": (
            lambda: SemSegFolder(os.path.join(mapi, "training/images"),
                                 os.path.join(mapi, "training/labels")), mapi_meta),
        "mapillary_vistas_sem_seg_val": (
            lambda: SemSegFolder(os.path.join(mapi, "validation/images"),
                                 os.path.join(mapi, "validation/labels")), mapi_meta),
        "mapillary_vistas_panoptic_train": (
            panoptic_reader(
                os.path.join(mapi, "training/images"),
                os.path.join(mapi, "training/panoptic"),
                os.path.join(mapi, "training/panoptic/panoptic_2018.json"),
                mapi_pan_meta),
            mapi_pan_meta),
        "mapillary_vistas_panoptic_val": (
            panoptic_reader(
                os.path.join(mapi, "validation/images"),
                os.path.join(mapi, "validation/panoptic"),
                os.path.join(mapi, "validation/panoptic/panoptic_2018.json"),
                mapi_pan_meta),
            mapi_pan_meta),
        "mapillary_cityscapes_sem_seg_train": (
            lambda: MapillarySemSeg(mapi, "train"), cs_meta),
        "mapillary_cityscapes_sem_seg_val": (
            lambda: MapillarySemSeg(mapi, "val"), cs_meta),
        # coco panoptic (+_with_sem_seg alias) and the open-world variant
        "coco_2017_train_panoptic": (coco_panoptic("train", pan_meta),
                                     {**pan_meta, "evaluator_type": "coco_panoptic_seg"}),
        "coco_2017_val_panoptic": (coco_panoptic("val", pan_meta),
                                   {**pan_meta, "evaluator_type": "coco_panoptic_seg"}),
        "coco_2017_train_panoptic_with_sem_seg": (
            coco_panoptic("train", pan_meta),
            {**pan_meta, "evaluator_type": "coco_panoptic_seg"}),
        "coco_2017_val_panoptic_with_sem_seg": (
            coco_panoptic("val", pan_meta),
            {**pan_meta, "evaluator_type": "coco_panoptic_seg"}),
        "coco_2017_train_panoptic_open": (
            coco_panoptic("train", open_meta),
            {**open_meta, "evaluator_type": "coco_panoptic_seg"}),
        "coco_2017_val_panoptic_open": (
            coco_panoptic("val", open_meta),
            {**open_meta, "evaluator_type": "coco_panoptic_seg"}),
        # coco stuff-10k semantic
        "coco_2017_train_stuff_10k_sem_seg": (
            lambda: SemSegFolder(
                os.path.join(coco, "coco_stuff_10k/images_detectron2/train"),
                os.path.join(coco, "coco_stuff_10k/annotations_detectron2/train")),
            stuff_meta),
        "coco_2017_test_stuff_10k_sem_seg": (
            lambda: SemSegFolder(
                os.path.join(coco, "coco_stuff_10k/images_detectron2/test"),
                os.path.join(coco, "coco_stuff_10k/annotations_detectron2/test")),
            stuff_meta),
        # street hazards train/val (register_street_hazards.py) + OOD test
        "street_hazards_sem_seg_train": (
            lambda: SemSegFolder(os.path.join(sh_root, "train/images"),
                                 os.path.join(sh_root, "train/annotations")), sh_meta),
        "street_hazards_sem_seg_val": (
            lambda: SemSegFolder(os.path.join(sh_root, "train/images"),
                                 os.path.join(sh_root, "train/annotations")), sh_meta),
        "street_hazards_test": (lambda: StreetHazards(os.path.join(root, "street_hazards")), {}),
        # standalone OOD eval datasets
        "road_anomaly": (
            lambda: RoadAnomaly(os.path.join(root, "RoadAnomaly/RoadAnomaly_jpg")), {}),
        "fishyscapes_laf": (lambda: FishyscapesLAF(os.path.join(root, "Fishyscapes")), {}),
        "fs_static": (lambda: FishyscapesStatic(os.path.join(root, "Fishyscapes"), 1), {}),
        "road_anomaly_21": (
            lambda: RoadAnomaly21(os.path.join(root, "SegmentMeIfYouCan/dataset_AnomalyTrack")), {}),
        "road_obstacles": (
            lambda: RoadObstacle21(os.path.join(root, "SegmentMeIfYouCan/dataset_ObstacleTrack")), {}),
        "lost_and_found": (lambda: LostAndFound(os.path.join(root, "LostAndFound")), {}),
        "bdd100k_sem_seg_val": (lambda: BDD100KSeg(os.path.join(root, "bdd100k/seg")), {}),
    }
    global _STANDARD_ROOT
    refresh = _STANDARD_ROOT is not None and _STANDARD_ROOT != root
    _STANDARD_ROOT = root
    for name, (factory, meta) in specs.items():
        if name not in _REGISTRY:
            _REGISTRY[name] = factory
            _METADATA[name] = meta
            _STANDARD_OWNED.add(name)
        elif refresh and name in _STANDARD_OWNED:
            # re-point only names this function itself registered — a user
            # register() of a standard name is never clobbered
            _REGISTRY[name] = factory
            _METADATA[name] = meta
