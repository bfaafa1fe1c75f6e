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


def register_standard_datasets(root: str) -> None:
    """Register the reference's standard catalog names rooted at ``root``
    (mirroring the D2 names in the released configs)."""
    from .ood_datasets import (
        BDD100KSeg,
        CityscapesSemSeg,
        FishyscapesLAF,
        FishyscapesStatic,
        LostAndFound,
        MapillarySemSeg,
        RoadAnomaly,
        RoadAnomaly21,
        RoadObstacle21,
        StreetHazards,
    )
    from .taxonomies import CITYSCAPES_CLASSES, CITYSCAPES_THING_CLASSES

    cs_meta = dict(
        stuff_classes=list(CITYSCAPES_CLASSES),
        thing_classes=list(CITYSCAPES_THING_CLASSES),
        ignore_label=255,
        evaluator_type="cityscapes_sem_seg",
    )
    specs = {
        "cityscapes_fine_sem_seg_train": (
            lambda: CityscapesSemSeg(os.path.join(root, "cityscapes"), "train"), cs_meta),
        "cityscapes_fine_sem_seg_val": (
            lambda: CityscapesSemSeg(os.path.join(root, "cityscapes"), "val"), cs_meta),
        "mapillary_cityscapes_sem_seg_train": (
            lambda: MapillarySemSeg(os.path.join(root, "mapillary_vistas"), "train"), cs_meta),
        "mapillary_cityscapes_sem_seg_val": (
            lambda: MapillarySemSeg(os.path.join(root, "mapillary_vistas"), "val"), cs_meta),
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
        "street_hazards_test": (lambda: StreetHazards(os.path.join(root, "street_hazards")), {}),
    }
    for name, (factory, meta) in specs.items():
        if name not in _REGISTRY:
            register(name, factory, **meta)
