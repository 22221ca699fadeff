"""COCO-format export of instance pseudo-labels (make_cocoann capability).

Replaces pycococreatortools (step/make_cocoann.py): builds image records and
RLE-segmentation annotations from the ins_seg stage outputs. Divergence
from the reference (documented): segmentations are uncompressed COCO RLE
rather than polygons — valid COCO, no skimage dependency."""

from __future__ import annotations

import json
from typing import Dict, List, Sequence

import numpy as np

from irn_tpu.data.voc12 import CAT_LIST
from irn_tpu.ops.cc import rle_encode


def image_info(image_id: int, file_name: str, width: int, height: int) -> Dict:
    return {
        "id": image_id,
        "file_name": file_name,
        "width": width,
        "height": height,
        "license": None,
        "url": None,
        "date_captured": None,
    }


def mask_bbox(mask: np.ndarray) -> List[float]:
    ys, xs = np.where(mask)
    if ys.size == 0:
        return [0.0, 0.0, 0.0, 0.0]
    x0, x1 = float(xs.min()), float(xs.max())
    y0, y1 = float(ys.min()), float(ys.max())
    return [x0, y0, x1 - x0 + 1.0, y1 - y0 + 1.0]


def annotation_info(ann_id: int, image_id: int, category_id: int,
                    mask: np.ndarray, score: float | None = None) -> Dict:
    ann = {
        "id": ann_id,
        "image_id": image_id,
        "category_id": int(category_id),
        "iscrowd": 0,
        "area": float(mask.sum()),
        "bbox": mask_bbox(mask),
        "segmentation": rle_encode(mask),
    }
    if score is not None:
        ann["score"] = float(score)
    return ann


def voc_categories() -> List[Dict]:
    return [
        {"id": i + 1, "name": c, "supercategory": "object"}
        for i, c in enumerate(CAT_LIST)
    ]


def image_id_from_name(name: str) -> int:
    """'2007_000032' -> 2007000032 (the reference's id scheme,
    make_cocoann.py:27)."""
    return int(name[:4] + name[5:])


def export_instances(
    records: Sequence[Dict],
    out_path: str,
    score_floor: float = 1e-5,
) -> Dict:
    """Write a COCO json from per-image instance records.

    Each record: {"name", "size": (h, w), "score": [N], "mask": [N, h, w],
    "class": [N] 0-based VOC class ids}. Instances below ``score_floor``
    are dropped (make_cocoann.py:38-39)."""
    out = {
        "type": "instances",
        "images": [],
        "annotations": [],
        "categories": voc_categories(),
    }
    ann_id = 1
    for rec in records:
        h, w = rec["size"]
        img_id = image_id_from_name(rec["name"])
        out["images"].append(image_info(img_id, rec["name"] + ".jpg", w, h))
        for score, mask, cls in zip(rec["score"], rec["mask"], rec["class"]):
            if score < score_floor:
                continue
            out["annotations"].append(
                annotation_info(ann_id, img_id, int(cls) + 1, mask, float(score))
            )
            ann_id += 1
    with open(out_path, "w") as f:
        json.dump(out, f)
    return out
