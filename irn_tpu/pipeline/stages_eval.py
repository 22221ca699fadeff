"""Evaluation + export stages: eval_sem_seg, eval_ins_seg, make_cocoann.

Contracts follow step/eval_sem_seg.py, step/eval_ins_seg.py,
step/make_cocoann.py, with ground truth read directly from the VOC devkit's
SegmentationClass / SegmentationObject folders (the reference goes through
chainercv's dataset wrappers)."""

from __future__ import annotations

import os

import numpy as np

from irn_tpu.data import voc12
from irn_tpu.eval import coco, insseg, semseg
from irn_tpu.pipeline.config import Config


def _gt_ids(cfg: Config):
    """Ground-truth id list: the VOC segmentation split named by
    ``eval_set`` when present (the reference evaluates against chainercv's
    split datasets, e.g. ImageSets/Segmentation/train.txt), else the
    pipeline's infer list."""
    split = os.path.join(
        cfg.voc12_root, "ImageSets", "Segmentation", cfg.eval_set + ".txt"
    )
    if cfg.eval_set and os.path.exists(split):
        return voc12.load_img_name_list(split)
    return voc12.load_img_name_list(cfg.infer_list)


def eval_sem_seg(cfg: Config):
    names = _gt_ids(cfg)
    # streaming: one pred/gt pair resident at a time (peak RSS ~one image)
    conf = np.zeros((21, 21), np.int64)
    for name in names:
        pred = voc12.read_label_png(
            os.path.join(cfg.sem_seg_out_dir, name + ".png")
        ).astype(np.int64)
        pred[pred == 255] = 0  # eval_sem_seg.py:15
        gt = voc12.read_label_png(
            os.path.join(cfg.voc12_root, "SegmentationClass", name + ".png")
        )
        semseg.accumulate_confusion(conf, pred, gt)
    scores = semseg.scores_from_confusion(conf)
    print(scores["fp"][0], scores["fn"][0])
    print(np.nanmean(scores["fp"][1:]), np.nanmean(scores["fn"][1:]))
    print({"iou": scores["iou"], "miou": scores["miou"]})
    return scores


def eval_ins_seg(cfg: Config):
    import itertools

    names = _gt_ids(cfg)

    def records():
        for name in names:
            ins = np.load(
                os.path.join(cfg.ins_seg_out_dir, name + ".npy"),
                allow_pickle=True,
            ).item()
            obj = voc12.read_label_png(
                os.path.join(
                    cfg.voc12_root, "SegmentationObject", name + ".png"
                )
            )
            cls = voc12.read_label_png(
                os.path.join(
                    cfg.voc12_root, "SegmentationClass", name + ".png"
                )
            )
            masks, labels = insseg.load_voc_instance_gt(obj, cls)
            yield (np.asarray(ins["mask"], bool), np.asarray(ins["class"]),
                   np.asarray(ins["score"]), masks, labels)

    # Streaming: the evaluator zips its five sequences in lockstep, so
    # tee'd views over one record generator keep at most one image's masks
    # resident (the tee buffers never grow past a single record).
    def field(f, k):
        # closure binds (f, k) per stream — a bare nested genexp would
        # late-bind both to their final loop values
        return (r[k] for r in f)

    fields = itertools.tee(records(), 5)
    result = insseg.eval_instance_segmentation_voc(
        *(field(f, k) for k, f in enumerate(fields)), iou_thresh=0.5
    )
    print("0.5iou:", result)
    return result


def make_cocoann(cfg: Config):
    names = _gt_ids(cfg)
    records = []
    for name in names:
        ins = np.load(
            os.path.join(cfg.ins_seg_out_dir, name + ".npy"), allow_pickle=True
        ).item()
        if "size" not in ins:
            ins["size"] = ins["mask"].shape[1:] if len(ins["mask"]) else (0, 0)
        ins["name"] = name
        records.append(ins)
    os.makedirs(os.path.dirname(cfg.coco_ann_path) or ".", exist_ok=True)
    out = coco.export_instances(
        records, cfg.coco_ann_path, segmentation_format=cfg.coco_seg_format
    )
    print(
        f"wrote {cfg.coco_ann_path}: {len(out['images'])} images, "
        f"{len(out['annotations'])} annotations"
    )
    return out
