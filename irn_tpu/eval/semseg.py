"""Semantic-segmentation evaluation (chainercv replacement).

Reimplements ``calc_semantic_segmentation_confusion`` semantics: an
accumulated [n, n] confusion matrix over (gt, pred) pairs, ignoring
negative gt labels (chainercv marks VOC void pixels as -1; VOC pngs use
255). Consumed by the eval_cam / eval_sem_seg stages
(step/eval_cam.py:21-29, step/eval_sem_seg.py:18-31)."""

from __future__ import annotations

from typing import Dict, Iterable

import numpy as np


def confusion_matrix(
    preds: Iterable[np.ndarray], gts: Iterable[np.ndarray], ignore: int = 255
) -> np.ndarray:
    """Accumulate confusion over image pairs; matrix grows to fit labels.

    Negative predictions (chainercv's -1 void convention) are excluded
    like void gt — np.add.at would otherwise silently wrap them into the
    last column (chainercv's bincount raises on negatives)."""
    n = 1
    conf = np.zeros((n, n), np.int64)
    for pred, gt in zip(preds, gts):
        pred = np.asarray(pred).reshape(-1).astype(np.int64)
        gt = np.asarray(gt).reshape(-1).astype(np.int64)
        if pred.shape != gt.shape:
            raise ValueError("pred/gt shape mismatch")
        valid = (gt >= 0) & (gt != ignore) & (pred >= 0)
        pred = pred[valid]
        gt = gt[valid]
        m = int(max(pred.max(initial=0), gt.max(initial=0))) + 1
        if m > n:
            grown = np.zeros((m, m), np.int64)
            grown[:n, :n] = conf
            conf = grown
            n = m
        np.add.at(conf, (gt, pred), 1)
    return conf


def accumulate_confusion(
    conf: np.ndarray, pred: np.ndarray, gt: np.ndarray, ignore: int = 255
) -> None:
    """In-place one-image update of a fixed-size [n, n] confusion matrix.

    Streaming counterpart of :func:`confusion_matrix` for the eval stages,
    so an epoch over 10k images never holds more than one pred/gt pair in
    memory (the reference's chainercv accumulates the same way). Labels
    >= n are dropped, matching the reference's ``confusion[:21, :21]``
    crop (step/eval_sem_seg.py:21)."""
    n = conf.shape[0]
    pred = np.asarray(pred).reshape(-1).astype(np.int64)
    gt = np.asarray(gt).reshape(-1).astype(np.int64)
    if pred.shape != gt.shape:
        raise ValueError("pred/gt shape mismatch")
    valid = (gt >= 0) & (gt != ignore) & (gt < n) & (pred >= 0) & (pred < n)
    np.add.at(conf, (gt[valid], pred[valid]), 1)


def iou_from_confusion(conf: np.ndarray) -> np.ndarray:
    gtj = conf.sum(axis=1)
    resj = conf.sum(axis=0)
    diag = np.diag(conf)
    denom = gtj + resj - diag
    with np.errstate(divide="ignore", invalid="ignore"):
        return diag / denom


def scores_from_confusion(conf: np.ndarray) -> Dict:
    gtj = conf.sum(axis=1)
    resj = conf.sum(axis=0)
    diag = np.diag(conf)
    denom = gtj + resj - diag
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = diag / denom
        fp = 1.0 - gtj / denom
        fn = 1.0 - resj / denom
    return {
        "iou": iou,
        "miou": float(np.nanmean(iou)),
        "fp": fp,
        "fn": fn,
    }


def decode_cam_to_labels(
    high_res_cam: np.ndarray, keys: np.ndarray, bg_thres: float
) -> np.ndarray:
    """Threshold-pad background then argmax (eval_cam.py:14-18 /
    cam_to_ir_label.py:26-34 decode).

    Args:
      high_res_cam: [K, H, W] normalized per-class maps.
      keys: [K] class indices (0-based VOC classes).
      bg_thres: background plane value.

    Returns [H, W] labels in {0} | keys+1.
    """
    padded = np.concatenate(
        [np.full((1,) + high_res_cam.shape[1:], bg_thres, high_res_cam.dtype),
         high_res_cam],
        axis=0,
    )
    keymap = np.pad(np.asarray(keys) + 1, (1, 0), mode="constant")
    return keymap[np.argmax(padded, axis=0)]
