"""Instance grouping and evaluation tests."""

import json

import numpy as np
import pytest

from irn_tpu.eval import coco, insseg, semseg
from irn_tpu.ops import cc, centroids


def oracle_centroids(displacement, iterations):
    """Literal reference semantics (make_ins_seg_labels.py:18-56)."""
    height, width = displacement.shape[1:3]
    cy = np.repeat(np.expand_dims(np.arange(height), 1), width, axis=1).astype(np.float32)
    cx = np.repeat(np.expand_dims(np.arange(width), 0), height, axis=0).astype(np.float32)
    for _ in range(iterations):
        uy = np.ceil(cy).astype(np.int32)
        dy = np.floor(cy).astype(np.int32)
        yc = cy - dy
        ux = np.ceil(cx).astype(np.int32)
        dx = np.floor(cx).astype(np.int32)
        xc = cx - dx
        cy = cy + (displacement[0][uy, ux] * yc * xc
                   + displacement[0][dy, ux] * (1 - yc) * xc
                   + displacement[0][uy, dx] * yc * (1 - xc)
                   + displacement[0][dy, dx] * (1 - yc) * (1 - xc))
        cx = cx + (displacement[1][uy, ux] * yc * xc
                   + displacement[1][dy, ux] * (1 - yc) * xc
                   + displacement[1][uy, dx] * yc * (1 - xc)
                   + displacement[1][dy, dx] * (1 - yc) * (1 - xc))
        cy = np.clip(cy, 0, height - 1)
        cx = np.clip(cx, 0, width - 1)
    return np.stack([np.round(cy).astype(np.int32),
                     np.round(cx).astype(np.int32)], axis=0)


def test_centroids_match_oracle(rng):
    dp = (rng.standard_normal((2, 12, 14)) * 0.8).astype(np.float32)
    # short horizon: exact match (before fp32 drift through the
    # discontinuous ceil/floor cell selection can bifurcate trajectories)
    for iters in (1, 3, 8):
        want = oracle_centroids(dp, iters)
        got = np.asarray(centroids.find_centroids(dp, iterations=iters))
        np.testing.assert_array_equal(got, want)
    # long horizon: trajectories may bifurcate on rounding knife-edges;
    # demand near-total agreement within 1 cell
    want = oracle_centroids(dp, 50)
    got = np.asarray(centroids.find_centroids(dp, iterations=50))
    close = (np.abs(got - want) <= 1).all(axis=0)
    assert close.mean() > 0.95, close.mean()


def test_centroids_converge_to_attractor():
    h = w = 16
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    dp = np.stack([(8.0 - yy) * 0.3, (8.0 - xx) * 0.3], 0)
    cent = np.asarray(centroids.find_centroids(dp, iterations=300))
    assert (np.abs(cent[0] - 8) <= 1).all()
    assert (np.abs(cent[1] - 8) <= 1).all()
    inst = centroids.cluster_centroids(cent, dp, thres=2.5)
    # all pixels in one instance (plus possibly an empty 0 bucket)
    sizes = inst.reshape(inst.shape[0], -1).sum(1)
    assert (sizes > 0).sum() == 1


def test_detect_instance_fragments(rng):
    mask = np.zeros((2, 20, 20), bool)
    mask[0, 2:8, 2:8] = True       # 36 px component
    mask[0, 15:17, 15:17] = True   # 4 px fragment
    mask[1, 10:12, 0:2] = True
    score = np.ones((2, 20, 20), np.float32) * 0.7
    det = centroids.detect_instance(score, mask, np.array([3, 5]),
                                    max_fragment_size=10)
    assert det["mask"].shape[0] == 3
    assert set(det["class"].tolist()) == {3, 5}
    # fragment zero-scored, real components keep the max score
    scores = sorted(det["score"].tolist())
    assert scores[0] == 0.0 and scores[-1] == pytest.approx(0.7)


def test_confusion_and_miou():
    pred = np.array([[0, 0, 1], [1, 1, 2]])
    gt = np.array([[0, 1, 1], [1, 255, 2]])
    conf = semseg.confusion_matrix([pred], [gt])
    assert conf.sum() == 5  # 255 ignored
    scores = semseg.scores_from_confusion(conf)
    # class0: inter1 union2; class1: inter2 union3; class2: 1/1
    np.testing.assert_allclose(scores["iou"], [0.5, 2 / 3, 1.0])
    assert scores["miou"] == pytest.approx(np.mean([0.5, 2 / 3, 1.0]))


def test_decode_cam_to_labels():
    cam = np.array([[[0.9, 0.1]], [[0.2, 0.3]]])  # [2, 1, 2]
    keys = np.array([4, 7])
    labels = semseg.decode_cam_to_labels(cam, keys, bg_thres=0.25)
    np.testing.assert_array_equal(labels, [[5, 8]])
    labels = semseg.decode_cam_to_labels(cam, keys, bg_thres=0.95)
    np.testing.assert_array_equal(labels, [[0, 0]])


def test_instance_ap_perfect_and_miss():
    gt_mask = np.zeros((1, 10, 10), bool)
    gt_mask[0, 2:8, 2:8] = True
    # perfect prediction
    res = insseg.eval_instance_segmentation_voc(
        [gt_mask.copy()], [np.array([2])], [np.array([0.9])],
        [gt_mask], [np.array([2])],
    )
    assert res["ap"][2] == pytest.approx(1.0)
    # disjoint prediction
    bad = np.zeros((1, 10, 10), bool)
    bad[0, 0:2, 0:2] = True
    res = insseg.eval_instance_segmentation_voc(
        [bad], [np.array([2])], [np.array([0.9])], [gt_mask], [np.array([2])]
    )
    assert res["ap"][2] == pytest.approx(0.0)


def test_instance_ap_duplicate_and_ranking():
    gt_mask = np.zeros((1, 10, 10), bool)
    gt_mask[0, 2:8, 2:8] = True
    # duplicate detections: high-scored TP + low-scored duplicate FP
    preds = np.stack([gt_mask[0], gt_mask[0]])
    res = insseg.eval_instance_segmentation_voc(
        [preds], [np.array([1, 1])], [np.array([0.9, 0.5])],
        [gt_mask], [np.array([1])],
    )
    assert res["ap"][1] == pytest.approx(1.0)
    # reversed scores: FP outranks TP -> precision at recall 1 is 0.5
    res = insseg.eval_instance_segmentation_voc(
        [preds], [np.array([1, 1])], [np.array([0.5, 0.9])],
        [gt_mask], [np.array([1])],
    )
    assert res["ap"][1] == pytest.approx(1.0)  # same mask, still matches first


def test_load_voc_instance_gt():
    obj = np.array([[0, 1, 1], [2, 2, 255]], np.uint8)
    cls = np.array([[0, 3, 3], [5, 5, 255]], np.uint8)
    masks, labels = insseg.load_voc_instance_gt(obj, cls)
    assert masks.shape == (2, 2, 3)
    np.testing.assert_array_equal(labels, [2, 4])  # 0-based


def test_coco_export_roundtrip(tmp_path, rng):
    mask = np.zeros((12, 15), bool)
    mask[3:9, 4:11] = True
    rec = {
        "name": "2007_000123",
        "size": (12, 15),
        "score": np.array([0.8]),
        "mask": mask[None],
        "class": np.array([6]),
    }
    path = str(tmp_path / "ann.json")
    coco.export_instances([rec], path, segmentation_format="rle")
    data = json.load(open(path))
    assert data["images"][0]["id"] == 2007000123
    ann = data["annotations"][0]
    assert ann["category_id"] == 7
    assert ann["area"] == mask.sum()
    assert ann["bbox"] == [4.0, 3.0, 7.0, 6.0]
    back = cc.rle_decode(ann["segmentation"])
    np.testing.assert_array_equal(back.astype(bool), mask)
    assert len(data["categories"]) == 20


def _rasterize_polygons(polys, shape):
    # union semantics, as pycocotools merges a polygon list (fillPoly on
    # the whole list would apply even-odd hole subtraction instead)
    import cv2

    out = np.zeros(shape, np.uint8)
    for p in polys:
        pts = np.round(np.asarray(p).reshape(-1, 2)).astype(np.int32)
        cv2.fillPoly(out, [pts], 1)
    return out.astype(bool)


def test_coco_polygon_export(tmp_path, rng):
    """Default export is polygon segmentations (reference parity,
    make_cocoann.py:38-46) that rasterize back close to the mask."""
    mask = np.zeros((40, 50), bool)
    mask[5:30, 8:40] = True
    mask[12:20, 15:30] = False  # hole
    mask[0:6, 45:50] = True     # border-touching second blob
    rec = {
        "name": "2007_000456",
        "size": (40, 50),
        "score": np.array([0.9]),
        "mask": mask[None],
        "class": np.array([2]),
    }
    path = str(tmp_path / "ann_poly.json")
    coco.export_instances([rec], path)
    data = json.load(open(path))
    seg = data["annotations"][0]["segmentation"]
    assert isinstance(seg, list) and all(
        isinstance(p, list) and len(p) >= 6 and len(p) % 2 == 0 for p in seg
    )
    xs = np.concatenate([np.asarray(p)[0::2] for p in seg])
    ys = np.concatenate([np.asarray(p)[1::2] for p in seg])
    assert xs.min() >= 0 and ys.min() >= 0
    assert xs.max() <= 50 and ys.max() <= 40
    # outer rings rasterize back to (at least) the mask region; holes are
    # filled by COCO's polygon union semantics (as with pycococreatortools)
    back = _rasterize_polygons(seg, mask.shape)
    filled = mask.copy()
    filled[12:20, 15:30] = True
    inter = (back & filled).sum()
    union = (back | filled).sum()
    assert inter / union > 0.9, inter / union


def test_binary_mask_to_polygons_degenerate():
    # single-pixel mask simplifies below 3 points -> no polygons, and the
    # annotation is skipped like pycococreatortools' None return
    tiny = np.zeros((5, 5), bool)
    tiny[2, 2] = True
    assert coco.binary_mask_to_polygons(tiny) == [] or all(
        len(p) >= 6 for p in coco.binary_mask_to_polygons(tiny)
    )
    assert (
        coco.annotation_info(1, 1, 1, np.zeros((4, 4), bool)) is None
    )


def test_advect_matmul_matches_gather(rng):
    """The gather-free two-tap matmul advection (IRN_TPU_ADVECT=matmul,
    the TPU default) against the 4-corner gather form, both dynamic-extent:
    exact at short horizons; near-total with the usual knife-edge allowance
    at 300 iterations (trajectories may bifurcate where fp rounding lands a
    particle exactly on a cell boundary)."""
    import jax.numpy as jnp

    dp = (rng.standard_normal((2, 24, 32)) * 1.2).astype(np.float32)
    for h4, w4 in ((24, 32), (19, 27)):
        for iters in (1, 4, 8):
            a = np.asarray(centroids._find_centroids_gather(
                jnp.asarray(dp), jnp.int32(h4), jnp.int32(w4), iters))
            b = np.asarray(centroids._find_centroids_matmul(
                jnp.asarray(dp), jnp.int32(h4), jnp.int32(w4), iters))
            np.testing.assert_array_equal(a, b, err_msg=str((h4, w4, iters)))
    # Long horizons on a pure random field are a chaos amplifier (1-ulp
    # multiply-association differences bifurcate trajectories, same as the
    # 50-iter oracle allowance above); what production advects is a
    # *trained displacement field* whose basins contract trajectories. On
    # a basin-structured field with noise, 300 iterations must agree in
    # the converged coordinates and in the clustered instance maps.
    h, w = 24, 32
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    attract = np.where(xx < 16, 1.0, 0.0)
    cy = attract * 8 + (1 - attract) * 15
    cx = attract * 7 + (1 - attract) * 25
    dp = np.stack([(cy - yy) * 0.3, (cx - xx) * 0.3], 0).astype(np.float32)
    dp += (rng.standard_normal(dp.shape) * 0.05).astype(np.float32)
    a = np.asarray(centroids._find_centroids_gather(
        jnp.asarray(dp), jnp.int32(h), jnp.int32(w), 300))
    b = np.asarray(centroids._find_centroids_matmul(
        jnp.asarray(dp), jnp.int32(h), jnp.int32(w), 300))
    assert ((a == b).all(axis=0)).mean() > 0.99, (a != b).sum()
    inst_a = centroids.cluster_centroids(a, dp)
    inst_b = centroids.cluster_centroids(b, dp)
    np.testing.assert_array_equal(inst_a, inst_b)
