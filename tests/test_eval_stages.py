"""Stage-level eval tests over a tiny on-disk VOC tree.

Regression coverage for the streaming eval_ins_seg path: a generator
late-binding bug once fed the gt-label stream into all five evaluator
arguments (silently wrong AP, no crash), which only an end-to-end stage
run with a known-answer AP catches."""

import os

import imageio.v2 as imageio
import numpy as np
import pytest

from irn_tpu.pipeline.config import Config
from irn_tpu.pipeline import stages_eval


@pytest.fixture
def voc_tree(tmp_path):
    root = tmp_path / "voc"
    (root / "SegmentationObject").mkdir(parents=True)
    (root / "SegmentationClass").mkdir()
    (root / "ImageSets" / "Segmentation").mkdir(parents=True)
    ins_dir = tmp_path / "ins_seg"
    sem_dir = tmp_path / "sem_seg"
    ins_dir.mkdir()
    sem_dir.mkdir()
    names = ["2007_000001", "2007_000002"]
    rng = np.random.default_rng(0)
    for i, name in enumerate(names):
        obj = np.zeros((20, 24), np.uint8)
        cls = np.zeros((20, 24), np.uint8)
        # two instances of different classes + an ignore rim
        obj[3:9, 3:9] = 1
        cls[3:9, 3:9] = 7
        obj[12 : 17 + i, 10:20] = 2
        cls[12 : 17 + i, 10:20] = 12
        obj[0, :] = 255
        cls[0, :] = 255
        imageio.imwrite(str(root / "SegmentationObject" / f"{name}.png"), obj)
        imageio.imwrite(str(root / "SegmentationClass" / f"{name}.png"), cls)
        imageio.imwrite(str(sem_dir / f"{name}.png"), cls)
        # predictions: exact instance masks, classes 0-based (6, 11)
        np.save(
            str(ins_dir / f"{name}.npy"),
            {
                "size": (20, 24),
                "mask": np.stack([obj == 1, obj == 2]),
                "class": np.array([6, 11], np.int32),
                "score": np.array([0.9, 0.8], np.float32),
            },
        )
    lst = root / "ImageSets" / "Segmentation" / "val.txt"
    lst.write_text("".join(n + "\n" for n in names))
    cfg = Config(
        voc12_root=str(root),
        infer_list=str(lst),
        eval_set="val",
        ins_seg_out_dir=str(ins_dir),
        sem_seg_out_dir=str(sem_dir),
    )
    return cfg


def test_eval_ins_seg_stage_perfect_predictions(voc_tree):
    result = stages_eval.eval_ins_seg(voc_tree)
    # exact-mask predictions of both instances in both images: AP@0.5 = 1
    assert result["ap"][6] == pytest.approx(1.0)
    assert result["ap"][11] == pytest.approx(1.0)
    assert result["map"] == pytest.approx(1.0)


def test_eval_sem_seg_stage_perfect_predictions(voc_tree):
    scores = stages_eval.eval_sem_seg(voc_tree)
    # predictions are the gt maps themselves -> per-class IoU 1.0 for the
    # classes present (0, 7, 12); ignore rim excluded
    for k in (0, 7, 12):
        assert scores["iou"][k] == pytest.approx(1.0)


def test_eval_cam_stage_perfect_seeds(voc_tree, tmp_path):
    """eval_cam over high_res maps that decode exactly to the gt at the
    default threshold -> IoU 1.0 for present classes; the sweep reports a
    mIoU per grid threshold."""
    import dataclasses

    from irn_tpu.pipeline import stages_cam

    cam_dir = tmp_path / "cam"
    cam_dir.mkdir()
    names = ["2007_000001", "2007_000002"]
    for name in names:
        gt = np.asarray(
            imageio.imread(
                os.path.join(voc_tree.voc12_root, "SegmentationClass",
                             name + ".png")
            )
        )
        keys = np.array([6, 11])  # 0-based classes for gt labels 7, 12
        high = np.zeros((2,) + gt.shape, np.float32)
        high[0][gt == 7] = 0.9
        high[1][gt == 12] = 0.9
        np.save(str(cam_dir / f"{name}.npy"),
                {"keys": keys, "cam": None, "high_res": high})
    cfg = dataclasses.replace(voc_tree, cam_out_dir=str(cam_dir))
    scores = stages_cam.eval_cam(cfg, sweep=True)
    for k in (0, 7, 12):
        assert scores["iou"][k] == pytest.approx(1.0)
    assert scores["sweep"][0.45] == pytest.approx(scores["miou"])
