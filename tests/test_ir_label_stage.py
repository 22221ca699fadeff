"""cam_to_ir_label stage vs the reference's literal recipe.

Runs the stage over a tiny synthetic tree and re-derives every output
png with the reference's exact steps (step/cam_to_ir_label.py:26-43:
threshold-pad + argmax for fg/bg maps, one dense-CRF refinement each,
then combine: non-fg -> 255 ignore, joint-bg -> 0) using two single-CRF
calls — which also pins the stage's shared-lattice pair API against two
independent refinements."""

import dataclasses
import os

import imageio.v2 as imageio
import numpy as np
import pytest

from irn_tpu.data import synthetic, voc12
from irn_tpu.ops import crf
from irn_tpu.pipeline import stages_cam
from irn_tpu.pipeline.config import Config


def test_cam_to_ir_label_matches_reference_recipe(tmp_path, rng):
    root = str(tmp_path / "voc")
    train, _ = synthetic.generate(root, n_images=3, size=56,
                                  max_side_jitter=8, seed=5)
    cam_dir = tmp_path / "cam"
    cam_dir.mkdir()
    names = voc12.load_img_name_list(train)
    for name in names:
        img = np.asarray(
            imageio.imread(os.path.join(root, "JPEGImages", name + ".jpg"))
        )
        k = int(rng.integers(1, 3))
        keys = np.sort(rng.choice(20, size=k, replace=False)).astype(np.int64)
        high = rng.random((k,) + img.shape[:2]).astype(np.float32)
        np.save(str(cam_dir / f"{name}.npy"),
                {"keys": keys, "cam": None, "high_res": high})

    cfg = dataclasses.replace(
        Config(voc12_root=root, train_list=train, infer_list=train,
               cam_out_dir=str(cam_dir),
               ir_label_out_dir=str(tmp_path / "ir")).resolve(),
        num_workers=2,
    )
    stages_cam.cam_to_ir_label(cfg)

    for name in names:
        img = np.asarray(
            imageio.imread(os.path.join(root, "JPEGImages", name + ".jpg"))
        ).astype(np.uint8)
        d = np.load(str(cam_dir / f"{name}.npy"), allow_pickle=True).item()
        cams = d["high_res"]
        keys = np.pad(np.asarray(d["keys"]) + 1, (1, 0), mode="constant")

        fg_map = np.argmax(
            np.pad(cams, ((1, 0), (0, 0), (0, 0)),
                   constant_values=cfg.conf_fg_thres), axis=0,
        ).astype(np.int32)
        bg_map = np.argmax(
            np.pad(cams, ((1, 0), (0, 0), (0, 0)),
                   constant_values=cfg.conf_bg_thres), axis=0,
        ).astype(np.int32)
        fg_conf = keys[crf.crf_inference_label(
            img, fg_map, t=cfg.crf_iters, n_labels=keys.shape[0],
            gt_prob=cfg.crf_gt_prob,
        )]
        bg_conf = keys[crf.crf_inference_label(
            img, bg_map, t=cfg.crf_iters, n_labels=keys.shape[0],
            gt_prob=cfg.crf_gt_prob,
        )]
        want = fg_conf.copy()
        want[fg_conf == 0] = 255
        want[bg_conf + fg_conf == 0] = 0

        got = np.asarray(
            imageio.imread(str(tmp_path / "ir" / f"{name}.png"))
        )
        np.testing.assert_array_equal(got, want.astype(np.uint8),
                                      err_msg=name)
