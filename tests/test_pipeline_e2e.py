"""Full-pipeline integration test on a synthetic VOC tree (CPU, tiny
settings). Asserts every stage runs and produces its on-disk artifacts in
the reference layout."""

import json
import os

import numpy as np
import pytest

from irn_tpu.data import synthetic, voc12


@pytest.mark.slow
def test_full_pipeline(tmp_path, monkeypatch):
    root = str(tmp_path / "voc")
    workdir = tmp_path / "work"
    workdir.mkdir()
    monkeypatch.chdir(workdir)
    train, val = synthetic.generate(root, n_images=6, size=90,
                                    max_side_jitter=20, seed=4)

    from irn_tpu.pipeline.run import config_from_args, run_pipeline

    cfg = config_from_args([
        "--voc12_root", root,
        "--train_list", train, "--val_list", val, "--infer_list", train,
        "--cls_labels_path", root + "/cls_labels.npy",
        "--cam_crop_size", "64", "--cam_batch_size", "2",
        "--cam_num_epoches", "1", "--cam_learning_rate", "0.01",
        "--cam_scales", "1.0",
        "--irn_crop_size", "64", "--irn_batch_size", "2",
        "--irn_num_epoches", "1", "--path_radius", "4",
        "--exp_times", "3", "--rw_grid_cap", "32", "--ins_seed_cap", "8",
        "--pad_multiple", "32", "--crf_iters", "2", "--num_workers", "2",
        "--train_cam_pass", "--make_cam_pass", "--eval_cam_pass",
        "--cam_to_ir_label_pass", "--train_irn_pass",
        "--make_ins_seg_pass", "--eval_ins_seg_pass",
        "--make_sem_seg_pass", "--eval_sem_seg_pass", "--make_cocoann_pass",
    ])
    run_pipeline(cfg)

    names = voc12.load_img_name_list(train)
    # artifacts in the reference's layout
    assert os.path.exists("sess/res50_cam.ckpt")
    assert os.path.exists("sess/res50_irn.ckpt")
    for name in names:
        cam = np.load(f"result/cam/{name}.npy", allow_pickle=True).item()
        assert set(cam) == {"keys", "cam", "high_res"}
        assert cam["cam"].shape[0] == cam["keys"].shape[0]
        ir = np.asarray(__import__("imageio.v2", fromlist=["imread"]).imread(
            f"result/ir_label/{name}.png"))
        assert set(np.unique(ir)) <= set(range(21)) | {255}
        sem = np.asarray(__import__("imageio.v2", fromlist=["imread"]).imread(
            f"result/sem_seg/{name}.png"))
        assert sem.ndim == 2
        ins = np.load(f"result/ins_seg/{name}.npy", allow_pickle=True).item()
        assert {"score", "mask", "class"} <= set(ins)
    data = json.load(open("result/voc2012_train_custom.json"))
    assert len(data["images"]) == len(names)
    assert len(data["categories"]) == 20


def test_cli_help():
    from irn_tpu.pipeline.run import build_parser

    parser = build_parser()
    # reference flag names must exist
    txt = parser.format_help()
    for flag in ("--voc12_root", "--cam_scales", "--conf_fg_thres",
                 "--exp_times", "--sem_seg_bg_thres", "--train_cam_pass",
                 "--make_cocoann_pass"):
        assert flag in txt, flag


def test_cli_types():
    from irn_tpu.pipeline.run import config_from_args

    cfg = config_from_args([
        "--voc12_root", "/x", "--beta", "7", "--cam_scales", "1.0", "2.0",
        "--train_cam_pass", "--no-make_cam_pass",
    ])
    assert cfg.beta == 7 and isinstance(cfg.beta, int)
    assert cfg.cam_scales == (1.0, 2.0)
    assert cfg.train_cam_pass is True
    assert cfg.make_cam_pass is False
