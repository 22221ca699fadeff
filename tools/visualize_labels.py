"""Render pipeline artifacts for eyeballing: CAMs, IR seeds, sem/ins masks.

Usage:
    python tools/visualize_labels.py --voc12_root <root> --id 2007_000032 \
        [--cam_out_dir result/cam] [--sem_seg_out_dir result/sem_seg] \
        [--ins_seg_out_dir result/ins_seg] [--ir_label_out_dir result/ir_label] \
        --out viz_2007_000032.png

Writes a horizontal strip: image | CAM overlay | IR seeds | sem mask |
instance masks (whichever artifacts exist)."""

import argparse
import os
import sys

import imageio.v2 as imageio
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--voc12_root", required=True)
    ap.add_argument("--id", required=True)
    ap.add_argument("--cam_out_dir", default="result/cam")
    ap.add_argument("--ir_label_out_dir", default="result/ir_label")
    ap.add_argument("--sem_seg_out_dir", default="result/sem_seg")
    ap.add_argument("--ins_seg_out_dir", default="result/ins_seg")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from irn_tpu.data.voc12 import get_img_path
    from irn_tpu.utils import viz

    img = np.asarray(imageio.imread(get_img_path(args.id, args.voc12_root)))
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    h, w = img.shape[:2]
    panels = [img.astype(np.float32) / 255.0]

    cam_path = os.path.join(args.cam_out_dir, args.id + ".npy")
    if os.path.exists(cam_path):
        d = np.load(cam_path, allow_pickle=True).item()
        overlay = viz.colorize_score(np.asarray(d["high_res"]))
        panels.append(0.5 * panels[0] + 0.5 * overlay[:h, :w])

    ir_path = os.path.join(args.ir_label_out_dir, args.id + ".png")
    if os.path.exists(ir_path):
        ir = np.asarray(imageio.imread(ir_path)).astype(np.int64)
        ir_v = viz.colorize_label(np.where(ir == 255, 21, ir), by_hue=False)
        panels.append(ir_v[:h, :w])

    sem_path = os.path.join(args.sem_seg_out_dir, args.id + ".png")
    if os.path.exists(sem_path):
        sem = np.asarray(imageio.imread(sem_path)).astype(np.int64)
        panels.append(viz.colorize_label(sem, by_hue=False)[:h, :w])

    ins_path = os.path.join(args.ins_seg_out_dir, args.id + ".npy")
    if os.path.exists(ins_path):
        d = np.load(ins_path, allow_pickle=True).item()
        inst = np.zeros((h, w), np.int64)
        order = np.argsort(d["score"])
        for rank, k in enumerate(order):
            if d["score"][k] > 1e-5:
                inst[d["mask"][k][:h, :w]] = rank + 1
        panels.append(viz.colorize_label(inst, by_hue=True)[:h, :w])

    strip = np.concatenate(
        [np.clip(p, 0, 1) for p in panels], axis=1
    )
    out = args.out or f"viz_{args.id}.png"
    imageio.imwrite(out, (strip * 255).astype(np.uint8))
    print(f"wrote {out} with {len(panels)} panels")


if __name__ == "__main__":
    main()
