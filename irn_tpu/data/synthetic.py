"""Synthetic VOC-like dataset generator (tests / smoke runs / CI).

Real PASCAL VOC 2012 is not available in every environment; this writes a
miniature tree with the same layout the pipeline consumes:

    <root>/JPEGImages/<id>.jpg          RGB images with colored class blobs
    <root>/SegmentationClass/<id>.png    semantic gt (0 bg, 1..20, 255 void)
    <root>/SegmentationObject/<id>.png   instance gt (0 bg, 1..K, 255 void)
    <root>/train.txt, val.txt            id lists
    <root>/cls_labels.npy                {id: float32[20]} multi-hot dict

Blobs are axis-aligned ellipses of class-specific color so that a
classifier can actually learn the labels.

Usage: ``python -m irn_tpu.data.synthetic <out_dir> --n 8 [--size 120]``
"""

from __future__ import annotations

import argparse
import os
from typing import Tuple

import imageio.v2 as imageio
import numpy as np

# distinct colors per class id (1..20)
_COLORS = (np.stack(np.meshgrid([60, 130, 200], [60, 130, 200], [60, 130, 200]),
                    -1).reshape(-1, 3)[:20]).astype(np.int32)


def generate(root: str, n_images: int = 8, size: int = 120,
             max_side_jitter: int = 40, n_classes: int = 20,
             seed: int = 0) -> Tuple[str, str]:
    """Write the tree; returns (train_list_path, val_list_path)."""
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "JPEGImages")
    sem_dir = os.path.join(root, "SegmentationClass")
    ins_dir = os.path.join(root, "SegmentationObject")
    for d in (img_dir, sem_dir, ins_dir):
        os.makedirs(d, exist_ok=True)

    names = []
    labels = {}
    for i in range(n_images):
        name = f"2007_{i:06d}"
        names.append(name)
        h = size + int(rng.integers(0, max_side_jitter + 1))
        w = size + int(rng.integers(0, max_side_jitter + 1))
        img = rng.integers(150, 255, (h, w, 3)).astype(np.uint8)
        sem = np.zeros((h, w), np.uint8)
        ins = np.zeros((h, w), np.uint8)
        multi = np.zeros((n_classes,), np.float32)

        n_blobs = int(rng.integers(1, 4))
        for b in range(n_blobs):
            cls = int(rng.integers(1, n_classes + 1))
            cy, cx = rng.integers(h // 4, 3 * h // 4), rng.integers(w // 4, 3 * w // 4)
            ry, rx = rng.integers(h // 8, h // 4), rng.integers(w // 8, w // 4)
            yy, xx = np.mgrid[0:h, 0:w]
            mask = ((yy - cy) / max(ry, 1)) ** 2 + ((xx - cx) / max(rx, 1)) ** 2 < 1
            color = _COLORS[cls - 1]
            img[mask] = (color + rng.integers(-20, 20, 3)).clip(0, 255)
            sem[mask] = cls
            ins[mask] = b + 1
            multi[cls - 1] = 1.0

        labels[name] = multi
        imageio.imwrite(os.path.join(img_dir, name + ".jpg"), img)
        imageio.imwrite(os.path.join(sem_dir, name + ".png"), sem)
        imageio.imwrite(os.path.join(ins_dir, name + ".png"), ins)

    train = names[: max(1, (3 * len(names)) // 4)]
    val = names[max(1, (3 * len(names)) // 4):] or names[-1:]
    train_path = os.path.join(root, "train.txt")
    val_path = os.path.join(root, "val.txt")
    with open(train_path, "w") as f:
        f.write("\n".join(train) + "\n")
    with open(val_path, "w") as f:
        f.write("\n".join(val) + "\n")
    np.save(os.path.join(root, "cls_labels.npy"), labels)  # dict payload
    return train_path, val_path


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out_dir")
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--size", type=int, default=120)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    train, val = generate(args.out_dir, args.n, args.size, seed=args.seed)
    print(f"wrote {args.n} images under {args.out_dir}")
    print(f"train list: {train}\nval list:   {val}")


if __name__ == "__main__":
    main()
