"""Build the multi-hot class-label dictionary from VOC XML annotations.

Standalone equivalent of the reference's voc12/make_cls_labels.py: collects
ids from the given name lists and writes ``{id: float32[20]}`` to a .npy.

Usage:
    python tools/make_cls_labels.py --voc12_root <VOC2012> \
        --train_list train_aug.txt --val_list val.txt --out cls_labels.npy
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--voc12_root", required=True)
    ap.add_argument("--train_list", required=True)
    ap.add_argument("--val_list", default=None)
    ap.add_argument("--out", default="cls_labels.npy")
    args = ap.parse_args()

    from irn_tpu.data import voc12

    names = list(voc12.load_img_name_list(args.train_list))
    if args.val_list:
        names += voc12.load_img_name_list(args.val_list)
    names = sorted(set(names))
    labels = voc12.make_label_dict(names, args.voc12_root)
    np.save(args.out, labels)
    print(f"wrote {len(labels)} entries -> {args.out}")


if __name__ == "__main__":
    main()
