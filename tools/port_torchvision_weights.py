"""Port a torch ResNet-50 / CAM / IRN checkpoint to irn_tpu variables.

Usage:
    python tools/port_torchvision_weights.py resnet50-19c8e357.pth out.ckpt
    python tools/port_torchvision_weights.py --kind cam res50_cam.pth out.ckpt
    python tools/port_torchvision_weights.py --kind irn res50_irn.pth out.ckpt

``--kind backbone`` (default) expects a torchvision ResNet-50 state dict and
writes `{params, stats}` loadable via Config.pretrained_backbone. ``cam`` /
``irn`` expect the reference pipeline's trained checkpoints
(net/resnet50_cam.py / net/resnet50_irn.py state dicts) and write full model
variables for `cam_weights_name` / `irn_weights_name`.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src", help="torch .pth state dict")
    ap.add_argument("dst", help="output .ckpt (pickled variables pytree)")
    ap.add_argument("--kind", choices=("backbone", "cam", "irn"),
                    default="backbone")
    args = ap.parse_args()

    from irn_tpu.utils import checkpoint as ckpt
    from irn_tpu.utils import weights as W

    sd = W.load_torch_state_dict(args.src)
    if args.kind == "backbone":
        out = W.convert_resnet50(sd)
    elif args.kind == "cam":
        out = W.convert_cam_net(sd)
    else:
        out = W.convert_irn_net(sd)
    ckpt.save_checkpoint(args.dst, out)
    n = sum(x.size for x in __import__("jax").tree.leaves(out))
    print(f"ported {args.kind}: {n/1e6:.1f}M params -> {args.dst}")


if __name__ == "__main__":
    main()
