"""Port torch checkpoints (torchvision ResNet-50, reference CAM/IRN nets)
into irn_tpu Flax variable pytrees.

Pure-NumPy: accepts a ``{name: np.ndarray}`` mapping so callers can feed
either ``torch.load(...)`` state dicts (after ``.numpy()``) or ``.npz``
archives. Conv kernels are transposed OIHW -> HWIO; batch-norm running
statistics land in the ``stats`` collection; affine weight/bias become
``scale``/``bias`` params.

Reference layer naming is documented at /root/reference/net/resnet50.py
(conv1, bn1, layer{1..4}.{i}.conv{1..3}/bn{1..3}/downsample.{0,1}) and
/root/reference/net/resnet50_irn.py (fc_edge1..6, fc_dp1..7, mean_shift).
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np

BLOCKS = (3, 4, 6, 3)


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _conv_kernel(t) -> np.ndarray:
    return _np(t).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _bn(sd: Mapping[str, np.ndarray], prefix: str) -> Tuple[Dict, Dict]:
    params = {"scale": _np(sd[prefix + ".weight"]),
              "bias": _np(sd[prefix + ".bias"])}
    stats = {"mean": _np(sd[prefix + ".running_mean"]),
             "var": _np(sd[prefix + ".running_var"])}
    return params, stats


def convert_resnet50(sd: Mapping, prefix: str = "") -> Dict:
    """torch ResNet-50 state dict -> ``{'params': ..., 'stats': ...}``
    matching :class:`irn_tpu.models.resnet.ResNet50`.

    ``prefix`` handles nesting (e.g. ``"resnet50."`` inside the reference CAM
    checkpoint). ``fc.*`` entries, if present, are ignored (the reference
    pops them, resnet50.py:116-117)."""
    p: Dict = {}
    s: Dict = {}
    p["conv1"] = {"kernel": _conv_kernel(sd[prefix + "conv1.weight"])}
    p["bn1"], s["bn1"] = _bn(sd, prefix + "bn1")
    for li in range(4):
        for bi in range(BLOCKS[li]):
            tsrc = f"{prefix}layer{li + 1}.{bi}"
            name = f"layer{li + 1}_{bi}"
            bp: Dict = {}
            bs: Dict = {}
            for ci in (1, 2, 3):
                bp[f"conv{ci}"] = {
                    "kernel": _conv_kernel(sd[f"{tsrc}.conv{ci}.weight"])
                }
                bp[f"bn{ci}"], bs[f"bn{ci}"] = _bn(sd, f"{tsrc}.bn{ci}")
            if f"{tsrc}.downsample.0.weight" in sd:
                bp["down_conv"] = {
                    "kernel": _conv_kernel(sd[f"{tsrc}.downsample.0.weight"])
                }
                bp["down_bn"], bs["down_bn"] = _bn(sd, f"{tsrc}.downsample.1")
            p[name] = bp
            s[name] = bs
    return {"params": p, "stats": s}


def convert_cam_net(sd: Mapping) -> Dict:
    """Reference CAM checkpoint (net/resnet50_cam.py state dict) -> CAMNet
    variables. The checkpoint stores the backbone under ``resnet50.`` and the
    head as ``classifier.weight`` [20, 2048, 1, 1]."""
    backbone = convert_resnet50(sd, prefix="resnet50.")
    params = {
        "resnet50": backbone["params"],
        "classifier": {"kernel": _conv_kernel(sd["classifier.weight"])},
    }
    return {"params": params, "stats": {"resnet50": backbone["stats"]}}


# IRN decoder blocks that are Sequential(conv, GroupNorm) in the
# reference — each ports via _convgn
_IRN_GN = (
    "fc_edge1", "fc_edge2", "fc_edge3", "fc_edge4", "fc_edge5",
    "fc_dp1", "fc_dp2", "fc_dp3", "fc_dp4", "fc_dp5", "fc_dp6",
)


def _convgn(sd: Mapping, prefix: str) -> Dict:
    """torch Sequential(conv, GroupNorm, ...) -> ConvGN params."""
    return {
        "conv": {"kernel": _conv_kernel(sd[prefix + ".0.weight"])},
        "gn": {"scale": _np(sd[prefix + ".1.weight"]),
               "bias": _np(sd[prefix + ".1.bias"])},
    }


def convert_irn_net(sd: Mapping) -> Dict:
    """Reference IRN checkpoint (net/resnet50_irn.py state dict) -> IRNet
    variables. Tolerates the extra ``path_indices*``/``disp_target`` buffers
    the training wrapper registers (ignored, mirroring the reference's
    strict=False load at make_sem_seg_labels.py:59)."""
    backbone = convert_resnet50(sd, prefix="resnet50.")
    params: Dict = {"resnet50": backbone["params"]}
    for name in _IRN_GN:
        params[name] = _convgn(sd, name)
    params["fc_edge6"] = {
        "kernel": _conv_kernel(sd["fc_edge6.weight"]),
        "bias": _np(sd["fc_edge6.bias"]),
    }
    # fc_dp7 = Sequential(conv, GN, ReLU, conv2ch, mean_shift)
    params["fc_dp7a"] = _convgn(sd, "fc_dp7")
    params["fc_dp7b"] = {"kernel": _conv_kernel(sd["fc_dp7.3.weight"])}
    stats = {
        "resnet50": backbone["stats"],
        "dp_mean": _np(sd["mean_shift.running_mean"])
        if "mean_shift.running_mean" in sd
        else np.zeros((2,), np.float32),
    }
    return {"params": params, "stats": stats}


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a ``.pth`` file into a numpy mapping (requires torch)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: _np(v) for k, v in sd.items()}
