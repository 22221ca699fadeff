"""Shared pipeline-stage plumbing: model init, checkpoint IO, bucketing."""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np

from irn_tpu.pipeline.config import Config
from irn_tpu.utils import checkpoint as ckpt
from irn_tpu.utils import weights as W


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def load_backbone_variables(cfg: Config) -> Optional[Dict]:
    """Pretrained ResNet-50 variables from cfg.pretrained_backbone.

    Accepts a torch ``.pth`` state dict (ported on the fly) or an ``.npz``
    /pickle of already-converted variables. Returns None when unset."""
    path = cfg.pretrained_backbone
    if not path:
        return None
    if path.endswith(".pth"):
        sd = W.load_torch_state_dict(path)
        return W.convert_resnet50(sd)
    return ckpt.load_checkpoint(path)


def init_model_variables(model, cfg: Config, example: np.ndarray,
                         backbone_key: str = "resnet50", **init_kw) -> Dict:
    """He-init the model, then graft pretrained backbone variables in."""
    variables = model.init(jax.random.PRNGKey(0), example, **init_kw)
    variables = jax.tree.map(np.asarray, variables)  # host, mutable copies
    pretrained = load_backbone_variables(cfg)
    if pretrained is not None:
        variables["params"][backbone_key] = pretrained["params"]
        variables["stats"][backbone_key] = pretrained["stats"]
    else:
        print(
            "WARNING: no pretrained_backbone configured - the backbone is "
            "randomly initialized; pseudo-label quality will not match the "
            "reference (which always starts from ImageNet weights, "
            "net/resnet50.py:115)."
        )
    return variables


def host_shard_range(n: int):
    """Strided shard of range(n) over JAX processes — multi-host DCN fan-out
    for the per-image make stages (replaces the reference's
    multiprocessing.spawn + split_dataset, SURVEY 2.7)."""
    import jax

    return range(jax.process_index(), n, jax.process_count())


class DeviceSpreader:
    """Round-robin committed placement of per-image inference programs over
    the local devices — the single-process replacement for the reference's
    one-process-per-GPU spawn fan-out (step/make_cam.py:71-74): jit runs a
    program wherever its committed inputs live, so image i's work lands on
    device i % n and all chips stay busy from one Python process.

    ``n_devices=1`` (or a 1-device platform) degenerates to the plain
    single-device path. ``assigned`` counts dispatches per device so tests
    can assert every device received work."""

    def __init__(self, n_devices: int = 0):
        import jax

        devs = jax.local_devices()
        if n_devices:
            devs = devs[:n_devices]
        self.devices = list(devs)
        # Counter.update is a C-level atomic per call — make_ins_seg calls
        # the spreader from ThreadPoolExecutor workers, where a plain
        # dict += would lose increments
        from collections import Counter

        self.assigned = Counter({d: 0 for d in self.devices})

    def __len__(self) -> int:
        return len(self.devices)

    def __call__(self, i: int):
        d = self.devices[i % len(self.devices)]
        self.assigned.update([d])  # atomic, unlike dict read-modify-write
        return d


def outputs_exist(out_dir: str, names, suffix: str) -> bool:
    return all(os.path.exists(os.path.join(out_dir, n + suffix)) for n in names)


def pad_pair_to(img_pair: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Zero-pad a [2, H, W, 3] (orig, flip) stack bottom/right to (ph, pw)."""
    _, h, w, _ = img_pair.shape
    return np.pad(img_pair, ((0, 0), (0, ph - h), (0, pw - w), (0, 0)))
