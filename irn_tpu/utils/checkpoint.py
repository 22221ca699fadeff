"""Checkpointing: params + stats + optimizer state + step (orbax).

Upgrades the reference's end-of-training ``torch.save(state_dict)``
(train_cam.py:100, train_irn.py:110) to resumable checkpoints — optimizer
state and step travel with the weights, and stages can restart mid-epoch.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, tree: Any) -> None:
    """Atomic single-file checkpoint (numpy-serialized pytree)."""
    import pickle

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(_to_numpy(tree), f)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Any:
    import pickle

    with open(path, "rb") as f:
        return pickle.load(f)


def save_orbax(path: str, tree: Any) -> None:
    """Orbax checkpoint directory (sharded-friendly, for mesh runs)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), _to_numpy(tree), force=True)


def load_orbax(path: str) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))
