"""Device mesh construction and sharding helpers.

The reference's two parallelism mechanisms — nn.DataParallel training and
multiprocessing.spawn inference fan-out (SURVEY 2.7) — both become batch
sharding over a named :class:`jax.sharding.Mesh` here, with gradient
reduction riding ICI collectives inserted by XLA. A second mesh axis
("model") is available for row-sharding the random-walk transition matrix.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """1-D data mesh by default; (data, model) when n_model > 1."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    if n_model == 1:
        return Mesh(devs.reshape(-1), (DATA_AXIS,))
    return Mesh(devs, (DATA_AXIS, MODEL_AXIS))


def mesh_for_batch(batch_size: int, n_requested: Optional[int] = None) -> Mesh:
    """Largest data mesh (<= requested devices) that divides the batch."""
    n_avail = n_requested or len(jax.devices())
    n = max(d for d in range(1, n_avail + 1) if batch_size % d == 0)
    return make_mesh(n)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of arrays with the leading dim sharded."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(tree, mesh: Mesh):
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)
