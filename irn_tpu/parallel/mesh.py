"""Device mesh construction and sharding helpers.

The reference's two parallelism mechanisms — nn.DataParallel training and
multiprocessing.spawn inference fan-out (SURVEY 2.7) — both become batch
sharding over a named :class:`jax.sharding.Mesh` here, with gradient
reduction riding ICI collectives inserted by XLA. A second mesh axis
("model") is available for row-sharding the random-walk transition matrix.

Multi-host (DCN) training: after ``jax.distributed.initialize`` (see
pipeline/run.maybe_init_distributed) these helpers span *global* devices —
each process feeds its contiguous rows of the global batch
(:func:`local_batch_slice`) and :func:`shard_batch` assembles the global
batch-sharded array from the process-local rows."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

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


def shard_batch(batch, mesh: Mesh, global_batch: Optional[int] = None):
    """Device-put a pytree of arrays with the leading dim sharded.

    Single-process: a plain sharded ``device_put``. Multi-process (after
    ``jax.distributed.initialize``): ``batch`` holds only this process's
    contiguous rows (see :func:`local_batch_slice`) and the global array of
    leading dim ``global_batch`` is assembled from every process's rows —
    the DCN analogue of the reference's per-process strided Subset split
    (misc/torchutils.py:66-68), except the shards form ONE global batch
    whose gradient all-reduce XLA lowers onto ICI + DCN."""
    s = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, s), batch)

    def put(x):
        x = np.asarray(x)
        gb = global_batch
        if gb is None:
            gb = x.shape[0] * jax.process_count()
        return jax.make_array_from_process_local_data(
            s, x, (gb,) + x.shape[1:]
        )

    return jax.tree.map(put, batch)


def local_batch_slice(mesh: Mesh, global_batch: int) -> Tuple[int, int]:
    """Contiguous [lo, hi) rows of the global batch this process must load.

    Single-process (and any fully-addressable mesh): the whole batch. In
    multi-process mode the batch-sharded global array places contiguous row
    blocks on devices in mesh order, so each process owns one contiguous
    row range; the loaders feed exactly those rows (BatchLoader
    ``local_rows``) and :func:`shard_batch` assembles the global batch."""
    s = batch_sharding(mesh)
    imap = s.addressable_devices_indices_map((global_batch,))
    if not imap:
        raise ValueError(
            f"this process ({jax.process_index()}) holds no devices of the "
            f"{dict(mesh.shape)} mesh — in multi-process mode the batch "
            f"size ({global_batch}) must keep every process's devices in "
            "the data mesh (e.g. a multiple of jax.process_count())"
        )
    spans = sorted(
        (sl[0].start or 0,
         global_batch if sl[0].stop is None else sl[0].stop)
        for sl in imap.values()
    )
    lo, hi = spans[0][0], spans[-1][1]
    covered = sum(b - a for a, b in spans)
    if covered != hi - lo:
        raise ValueError(
            f"non-contiguous local batch rows for this process: {spans} "
            "(mesh device order must place each process's devices "
            "contiguously along the data axis)"
        )
    return lo, hi


def replicate(tree, mesh: Mesh):
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)


def process_barrier(name: str, timeout_s: int = 3600) -> None:
    """Cross-process barrier over the coordination service (gRPC to the
    coordinator) — NOT a device collective, so it works before the first
    gloo/ICI channel exists and tolerates arbitrarily skewed arrival (the
    per-process XLA compile of the train step is minutes; gloo's TCP
    connect window is ~30 s, so processes must enter their first
    collective in lockstep). No-op single-process."""
    if jax.process_count() == 1:
        return
    from jax._src import distributed

    distributed.global_state.client.wait_at_barrier(
        name, timeout_in_ms=timeout_s * 1000
    )


def compile_step(step_fn, *args):
    """AOT-compile a jitted step for these (sharded) example args without
    executing it. Multi-host training compiles BEFORE the process barrier
    so every process enters the first collective together; the returned
    compiled object is used for all steps (a plain ``step_fn(...)`` call
    would not reuse the AOT executable)."""
    return step_fn.lower(*args).compile()


def warm_collectives(mesh: Mesh) -> None:
    """Establish the cross-process collective channel with one tiny
    synchronously-fetched all-reduce over the full mesh.

    The transport's TCP connect window (~30 s for gloo) starts when the
    FIRST rank's execution reaches the collective; a real train step puts
    a long per-process forward/backward in front of its gradient
    all-reduce, so skewed execution (e.g. oversubscribed CPU hosts) can
    miss the window. A scalar psum right after :func:`process_barrier`
    connects the clique while every process is parked; the train step
    then joins an established channel. No-op single-process."""
    if jax.process_count() == 1:
        return
    n_local = len(
        [d for d in mesh.devices.flat if d.process_index == jax.process_index()]
    )
    x = jax.make_array_from_process_local_data(
        batch_sharding(mesh),
        np.ones((n_local,), np.float32),
        (mesh.size,),
    )
    total = float(jax.jit(lambda v: v.sum())(x))
    assert total == float(mesh.size), total


def fetch_replicated(tree):
    """Host copies of a (fully-replicated) train-state pytree.

    Single-process arrays fetch regardless of sharding; in multi-process
    mode only fully-replicated global arrays are host-fetchable, which is
    what the dp-trained state is (params/stats enter every step
    replicated; gradients are all-reduced). Guards with a clear error
    instead of XLA's."""

    def get(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            if not x.is_fully_replicated:
                raise ValueError(
                    f"cannot fetch non-replicated global array "
                    f"{x.shape} {x.sharding}"
                )
        return np.asarray(x)

    return jax.tree.map(get, tree)
