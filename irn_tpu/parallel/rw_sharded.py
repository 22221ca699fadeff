"""Mesh-sharded random-walk transition power — the framework's
"long-context" scaling capability.

The dense (HW)^2 transition matrix is the object whose memory/compute scale
quadratically with pixel count (the attention analogue of this workload).
The reference caps it at one GPU's memory; here T is block-row sharded over
the mesh's model axis and each squaring T @ T runs as an XLA collective
matmul (the partitioner all-gathers the right operand over ICI per block),
so grids beyond a single chip's HBM split across the slice.

The Pallas kernel is single-chip; sharded squarings use jnp.dot so the SPMD
partitioner owns the schedule.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from irn_tpu.parallel.mesh import MODEL_AXIS


def row_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(MODEL_AXIS, None))


def sharded_matrix_power(
    t: jax.Array,
    exp_times: int,
    mesh: Mesh,
    matmul_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """T^(2^e) with T block-row sharded over the model axis."""
    s = row_sharding(mesh)
    t = jax.device_put(t, s)

    @functools.partial(jax.jit, out_shardings=s)
    def power(t):
        def body(_, x):
            if matmul_dtype is not None:
                xb = x.astype(matmul_dtype)
                return jnp.dot(xb, xb, preferred_element_type=jnp.float32)
            return jnp.dot(x, x, precision=jax.lax.Precision.HIGHEST)

        return jax.lax.fori_loop(0, exp_times, body, t)

    return power(t)


def sharded_propagate_rows(
    seeds: jax.Array, t: jax.Array, mesh: Mesh
) -> jax.Array:
    """x @ T with T row-sharded: each device contracts its row block and the
    partial products psum over the model axis."""
    s = row_sharding(mesh)
    t = jax.device_put(t, s)
    seeds = jax.device_put(seeds, NamedSharding(mesh, P(None, MODEL_AXIS)))

    @functools.partial(jax.jit, out_shardings=NamedSharding(mesh, P()))
    def run(seeds, t):
        return jnp.dot(seeds, t, precision=jax.lax.Precision.HIGHEST)

    return run(seeds, t)
