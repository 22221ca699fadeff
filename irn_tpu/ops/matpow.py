"""Repeated matrix squaring T -> T^(2^e) — the dominant FLOP cost of the
label-making stages (8 dense squarings of a ~16k^2 transition matrix per
image, misc/indexing.py:136-137).

Two paths:

- XLA ``jnp.dot`` — the default everywhere. Measured on v5e: 308 TFLOPS
  for the bf16 18432^2 squaring; XLA's matmul emitter out-schedules a
  hand-written 3-loop kernel here.
- A Pallas blocked MXU kernel (:mod:`irn_tpu.ops.matpow_pallas`), kept as
  an explicitly-selectable path (``IRN_TPU_MATPOW=pallas``) and as the base
  for future fused variants; best measured block config (1024, 512, 512)
  reaches 120 TFLOPS.

``matmul_dtype`` controls operand precision: ``None`` keeps float32 operands
with HIGHEST precision (exact-ish); ``jnp.bfloat16`` casts operands per
squaring and accumulates in float32 (~3x MXU throughput; 99.8%
decoded-label agreement with the f32 path in ablations).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp


def _use_pallas() -> bool:
    if os.environ.get("IRN_TPU_MATPOW") != "pallas":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def matmul_square(
    t: jax.Array,
    matmul_dtype: Optional[jnp.dtype] = None,
    sharding=None,
) -> jax.Array:
    """One squaring T @ T with the configured operand precision.

    With ``sharding`` (a block-row NamedSharding over the mesh's model
    axis) the product is constrained so the SPMD partitioner keeps T
    row-distributed across every squaring: each device contracts its row
    block against an all-gathered right operand (full-k dot per output
    element, so results are bit-identical to the single-device order) and
    the Pallas single-chip kernel is bypassed."""
    if sharding is None and _use_pallas():
        from irn_tpu.ops.matpow_pallas import square_pallas

        return square_pallas(t, matmul_dtype=matmul_dtype)
    if matmul_dtype is not None:
        tb = t.astype(matmul_dtype)
        out = jnp.dot(tb, tb, preferred_element_type=jnp.float32)
    else:
        out = jnp.dot(t, t, precision=jax.lax.Precision.HIGHEST)
    if sharding is not None:
        out = jax.lax.with_sharding_constraint(out, sharding)
    return out


def matrix_power_squarings(
    t: jax.Array,
    exp_times: int,
    matmul_dtype: Optional[jnp.dtype] = None,
    sharding=None,
) -> jax.Array:
    if sharding is not None:
        t = jax.lax.with_sharding_constraint(t, sharding)
    if exp_times <= 0:
        return t
    if exp_times == 1:
        return matmul_square(t, matmul_dtype=matmul_dtype, sharding=sharding)
    # fori_loop keeps ONE squaring body in the program instead of e unrolled
    # copies — compile time of the fused label-propagation program drops by
    # an order of magnitude at identical steady-state throughput.
    return jax.lax.fori_loop(
        0,
        exp_times,
        lambda _, x: matmul_square(x, matmul_dtype=matmul_dtype,
                                   sharding=sharding),
        t,
    )
