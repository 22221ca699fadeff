"""Repeated matrix squaring T -> T^(2^e) — the dominant FLOP cost of the
label-making stages (8 dense squarings of a ~14-18k^2 transition matrix per
image, misc/indexing.py:136-137).

Three paths, selected by ``IRN_TPU_MATPOW`` (measured on v5e-1 with
tools/bench_matpow.py, full 8-squaring chain at 18432^2 bf16 — see the
BASELINE.md round-2 table):

- ``xla`` (default): unrolled ``jnp.dot`` squarings — 180 TFLOPS, 1.7 s
  compile. Unrolling beats a ``fori_loop`` body on BOTH axes (157 TFLOPS,
  11.1 s compile): the loop forces one layout/alias pattern on the carried
  matrix and XLA schedules the unrolled chain better.
- ``pallas``: blocked MXU kernel (:mod:`irn_tpu.ops.matpow_pallas`) —
  172 TFLOPS with best-swept blocks (1024, 1024, 1024); the sweep plateaus
  at ~150-162 TFLOPS across all viable block shapes, so XLA's emitter keeps
  a ~5% edge at production sizes.
- ``fused``: ``pallas`` plus the first squaring fused with the transition
  build (A^beta + column-normalize folded into the operand loads, T never
  materialized in HBM — :func:`matpow_pallas.square_fused_first`); wired in
  :func:`irn_tpu.ops.random_walk.transition_matrix`. 173 TFLOPS — the
  fusion recovers ~1 squaring's worth of HBM traffic but cannot close the
  kernel's MXU gap vs XLA.

``matmul_dtype`` controls operand precision: ``None`` keeps float32 operands
with HIGHEST precision (exact-ish); ``jnp.bfloat16`` casts operands per
squaring and accumulates in float32 (~5x MXU throughput; 99.8%
decoded-label agreement with the f32 path in ablations).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp


def selected_path() -> str:
    """The transition-power implementation to use: 'xla' | 'pallas' |
    'fused'. Pallas kernels are TPU-only; other backends fall back to
    'xla'."""
    v = os.environ.get("IRN_TPU_MATPOW", "xla")
    if v not in ("xla", "pallas", "fused"):
        raise ValueError(f"IRN_TPU_MATPOW={v!r}: want xla|pallas|fused")
    if v != "xla":
        try:
            if jax.default_backend() != "tpu":
                return "xla"
        except Exception:  # pragma: no cover
            return "xla"
    return v


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
    if sharding is None and selected_path() != "xla":
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
    """``exp_times`` unrolled squarings.

    Unrolled on purpose: vs a ``fori_loop`` body this compiles 6x faster
    AND runs 15% faster on v5e (see module docstring) — the loop-carried
    buffer pins XLA to one layout/alias pattern."""
    if sharding is not None:
        t = jax.lax.with_sharding_constraint(t, sharding)
    for _ in range(exp_times):
        t = matmul_square(t, matmul_dtype=matmul_dtype, sharding=sharding)
    return t
