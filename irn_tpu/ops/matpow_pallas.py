"""Pallas TPU kernel: blocked dense matrix squaring with fp32 accumulation.

Computes ``T @ T`` for the random-walk transition matrix (N multiple of 512,
N ~ 18k). Classic MXU tiling: the grid walks (i, j, k) output blocks with k
innermost; operand blocks stream HBM -> VMEM (Pallas double-buffers block
fetches automatically), partial products accumulate in a VMEM fp32 scratch,
and the output block is written once on the last k step.

``matmul_dtype=jnp.bfloat16`` feeds bf16 operand blocks to the MXU (fp32
accumulation) for ~2x throughput; ``None`` keeps f32 operands.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BM = 1024  # best measured on v5e: (1024, 512, 512) -> 120 TFLOPS bf16
_BN = 512
_BK = 512


def _square_kernel(a_ref, b_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        a_ref[:], b_ref[:], preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _flush():
        o_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("matmul_dtype",))
def square_pallas(t: jax.Array, matmul_dtype: Optional[jnp.dtype] = None) -> jax.Array:
    n = t.shape[0]
    assert t.shape == (n, n), t.shape
    bm, bn, bk = min(_BM, n), min(_BN, n), min(_BK, n)
    if n % bm or n % bn or n % bk:
        raise ValueError(f"matrix size {n} must be a multiple of {bm}")
    operand = t.astype(matmul_dtype) if matmul_dtype is not None else t

    flops = 2 * n * n * n
    bytes_per = operand.dtype.itemsize
    out = pl.pallas_call(
        _square_kernel,
        grid=(n // bm, n // bn, n // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * n * n * bytes_per + n * n * 4,
            transcendentals=0,
        ),
    )(operand, operand)
    return out
