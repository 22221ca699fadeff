"""Pallas TPU kernels: blocked dense matrix squaring with fp32 accumulation.

Computes ``T @ T`` for the random-walk transition matrix (N multiple of 512,
N ~ 14-18k). Classic MXU tiling: the grid walks (i, j, k) output blocks with
k innermost; operand blocks stream HBM -> VMEM (Pallas double-buffers block
fetches automatically), partial products accumulate in a VMEM fp32 scratch,
and the output block is written once on the last k step.

Two kernels:

- :func:`square_pallas` — plain T @ T (one squaring).
- :func:`square_fused_first` — the *first* squaring of the transition-power
  chain with the elementwise prologue folded into the operand loads:
  A -> T^2 directly, where T = A^beta column-normalized
  (misc/indexing.py:132-137). Uses T@T = B @ (D B D) with B = A^beta and
  D = diag(1/colsum(B)): the left operand block is pow'd on load, the right
  operand block is pow'd and scaled by inv_colsum on both its rows (the
  contraction index k) and columns (j). T is never materialized in HBM.

``matmul_dtype=jnp.bfloat16`` feeds bf16 operand blocks to the MXU (fp32
accumulation) for ~2x throughput; ``None`` keeps f32 operands. Block sizes
are parameters so tools/bench_matpow.py can sweep them; defaults are the
best v5e-1 measurements (see BASELINE.md round-2 table).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# best measured on v5e-1 (tools/bench_matpow.py --sweep: 161 TFLOPS bf16;
# the sweep plateaus at ~150-162 across all viable block shapes)
_DEFAULT_BLOCKS = (1024, 1024, 1024)


def _pow_int(x: jax.Array, e: int) -> jax.Array:
    """x**e by binary exponentiation (static integer e >= 1)."""
    acc = None
    base = x
    while e:
        if e & 1:
            acc = base if acc is None else acc * base
        e >>= 1
        if e:
            base = base * base
    return acc


def _dot_block(a, b, matmul_dtype):
    if matmul_dtype is not None:
        a = a.astype(matmul_dtype)
        b = b.astype(matmul_dtype)
    if a.dtype == jnp.float32:
        # f32 operands: HIGHEST = 6-pass bf16 decomposition on the MXU,
        # matching the XLA f32 path's accuracy (the default would silently
        # round to bf16). Mosaic rejects the flag for bf16 operands.
        return jnp.dot(
            a, b, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _square_kernel(a_ref, b_ref, o_ref, acc_ref, *, matmul_dtype):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += _dot_block(a_ref[:], b_ref[:], matmul_dtype)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _flush():
        o_ref[:] = acc_ref[:]


def _grid_spec(n, bm, bn, bk, extra_in=()):
    return dict(
        grid=(n // bm, n // bn, n // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            *extra_in,
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # default scoped-vmem limit is 16 MiB; large blocks (less HBM
            # re-streaming) need most of the chip's 128 MiB VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )


def _check_blocks(n: int, blocks: Tuple[int, int, int]):
    bm, bn, bk = (min(b, n) for b in blocks)
    if n % bm or n % bn or n % bk:
        raise ValueError(f"matrix size {n} not divisible by blocks {blocks}")
    return bm, bn, bk


@functools.partial(
    jax.jit, static_argnames=("matmul_dtype", "blocks")
)
def square_pallas(
    t: jax.Array,
    matmul_dtype: Optional[jnp.dtype] = None,
    blocks: Tuple[int, int, int] = _DEFAULT_BLOCKS,
) -> jax.Array:
    """One plain squaring T @ T."""
    n = t.shape[0]
    assert t.shape == (n, n), t.shape
    bm, bn, bk = _check_blocks(n, blocks)
    operand = t.astype(matmul_dtype) if matmul_dtype is not None else t

    spec = _grid_spec(n, bm, bn, bk)
    flops = 2 * n * n * n
    bytes_per = operand.dtype.itemsize
    return pl.pallas_call(
        functools.partial(
            _square_kernel,
            # operands pre-cast outside: the kernel dot runs them as-is
            matmul_dtype=None,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * n * n * bytes_per + n * n * 4,
            transcendentals=0,
        ),
        **spec,
    )(operand, operand)


def _fused_kernel(a_ref, b_ref, invk_ref, invj_ref, o_ref, acc_ref, *,
                  beta, matmul_dtype):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    left = _pow_int(a_ref[:], beta)
    right = _pow_int(b_ref[:], beta)
    right = right * invk_ref[:].reshape(-1, 1) * invj_ref[:].reshape(1, -1)
    acc_ref[:] += _dot_block(left, right, matmul_dtype)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _flush():
        o_ref[:] = acc_ref[:]


@functools.partial(
    jax.jit, static_argnames=("beta", "matmul_dtype", "blocks")
)
def square_fused_first(
    a: jax.Array,
    beta: int = 10,
    matmul_dtype: Optional[jnp.dtype] = None,
    blocks: Tuple[int, int, int] = _DEFAULT_BLOCKS,
) -> jax.Array:
    """A -> T^2 in one kernel: T = A^beta / colsum(A^beta), never stored.

    ``matmul_dtype`` casts the *normalized* operand blocks (numerically the
    same place the unfused path casts T)."""
    n = a.shape[0]
    assert a.shape == (n, n), a.shape
    bm, bn, bk = _check_blocks(n, blocks)

    colsum = jnp.sum(_pow_int(a, beta), axis=0)  # one cheap XLA pass
    inv = (1.0 / colsum).astype(jnp.float32).reshape(1, n)

    extra = (
        pl.BlockSpec((1, bk), lambda i, j, k: (0, k)),  # inv_colsum rows (k)
        pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),  # inv_colsum cols (j)
    )
    spec = _grid_spec(n, bm, bn, bk, extra_in=extra)
    return pl.pallas_call(
        functools.partial(
            _fused_kernel, beta=beta, matmul_dtype=matmul_dtype
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * n * n,
            bytes_accessed=2 * n * n * a.dtype.itemsize + n * n * 4,
            transcendentals=0,
        ),
        **spec,
    )(a, a, inv, inv)
