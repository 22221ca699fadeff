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
import os
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


def _banded_square_kernel(a_ref, b_ref, o_ref, acc_ref, *, kb, jb, nb):
    i = pl.program_id(0)
    jr = pl.program_id(1)
    kr = pl.program_id(2)
    j = i + jr - jb
    lo = jnp.maximum(i, j) - kb
    k = lo + kr

    @pl.when(kr == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # k must lie in both operands' bands and the matrix: k >= max(i,j)-kb
    # holds by construction.
    valid = (
        (j >= 0) & (j < nb) & (k >= 0) & (k < nb)
        & (k <= jnp.minimum(i, j) + kb)
    )

    @pl.when(valid)
    def _acc():
        acc_ref[:] += _dot_block(a_ref[:], b_ref[:], None)

    # Store only for in-range j. Edge grid points whose j clamps onto a
    # neighbor's output block skip the store; the block's VMEM residency
    # spans those consecutive visits, so the value the valid visit stored
    # is what gets written back.
    @pl.when((kr == pl.num_programs(2) - 1) & (j >= 0) & (j < nb))
    def _flush():
        o_ref[:] = acc_ref[:]


@functools.partial(
    jax.jit, static_argnames=("h", "matmul_dtype", "bs", "interpret")
)
def square_banded(
    t: jax.Array,
    h: int,
    matmul_dtype: Optional[jnp.dtype] = None,
    bs: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """T @ T for a *banded* T: T[r, q] == 0 whenever |q - r| > h.

    The random-walk transition matrix starts banded (affinity pairs reach
    at most max_doff = dy*W + dx elements off-diagonal) and each squaring
    doubles the band — XLA's dense dot cannot exploit this, a blocked
    kernel trivially does: the grid walks only output blocks within the
    2h band, and contraction blocks k outside [max(i,j)-Kb, min(i,j)+Kb]
    are skipped (their product is exactly zero, so in-band results match a
    dense squaring up to block summation order).

    CONTRACT: only blocks intersecting the 2h output band are written —
    out-of-band content is UNSPECIFIED (the banded consumers
    square_banded/apply_banded* never read it). Falls back to the dense
    kernel when the band covers the matrix."""
    n = t.shape[0]
    assert t.shape == (n, n), t.shape
    if n % bs:
        raise ValueError(f"{n} not divisible by block {bs}")
    nb = n // bs
    kb = -(-h // bs)       # input band, block-level halfwidth
    jb = -(-2 * h // bs)   # output band, block-level halfwidth
    operand = t.astype(matmul_dtype) if matmul_dtype is not None else t
    if 2 * kb + 1 >= nb or 2 * jb + 1 >= nb:
        # band covers the matrix: XLA's dense dot is the best path (and
        # works on every backend)
        return _dot_block(operand, operand, None)

    def jmap(i, jr):
        return jnp.clip(i + jr - jb, 0, nb - 1)

    def kmap(i, jr, kr):
        return jnp.clip(
            jnp.maximum(i, i + jr - jb) - kb + kr, 0, nb - 1
        )

    return pl.pallas_call(
        functools.partial(_banded_square_kernel, kb=kb, jb=jb, nb=nb),
        grid=(nb, 2 * jb + 1, 2 * kb + 1),
        in_specs=[
            pl.BlockSpec((bs, bs), lambda i, jr, kr: (i, kmap(i, jr, kr))),
            pl.BlockSpec(
                (bs, bs), lambda i, jr, kr: (kmap(i, jr, kr), jmap(i, jr))
            ),
        ],
        out_specs=pl.BlockSpec((bs, bs), lambda i, jr, kr: (i, jmap(i, jr))),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bs, bs), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * bs * bs * (2 * jb + 1) * (2 * kb + 1) // 2,
            bytes_accessed=2 * nb * (2 * jb + 1) * (2 * kb + 1) * bs * bs
            * operand.dtype.itemsize // (2 * jb + 1)
            + nb * (2 * jb + 1) * bs * bs * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(operand, operand)


def _banded_apply_kernel(x_ref, t_ref, o_ref, acc_ref, *, kb, nb):
    j = pl.program_id(0)
    kr = pl.program_id(1)
    k = j - kb + kr

    @pl.when(kr == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    valid = (k >= 0) & (k < nb)

    @pl.when(valid)
    def _acc():
        acc_ref[:] += _dot_block(x_ref[:], t_ref[:], None)

    @pl.when(kr == pl.num_programs(1) - 1)
    def _flush():
        o_ref[:] = acc_ref[:]


@functools.partial(
    jax.jit, static_argnames=("h", "matmul_dtype", "bs", "interpret")
)
def apply_banded(
    x: jax.Array,
    t: jax.Array,
    h: int,
    matmul_dtype: Optional[jnp.dtype] = None,
    bs: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """x @ T for a banded T (band halfwidth ``h`` elements): the thin seed
    application only streams the ~(2h/n) in-band fraction of T from HBM.
    ``x``: [C, n] with C a multiple of 8 (pad rows with zeros)."""
    c, n = x.shape
    assert t.shape == (n, n), (x.shape, t.shape)
    if n % bs or c % 8:
        raise ValueError(f"bad shapes x={x.shape} bs={bs}")
    nb = n // bs
    kb = -(-h // bs)
    xo = x.astype(matmul_dtype) if matmul_dtype is not None else x
    to = t.astype(matmul_dtype) if matmul_dtype is not None else t
    if 2 * kb + 1 >= nb:
        # NOTE: only valid when t's out-of-band blocks are true zeros (not
        # square_banded's unspecified fill) — callers fall back to dense
        # matrices entirely in that regime
        return _dot_block(xo, to, None)

    def kmap(j, kr):
        return jnp.clip(j - kb + kr, 0, nb - 1)

    return pl.pallas_call(
        functools.partial(_banded_apply_kernel, kb=kb, nb=nb),
        grid=(nb, 2 * kb + 1),
        in_specs=[
            pl.BlockSpec((c, bs), lambda j, kr: (0, kmap(j, kr))),
            pl.BlockSpec((bs, bs), lambda j, kr: (kmap(j, kr), j)),
        ],
        out_specs=pl.BlockSpec((c, bs), lambda j, kr: (0, j)),
        out_shape=jax.ShapeDtypeStruct((c, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c, bs), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * c * bs * nb * (2 * kb + 1),
            bytes_accessed=nb * (2 * kb + 1) * bs * (bs + c)
            * to.dtype.itemsize + c * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xo, to)


def _banded_apply_chain_kernel(x_ref, t_ref, o_ref, xa, xb, acc, *,
                               kh, nkb, bk, bj, n_apply):
    app = pl.program_id(0)
    j = pl.program_id(1)
    kr = pl.program_id(2)
    k = j * (bj // bk) - kh + kr

    @pl.when(kr == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    valid = (k >= 0) & (k < nkb)

    @pl.when(valid)
    def _acc():
        sl = pl.ds(jnp.clip(k, 0, nkb - 1) * bk, bk)
        # application a reads the buffer application a-1 wrote (xa for even
        # writers, xb for odd); application 0 reads the input
        cur = jnp.where(
            app == 0,
            x_ref[:, sl],
            jnp.where(app % 2 == 1, xa[:, sl], xb[:, sl]),
        )
        acc[:] += _dot_block(cur.astype(t_ref.dtype), t_ref[:], None)

    @pl.when(kr == pl.num_programs(2) - 1)
    def _flush():
        sj = pl.ds(j * bj, bj)
        res = acc[:]

        @pl.when(app % 2 == 0)
        def _wa():
            xa[:, sj] = res.astype(xa.dtype)

        @pl.when(app % 2 == 1)
        def _wb():
            xb[:, sj] = res.astype(xb.dtype)

        @pl.when(app == n_apply - 1)
        def _out():
            o_ref[:, sj] = res


def default_apply_bj(n: int, bs: int) -> int:
    """Default output-column block for :func:`apply_banded_chain`: square
    ``bs``. Wider j-tiles were measured and LOSE on v5e-1 (bj=2048: +4 ms
    on a 43 ms chain at n=14336 — the extra band over-read costs more than
    the 3x grid-step reduction saves; tools/bench_banded.py sweep in
    BASELINE.md). The knob stays for retuning on other hardware."""
    return bs


@functools.partial(
    jax.jit,
    static_argnames=(
        "h", "n_apply", "matmul_dtype", "bs", "bj", "interpret", "impl",
    ),
)
def apply_banded_chain(
    x: jax.Array,
    t: jax.Array,
    h: int,
    n_apply: int,
    matmul_dtype: Optional[jnp.dtype] = None,
    bs: int = 512,
    bj: Optional[int] = None,
    interpret: bool = False,
    impl: Optional[str] = None,
) -> jax.Array:
    """x @ T^n_apply for a banded T (halfwidth ``h``), one kernel launch.

    The seed matrix lives in VMEM for the whole chain (ping-pong scratch
    between applications); only the in-band T tiles stream from HBM —
    2^(E-e) launches and 2^(E-e) x round-trips collapse into one grid.
    ``x``: [C, n], C a multiple of 8.

    Tiles are (bs x bj) — contraction-narrow, output-wide: bj rules the
    HBM read contiguity and the grid-step count while the in-band k range
    is quantized at the finer bs. Out-of-band elements of ``t`` (which
    :func:`square_banded` leaves unspecified) are zeroed during the operand
    downcast, so tiles may straddle the band/garbage boundary freely.

    ``impl`` selects the chain body when the packed-tile regime applies
    (bj == bs, band fits): ``"xla"`` (default) is the windowed einsum
    chain (:func:`_apply_chain_xla`) — 3.1x the Pallas kernel on v5e-1
    because XLA keeps the ~100 MB packed-tile buffer VMEM-resident across
    all applications; ``"pallas"`` keeps the round-2 kernel
    (:func:`_apply_chain_packed`, bit-identical results). Overridable via
    ``IRN_TPU_APPLY=pallas``."""
    c, n = x.shape
    assert t.shape == (n, n), (x.shape, t.shape)
    if bj is None:
        bj = default_apply_bj(n, bs)
    if n % bs or c % 8 or bj % bs or n % bj:
        raise ValueError(f"bad shapes x={x.shape} bs={bs} bj={bj}")
    if n_apply == 1:
        return apply_banded(x, t, h, matmul_dtype, bs, interpret)
    nkb = n // bs
    kh = -(-h // bs)
    bjk = bj // bs
    sdtype = matmul_dtype if matmul_dtype is not None else jnp.float32
    if bjk == 1 and bjk + 2 * kh < nkb:
        if impl is None:
            impl = os.environ.get("IRN_TPU_APPLY", "xla")
            if impl == "diag":
                # 'diag' (the documented default of this env var) selects
                # the e=0 stencil in random_walk.diag_selected; for the
                # e>0 matmul chains it means "default chain", i.e. xla —
                # pinning IRN_TPU_APPLY=diag explicitly must not crash
                # the rw_square_times>0 paths
                impl = "xla"
        if impl == "pallas":
            return _apply_chain_packed(
                x, t, h, n_apply, sdtype, bs, interpret
            )
        if impl != "xla":
            raise ValueError(f"unknown apply impl {impl!r}")
        return _apply_chain_xla(x, t, h, n_apply, sdtype, bs, interpret)
    # Every case reaching here (bjk > 1, or the dense fallback below) can
    # straddle the band/garbage boundary: T^(2^e)'s true band halfwidth is
    # exactly h (banded-matrix products add halfwidths); everything beyond
    # is square_banded's unspecified fill — zero it, fused into the
    # downcast pass (~1.5 ms at n=14336). (bjk == 1 with the band fitting
    # already returned via _apply_chain_packed above, so there is no
    # safe-to-skip-masking case left.)
    assert bjk > 1 or bjk + 2 * kh >= nkb, (bjk, kh, nkb)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    to = jnp.where(jnp.abs(rows - cols) <= h, t, 0.0).astype(sdtype)
    if bjk + 2 * kh >= nkb:
        out = x
        for _ in range(n_apply):
            out = _dot_block(out.astype(sdtype), to, None)
        return out
    xo = x.astype(sdtype)

    def kmap(app, j, kr):
        return jnp.clip(j * bjk - kh + kr, 0, nkb - 1)

    return pl.pallas_call(
        functools.partial(
            _banded_apply_chain_kernel, kh=kh, nkb=nkb, bk=bs, bj=bj,
            n_apply=n_apply,
        ),
        grid=(n_apply, n // bj, bjk + 2 * kh),
        in_specs=[
            pl.BlockSpec((c, n), lambda app, j, kr: (0, 0)),  # VMEM-resident
            pl.BlockSpec((bs, bj), lambda app, j, kr: (kmap(app, j, kr), j)),
        ],
        out_specs=pl.BlockSpec((c, n), lambda app, j, kr: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((c, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((c, n), sdtype),
            pltpu.VMEM((c, n), sdtype),
            pltpu.VMEM((c, bj), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * c * bs * bj * (n // bj) * (bjk + 2 * kh) * n_apply,
            bytes_accessed=n_apply * (n // bj) * (bjk + 2 * kh) * bs * bj
            * jnp.dtype(sdtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xo, to)


def _packed_chain_kernel(x_ref, tp_ref, o_ref, xa, xb, *,
                         kh, bs, n, n_apply):
    a = pl.program_id(0)
    j = pl.program_id(1)
    pad = kh * bs
    span = (2 * kh + 1) * bs

    # scratch pads are uninitialized: zero the halo columns once (the
    # center is fully written by each application's nb steps)
    @pl.when((a == 0) & (j == 0))
    def _zero_pads():
        for buf in (xa, xb):
            buf[:, :pad] = jnp.zeros_like(buf[:, :pad])
            buf[:, pad + n :] = jnp.zeros_like(buf[:, pad + n :])

    sl = pl.ds(j * bs, span)  # [j*bs - pad, j*bs + span - pad) unpadded
    cur = jnp.where(
        a == 0,
        x_ref[:, sl],
        jnp.where(a % 2 == 1, xa[:, sl], xb[:, sl]),
    )
    res = _dot_block(cur.astype(tp_ref.dtype), tp_ref[0], None)

    so = pl.ds(pad + j * bs, bs)

    @pl.when(a % 2 == 0)
    def _wa():
        xa[:, so] = res.astype(xa.dtype)

    @pl.when(a % 2 == 1)
    def _wb():
        xb[:, so] = res.astype(xb.dtype)

    @pl.when(a == n_apply - 1)
    def _out():
        o_ref[:, so] = res


def _apply_chain_packed(x, t, h, n_apply, sdtype, bs, interpret):
    """Packed-tile chain: grid (n_apply, nb), one [span, bs] T tile DMA
    per step (vs 2kh+1 separate block fetches), seed ping-pong in VMEM."""
    c, n = x.shape
    nkb = n // bs
    kh = -(-h // bs)
    pad = kh * bs
    span = (2 * kh + 1) * bs
    tp = pack_banded(t, h, bs, sdtype, interpret=interpret)
    xo = jnp.pad(x.astype(sdtype), ((0, 0), (pad, pad)))
    out = pl.pallas_call(
        functools.partial(
            _packed_chain_kernel, kh=kh, bs=bs, n=n, n_apply=n_apply
        ),
        grid=(n_apply, nkb),
        in_specs=[
            pl.BlockSpec((c, n + 2 * pad), lambda a, j: (0, 0)),
            pl.BlockSpec((1, span, bs), lambda a, j: (j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((c, n + 2 * pad), lambda a, j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((c, n + 2 * pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((c, n + 2 * pad), sdtype),
            pltpu.VMEM((c, n + 2 * pad), sdtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * c * span * bs * nkb * n_apply,
            bytes_accessed=n_apply * nkb * span * bs
            * jnp.dtype(sdtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xo, tp)
    return out[:, pad : pad + n]


def _apply_chain_xla(x, t, h, n_apply, sdtype, bs, interpret):
    """Windowed-einsum application chain over the SAME packed band tiles
    as :func:`_apply_chain_packed` — no Pallas in the chain body.

    Each application pads the seed rows by kh blocks, forms the 2kh+1
    shifted block views with reshape+concat (a relabeling XLA lowers to
    copies, not gathers), and contracts window j against packed tile j in
    one batched einsum. Measured on v5e-1 (n=14336, 128 applications,
    bf16): 7.3 ms/img vs 22.8 ms for the Pallas chain — an *effective*
    1.8 TB/s against the tile footprint, i.e. past HBM rate, because the
    ~103 MB packed-tile buffer fits VMEM and XLA's scheduler keeps it
    resident across the unrolled applications while the Pallas grid
    re-streams it from HBM every step. Bit-identical to the Pallas chain
    (f32 accumulate, same f32->sdtype carry rounding; parity asserted in
    tests/test_matpow.py)."""
    c, n = x.shape
    nkb = n // bs
    kh = -(-h // bs)
    pad = kh * bs
    tp = pack_banded(t, h, bs, sdtype, interpret=interpret)
    out = x
    for _ in range(n_apply):
        xpad = jnp.pad(out.astype(sdtype), ((0, 0), (pad, pad)))
        blk = xpad.reshape(c, nkb + 2 * kh, bs)
        wins = jnp.concatenate(
            [blk[:, i:i + nkb] for i in range(2 * kh + 1)], axis=-1
        )  # [c, nkb, span]: window j = xpad[:, j*bs : j*bs + span]
        res = jnp.einsum(
            "cjs,jsb->jcb", wins, tp, preferred_element_type=jnp.float32
        )
        out = res.transpose(1, 0, 2).reshape(c, n)
    return out


def _packed_chain_batch_kernel(x_ref, tp_ref, o_ref, xa, xb, *,
                               kh, bs, n, n_apply, c):
    a = pl.program_id(0)
    j = pl.program_id(1)
    pad = kh * bs
    span = (2 * kh + 1) * bs
    nimg = tp_ref.shape[0]

    @pl.when((a == 0) & (j == 0))
    def _zero_pads():
        for buf in (xa, xb):
            buf[:, :pad] = jnp.zeros_like(buf[:, :pad])
            buf[:, pad + n :] = jnp.zeros_like(buf[:, pad + n :])

    sl = pl.ds(j * bs, span)
    so = pl.ds(pad + j * bs, bs)
    for b in range(nimg):  # static unroll: B dots per tile DMA
        rows = pl.ds(b * c, c)
        cur = jnp.where(
            a == 0,
            x_ref[rows, sl],
            jnp.where(a % 2 == 1, xa[rows, sl], xb[rows, sl]),
        )
        res = _dot_block(cur.astype(tp_ref.dtype), tp_ref[b, 0], None)

        @pl.when(a % 2 == 0)
        def _wa(res=res, rows=rows):
            xa[rows, so] = res.astype(xa.dtype)

        @pl.when(a % 2 == 1)
        def _wb(res=res, rows=rows):
            xb[rows, so] = res.astype(xb.dtype)

        @pl.when(a == n_apply - 1)
        def _out(res=res, rows=rows):
            o_ref[rows, so] = res


@functools.partial(
    jax.jit,
    static_argnames=("h", "n_apply", "matmul_dtype", "bs", "interpret"),
)
def apply_banded_chain_batched(
    xs: jax.Array,
    ts: jax.Array,
    h: int,
    n_apply: int,
    matmul_dtype: Optional[jnp.dtype] = None,
    bs: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """All B images' thin-application chains in ONE kernel launch.

    ``xs``: [B, C, n] seed matrices (C a multiple of 8); ``ts``: [B, n, n]
    banded transitions sharing (n, h) — the per-image T^(2^e) of a shared
    shape bucket. Each grid step DMAs one [B, span, bs] stack of packed
    band tiles and runs B small dots against it, amortizing the per-step
    fixed cost that leaves the single-image chain at ~46% of HBM peak
    (BASELINE.md round-2 postscript; the dots are [C, span] x [span, bs] —
    compute-tiny, step-overhead bound). Returns [B, C, n] f32.
    """
    bimg, c, n = xs.shape
    assert ts.shape == (bimg, n, n), (xs.shape, ts.shape)
    if n % bs or c % 8:
        raise ValueError(f"bad shapes xs={xs.shape} bs={bs}")
    nkb = n // bs
    kh = -(-h // bs)
    if 1 + 2 * kh >= nkb:
        raise ValueError(f"band 2*{h} does not fit n={n} (bs={bs})")
    pad = kh * bs
    span = (2 * kh + 1) * bs
    sdtype = matmul_dtype if matmul_dtype is not None else jnp.float32
    tp = jnp.stack([
        pack_banded(ts[b], h, bs, sdtype, interpret=interpret)
        for b in range(bimg)
    ])  # [B, nb, span, bs]
    xo = jnp.pad(xs.astype(sdtype), ((0, 0), (0, 0), (pad, pad)))
    xo = xo.reshape(bimg * c, n + 2 * pad)
    out = pl.pallas_call(
        functools.partial(
            _packed_chain_batch_kernel, kh=kh, bs=bs, n=n, n_apply=n_apply,
            c=c,
        ),
        grid=(n_apply, nkb),
        in_specs=[
            pl.BlockSpec((bimg * c, n + 2 * pad), lambda a, j: (0, 0)),
            pl.BlockSpec((bimg, 1, span, bs), lambda a, j: (0, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bimg * c, n + 2 * pad), lambda a, j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((bimg * c, n + 2 * pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bimg * c, n + 2 * pad), sdtype),
            pltpu.VMEM((bimg * c, n + 2 * pad), sdtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bimg * c * span * bs * nkb * n_apply,
            bytes_accessed=n_apply * nkb * bimg * span * bs
            * jnp.dtype(sdtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xo, tp)
    out = out.reshape(bimg, c, n + 2 * pad)
    return out[:, :, pad : pad + n]


def _pack_kernel(t_ref, o_ref, *, kh, nb):
    j = pl.program_id(0)
    mr = pl.program_id(1)
    src = j + mr - kh
    valid = (src >= 0) & (src < nb)
    o_ref[0] = jnp.where(valid, t_ref[:], 0.0).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("h", "bs", "matmul_dtype", "interpret")
)
def pack_banded(
    t: jax.Array, h: int, bs: int = 512, matmul_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """[nb, (2kh+1)*bs, bs] band tiles: tile j holds T's rows
    [j*bs - kh*bs, j*bs + (kh+1)*bs) of column block j (zero rows beyond
    the matrix edge). The per-column in-band row span is contiguous, so
    the whole span becomes ONE BlockSpec tile per grid step for
    :func:`apply_banded_chain` — one DMA where the unpacked layout needed
    2kh+1 — and the packed buffer holds only the in-band fraction of T.

    Implemented as a Pallas block-copy kernel (grid step (j, m) copies T's
    (j+m-kh, j) block into tile j's m-th slot): pure streaming DMA over
    the in-band data. Both XLA formulations tried (vmap'd dynamic_slice,
    block diagonals) lower to a gather that measured 32 ms at n=14336 on
    v5e — more than the whole application chain."""
    n = t.shape[0]
    kh = -(-h // bs)
    nb = n // bs
    if matmul_dtype is not None:
        t = t.astype(matmul_dtype)
    out = pl.pallas_call(
        functools.partial(_pack_kernel, kh=kh, nb=nb),
        grid=(nb, 2 * kh + 1),
        in_specs=[
            pl.BlockSpec(
                (bs, bs),
                lambda j, mr: (jnp.clip(j + mr - kh, 0, nb - 1), j),
            )
        ],
        out_specs=pl.BlockSpec((1, bs, bs), lambda j, mr: (j, mr, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (nb, (2 * kh + 1) * bs, bs), t.dtype
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=2 * nb * (2 * kh + 1) * bs * bs
            * t.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(t)
    return out


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
