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
    """T^(2^e) with T block-row sharded over the model axis (dense
    collective-matmul fallback; the banded halo-exchange path below is
    the production mesh route)."""
    s = row_sharding(mesh)
    t = jax.device_put(t, s)

    @functools.partial(jax.jit, out_shardings=s)
    def power(t):
        # unrolled on purpose, like ops/matpow.matrix_power_squarings: a
        # fori_loop body compiles slower AND runs slower on TPU (the
        # loop-carried buffer pins XLA to one layout/alias pattern)
        for _ in range(exp_times):
            t = jax.lax.with_sharding_constraint(_dot(t, t, matmul_dtype), s)
        return t

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


# ---------------------------------------------------------------------------
# Banded sharded path: halo exchange instead of all-gather
# ---------------------------------------------------------------------------
#
# The transition matrix is BANDED (halfwidth h = max dy*W + dx, doubling per
# squaring — see ops/matpow_pallas). Row-sharded, device d's output rows
# only contract k in [r - h, r + h]: it needs just ceil(h / n_loc) neighbor
# row blocks each way (lax.ppermute over ICI), not the partitioner's full
# all-gather — comms O(h*n) instead of O(n^2) per squaring, and the local
# dot shrinks to [n_loc, n_loc + 2h] @ [n_loc + 2h, n]. Because full output
# rows are computed, out-of-band entries stay EXACT zeros (every skipped
# contraction term is a true 0.0 product), so in-band results are
# bit-identical to the dense single-device squaring and the applications
# may read T unmasked.


def _dot(a, b, matmul_dtype):
    """Matmul in ``matmul_dtype`` (or the operand dtype if ``None``) with
    f32 accumulation AND an f32 result: low-precision operands — including
    ones the caller pre-cast for ICI-byte savings — never round the output
    back down, so carries between squarings/applications stay f32 like the
    single-device kernels (`matmul_square`/`square_banded` use
    preferred_element_type=f32 the same way)."""
    if matmul_dtype is not None:
        a = a.astype(matmul_dtype)
        b = b.astype(matmul_dtype)
    if a.dtype in (jnp.bfloat16, jnp.float16):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)
    return jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST)


def _halo_rows(t_loc: jax.Array, h: int, n_dev: int) -> jax.Array:
    """[h + n_loc + h, n] context rows around this device's block: up to
    ceil(h / n_loc) ppermute hops each way, each shipping ONLY the rows
    the band needs (hop k contributes min(n_loc, h - (k-1)*n_loc) rows, so
    total ICI traffic is exactly h rows per direction — O(h*n) bytes, not
    hops full blocks). Rows beyond the matrix edge come back as ppermute's
    zero fill — exactly the zeros a banded matrix holds there."""
    n_loc = t_loc.shape[0]
    hops = -(-h // n_loc)
    above, below = [], []
    for k in range(1, hops + 1):
        rk = min(n_loc, h - (k - 1) * n_loc)
        # top halo takes block d-k's BOTTOM rk rows; bottom halo takes
        # block d+k's TOP rk rows (every sender slices the same region —
        # SPMD-uniform shapes)
        from_above = jax.lax.ppermute(
            t_loc[n_loc - rk :, :], MODEL_AXIS,
            [(i, i + k) for i in range(n_dev - k)],
        )
        from_below = jax.lax.ppermute(
            t_loc[:rk, :], MODEL_AXIS,
            [(i, i - k) for i in range(k, n_dev)],
        )
        above.append(from_above)
        below.append(from_below)
    top = jnp.concatenate(above[::-1], axis=0)  # farthest hop first
    bot = jnp.concatenate(below, axis=0)
    return jnp.concatenate([top, t_loc, bot], axis=0)


def assemble_rows_in_jit(
    vs: jax.Array, doffs, n: int, mesh: Mesh
) -> jax.Array:
    """Row-sharded dense affinity assembled per device from the tiny
    [n_pairs, n] band-value table — the full matrix is NEVER materialized
    on any single device.

    Uses the same (n, n+1)-flat trick as the replicated
    :func:`irn_tpu.ops.random_walk.dense_affinity`: in a row-major
    (n, n+1) buffer H, upper band d lives at H[i, d] and lower band d at
    H[i-1, n+1-d], and A.flat == H.flat[:n*n]. Device d's A rows
    [r0*n, r1*n) start exactly r0 < n+1 elements before its own H rows'
    flat span — so ONE ppermute of the previous device's last H row
    closes the misalignment. Traceable inside an outer jit; call inside
    the same shard_map-using program as the squarings."""
    n_dev = mesh.shape[MODEL_AXIS]
    assert n % n_dev == 0, (n, n_dev)
    n_loc = n // n_dev

    def body(vs_loc):
        idx = jax.lax.axis_index(MODEL_AXIS)
        r0 = idx * n_loc
        h_loc = jnp.zeros((n_loc, n + 1), jnp.float32)
        h_loc = h_loc.at[:, 0].set(1.0)  # unit diagonal
        for k, doff in enumerate(doffs):
            vk = vs_loc[k]
            up = jax.lax.dynamic_slice(vk, (r0,), (n_loc,))
            h_loc = h_loc.at[:, doff].set(up)
            low = jax.lax.dynamic_slice(
                jnp.pad(vk, (doff - 1, 0))[:n], (r0,), (n_loc,)
            )
            h_loc = h_loc.at[:, n + 1 - doff].set(low)
        prev_last = jax.lax.ppermute(
            h_loc[-1:], MODEL_AXIS, [(i, i + 1) for i in range(n_dev - 1)]
        )
        f_ext = jnp.concatenate([prev_last.reshape(-1), h_loc.reshape(-1)])
        a_flat = jax.lax.dynamic_slice(
            f_ext, ((n + 1 - r0).astype(jnp.int32),), (n_loc * n,)
        )
        return a_flat.reshape(n_loc, n)

    fn = jax.shard_map(
        body, mesh=mesh, in_specs=P(), out_specs=P(MODEL_AXIS, None)
    )
    return fn(jax.lax.with_sharding_constraint(
        vs, NamedSharding(mesh, P())
    ))


def normalize_rows_in_jit(
    a: jax.Array, beta: int, mesh: Mesh
) -> jax.Array:
    """A^beta column-normalized with A row-sharded (column sums psum over
    the model axis); result stays row-sharded."""

    def body(a_loc):
        scaled = a_loc**beta
        col = jax.lax.psum(jnp.sum(scaled, axis=0), MODEL_AXIS)
        return scaled / col[None, :]

    fn = jax.shard_map(
        body, mesh=mesh, in_specs=P(MODEL_AXIS, None),
        out_specs=P(MODEL_AXIS, None),
    )
    return fn(a)


def banded_power_in_jit(
    t: jax.Array,
    exp_times: int,
    h: int,
    mesh: Mesh,
    matmul_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """T^(2^exp_times) for a banded T (halfwidth ``h``), block-row sharded;
    returns the result STILL row-sharded (replicating a beyond-HBM matrix
    would defeat the point — propagate with :func:`banded_apply_in_jit`).
    Traceable inside an outer ``jit``."""
    n = t.shape[0]
    n_dev = mesh.shape[MODEL_AXIS]
    assert n % n_dev == 0, (n, n_dev)
    n_loc = n // n_dev

    def body(t_loc):
        idx = jax.lax.axis_index(MODEL_AXIS)
        hh = h
        for _ in range(exp_times):
            # cast once per squaring BEFORE the halo exchange: ICI ships
            # matmul-width operands (half the bytes for bf16)
            tb = (
                t_loc.astype(matmul_dtype)
                if matmul_dtype is not None else t_loc
            )
            ctx = _halo_rows(tb, hh, n_dev)
            # this block's columns [r0 - hh, r0 + n_loc + hh), zero-padded
            # at the matrix edges to stay aligned with ctx's rows
            padded = jnp.pad(tb, ((0, 0), (hh, hh)))
            cols = jax.lax.dynamic_slice(
                padded, (jnp.int32(0), idx * n_loc),
                (n_loc, n_loc + 2 * hh),
            )
            t_loc = _dot(cols, ctx, None)
            hh *= 2
        return t_loc

    fn = jax.shard_map(
        body, mesh=mesh, in_specs=P(MODEL_AXIS, None),
        out_specs=P(MODEL_AXIS, None),
    )
    return fn(jax.lax.with_sharding_constraint(t, row_sharding(mesh)))


def banded_apply_in_jit(
    seeds: jax.Array,
    t: jax.Array,
    n_apply: int,
    mesh: Mesh,
    matmul_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """x @ T^n_apply with T row-sharded: each application contracts the
    local seed columns against the local row block and psums the partials
    over the model axis (comms per application: one [C, n] reduction).
    Traceable inside an outer ``jit``; ``t`` must be row-sharded (as
    :func:`banded_power_in_jit` returns)."""
    n = t.shape[0]
    n_dev = mesh.shape[MODEL_AXIS]
    n_loc = n // n_dev
    c = seeds.shape[0]

    def body(x, t_loc):
        idx = jax.lax.axis_index(MODEL_AXIS)
        tb = (
            t_loc.astype(matmul_dtype)
            if matmul_dtype is not None else t_loc
        )  # cast the reused block once, not per application
        for _ in range(n_apply):
            xl = jax.lax.dynamic_slice(x, (jnp.int32(0), idx * n_loc),
                                       (c, n_loc))
            if matmul_dtype is not None:
                xl = xl.astype(matmul_dtype)
            x = jax.lax.psum(_dot(xl, tb, None), MODEL_AXIS)
        return x

    fn = jax.shard_map(
        body, mesh=mesh, in_specs=(P(), P(MODEL_AXIS, None)),
        out_specs=P(),
    )
    return fn(jax.lax.with_sharding_constraint(
        seeds, NamedSharding(mesh, P())
    ), t)


def diag_apply_in_jit(
    seeds: jax.Array,
    w: jax.Array,
    inv: jax.Array,
    doffs,
    n_apply: int,
    mesh: Mesh,
) -> jax.Array:
    """x @ T^n_apply with T in DIAGONAL form, column-sharded — the mesh
    analogue of :func:`irn_tpu.ops.random_walk.apply_diag_chain` (the e=0
    production default): each application exchanges only the H-column
    halos with the two neighbors (H = max(doffs), ~107 KB f32 at the
    production bucket) and runs the 2*n_pairs+1 shifted fused
    multiply-adds on the local columns. Per-application ICI traffic is
    two [C, H] ppermutes vs the matmul route's [C, n] psum (~13x less),
    and everything stays f32 — the sharded chain matches the
    single-device stencil exactly (same adds, same order, locally).

    ``seeds`` [C, n] (column-sharded or replicated — shard_map reshards);
    ``w`` [n_pairs, n] / ``inv`` [n] replicated (the diagonal operator is
    a few MB; only the n^2 matrix is worth sharding). Returns [C, n]
    column-sharded (downstream decode ops consume the global view; no
    gather is forced). Requires n % n_dev == 0 and n/n_dev >= H
    (:func:`irn_tpu.ops.random_walk.diag_sharded_fits`)."""
    n = seeds.shape[1]
    n_dev = mesh.shape[MODEL_AXIS]
    assert n % n_dev == 0, (n, n_dev)
    n_loc = n // n_dev
    hh = max(doffs)
    assert n_loc >= hh, (n_loc, hh)
    fwd = [(i, i + 1) for i in range(n_dev - 1)]
    bwd = [(i + 1, i) for i in range(n_dev - 1)]

    def body(x_loc, w_rep, inv_rep):
        idx = jax.lax.axis_index(MODEL_AXIS)
        c0 = idx * n_loc
        # per-device slices of the replicated operator, halo-extended on
        # the LEFT only for the upper-band terms (w[k, c-d] reads indices
        # [0, hh-1+n_loc); the lower-band terms read w_loc, so no right
        # halo is ever touched); ppermute's unmatched edges and the pad
        # zeros implement the matrix-border zero fill
        w_ext = jax.lax.dynamic_slice(
            jnp.pad(w_rep, ((0, 0), (hh, 0))), (jnp.int32(0), c0),
            (w_rep.shape[0], n_loc + hh),
        )
        w_loc = w_ext[:, hh : hh + n_loc]
        inv_loc = jax.lax.dynamic_slice(inv_rep, (c0,), (n_loc,))

        def app(_, x_loc):
            left = jax.lax.ppermute(x_loc[:, -hh:], MODEL_AXIS, fwd)
            right = jax.lax.ppermute(x_loc[:, :hh], MODEL_AXIS, bwd)
            x_ext = jnp.concatenate([left, x_loc, right], axis=1)
            acc = x_loc
            for k, d in enumerate(doffs):
                acc = (
                    acc
                    + x_ext[:, hh - d : hh - d + n_loc]
                    * w_ext[k, hh - d : hh - d + n_loc][None]
                    + x_ext[:, hh + d : hh + d + n_loc] * w_loc[k][None]
                )
            return acc * inv_loc[None]

        # 4 applications per loop body, like the single-device chain
        # (round-4 sweep: 2-unroll 13%, 4-unroll another ~3%, 8 flat;
        # bit-identical — same ops in the same order)
        for u in (4, 2):
            if n_apply % u == 0 and n_apply >= u:

                def rep(i, x, u=u):
                    for _ in range(u):
                        x = app(i, x)
                    return x

                return jax.lax.fori_loop(0, n_apply // u, rep, x_loc)
        return jax.lax.fori_loop(0, n_apply, app, x_loc)

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(None, MODEL_AXIS), P(), P()),
        out_specs=P(None, MODEL_AXIS),
    )
    return fn(
        jax.lax.with_sharding_constraint(
            seeds, NamedSharding(mesh, P(None, MODEL_AXIS))
        ),
        jax.lax.with_sharding_constraint(w, NamedSharding(mesh, P())),
        jax.lax.with_sharding_constraint(inv, NamedSharding(mesh, P())),
    )


def banded_matrix_power(
    t: jax.Array,
    exp_times: int,
    h: int,
    mesh: Mesh,
    matmul_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """Standalone entry: device_put + jit around
    :func:`banded_power_in_jit`."""
    t = jax.device_put(t, row_sharding(mesh))
    return jax.jit(
        lambda x: banded_power_in_jit(x, exp_times, h, mesh, matmul_dtype)
    )(t)


def banded_propagate_rows(
    seeds: jax.Array,
    t: jax.Array,
    n_apply: int,
    mesh: Mesh,
    matmul_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """Standalone entry: device_put + jit around
    :func:`banded_apply_in_jit`."""
    seeds = jax.device_put(seeds, NamedSharding(mesh, P()))
    t = jax.device_put(t, row_sharding(mesh))
    return jax.jit(
        lambda x, tt: banded_apply_in_jit(x, tt, n_apply, mesh, matmul_dtype)
    )(seeds, t)
