"""Boundary-guided random-walk propagation — the pipeline's MXU hot spot.

Semantics match ``propagate_to_edge`` (/root/reference/misc/indexing.py:
141-166): the boundary map becomes per-pair path affinities (radius 5), the
affinities are scattered into a dense symmetric (HW x HW) matrix with an
identity diagonal, raised elementwise to ``beta``, column-normalized into a
transition matrix T, squared ``exp_times`` times (=> T^(2^exp_times)), and
the boundary-damped seed maps are propagated with one ``x @ T``.

TPU-first redesign (vs the reference's per-image rebuild):

- **One compilation for every image.** The reference rebuilds PathIndex and
  a fresh (HW)^2 matrix for each image's exact size and round-trips through
  a CPU sparse tensor (indexing.py:117). Here the grid is a fixed cap
  (default 128x128 stride-4 cells = 512px images); true extents arrive as
  *dynamic scalars*, out-of-extent cells carry edge=1.0 (a hard boundary,
  affinity exactly 0), so interior results are bit-identical to the
  reference's cropped computation while every image reuses one XLA program.
- The affinity scatter happens on device (no host round trip); the vertex
  count is padded to a multiple of 512 so all matmuls tile the 128x128 MXU
  exactly; padded vertices are isolated self-loops.
- Out-of-extent correctness of the final x4 upsample uses normalized
  (mask-weighted) bilinear interpolation, which reproduces clamped-border
  bilinear exactly for axis-aligned valid regions.

Schedule (production default, round 3): **no squarings at all** — before
any squaring T = colnorm(A^beta) has only 2*n_pairs+1 nonzero diagonals,
so x @ T^256 runs as 256 diagonal-stencil applications
(:func:`apply_diag_chain`), f32-exact and faster than every matmul
formulation measured (BASELINE.md round-3). Pinning ``rw_square_times``
> 0 engages the banded matmul paths: packed-tile application chains
(``IRN_TPU_APPLY=xla`` windowed einsum | ``pallas`` grid) over
:func:`matpow_pallas.square_banded` squarings; dense squarings via
:func:`irn_tpu.ops.matpow.matrix_power_squarings` — unrolled XLA dots by
default, ``IRN_TPU_MATPOW=pallas|fused`` for the blocked Pallas kernels.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from irn_tpu.ops import paths
from irn_tpu.ops.affinity import path_affinity
from irn_tpu.ops.matpow import matrix_power_squarings
from irn_tpu.ops.resize import resize_bilinear_chw


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class RandomWalkGeometry:
    """Static geometry for the capped random-walk grid.

    Attributes:
      cap: (H, W) stride-4 grid cap (true images occupy a top-left window).
      radius: path radius (reference uses 5 at inference).
      padded: boundary-padded grid (H + r, W + 2r), matching the reference's
        pad of r on left/right/bottom (indexing.py:145-150).
      n_vertices: padded-grid pixel count.
      n_pad: n_vertices rounded up to a multiple of 512 (MXU tiling).
    """

    cap: Tuple[int, int]
    radius: int
    padded: Tuple[int, int]
    n_vertices: int
    n_pad: int
    grid_index: paths.GridPathIndex


@functools.lru_cache(maxsize=None)
def build_geometry(cap_h: int = 128, cap_w: int = 128, radius: int = 5) -> RandomWalkGeometry:
    padded = (cap_h + radius, cap_w + 2 * radius)
    ps = paths.build_path_set(radius)
    gi = paths.build_grid_index(ps, padded)
    n_vertices = padded[0] * padded[1]
    return RandomWalkGeometry(
        cap=(cap_h, cap_w),
        radius=radius,
        padded=padded,
        n_vertices=n_vertices,
        n_pad=_round_up(n_vertices, 512),
        grid_index=gi,
    )


def _extent_mask(h: jax.Array, w: jax.Array, shape: Tuple[int, int]) -> jax.Array:
    """[shape] float mask, 1.0 where (row < h) & (col < w)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return ((rows < h) & (cols < w)).astype(jnp.float32)


def dense_affinity(geom: RandomWalkGeometry, edge_capped: jax.Array) -> jax.Array:
    """Build the dense symmetric affinity matrix — scatter-free.

    Every pair direction contributes one *diagonal band*: A[i, i + doff] =
    aff_k(i) with doff = dy * W_padded + dx > 0. In a row-major (N, N+1)
    buffer the band positions i * (N+1) + doff are exactly column ``doff``,
    so the whole matrix assembles from n_pairs dense column writes + a
    reshape — no scatter (TPU scatters serialize) and no giant index
    literals (which cost minutes of XLA compile time). Destination indices
    satisfy i + doff < n_vertices for every valid source, so the reshape
    never wraps a band across rows.

    Args:
      edge_capped: [cap_h, cap_w] edge map; cells beyond the true extent
        MUST already be 1.0 (hard boundary).

    Returns:
      [n_pad, n_pad] dense affinity with identity diagonal.
    """
    vs, doffs = band_values(geom, edge_capped)
    n = geom.n_pad
    strip = _round_up(max(doffs) + 1, 128)
    assert 2 * strip < n + 1, (strip, n)
    left = jnp.zeros((n, strip), jnp.float32)
    right = jnp.zeros((n, strip), jnp.float32)
    left = left.at[:, 0].set(1.0)  # column 0 == the identity diagonal

    for k, doff in enumerate(doffs):
        left = left.at[:, doff].set(vs[k])
        # Lower band A[j, j-doff] = aff(j-doff) sits at view position
        # (row j-1, column n+1-doff): the column is v shifted down by
        # doff-1 rows. n+1-doff maps to local strip index strip-doff.
        right = right.at[:, strip - doff].set(
            jnp.pad(vs[k], (doff - 1, 0))[:n]
        )

    a = jnp.concatenate(
        [left, jnp.zeros((n, n + 1 - 2 * strip), jnp.float32), right], axis=1
    )
    return a.reshape(-1)[: n * n].reshape(n, n)


def band_values(
    geom: RandomWalkGeometry, edge_capped: jax.Array
) -> Tuple[jax.Array, Tuple[int, ...]]:
    """Per-direction diagonal band values of the affinity matrix.

    Returns (vs [n_pairs, n_pad], doffs): A[i, i + doffs[k]] = vs[k, i]
    and symmetrically A[j, j - doffs[k]] = vs[k, j - doffs[k]], plus the
    implicit unit diagonal. This [n_pairs, n] table (a few MB) is the
    ENTIRE content of the banded matrix — both the dense assembly and the
    mesh-sharded per-device assembly build from it."""
    r = geom.radius
    ph, pw = geom.padded
    n = geom.n_pad
    ps = geom.grid_index.path_set
    rf = ps.radius_floor
    ch, cw = ph - rf, pw - 2 * rf

    edge_padded = jnp.ones((ph, pw), jnp.float32)
    edge_padded = edge_padded.at[: geom.cap[0], r : r + geom.cap[1]].set(
        edge_capped.astype(jnp.float32)
    )

    aff = path_affinity(edge_padded, ps)  # [n_pairs, ch*cw]
    aff = aff.reshape(ps.n_pairs, ch, cw)

    vs = []
    doffs = []
    for k in range(ps.n_pairs):
        dy, dx = int(ps.dst_offsets[k, 0]), int(ps.dst_offsets[k, 1])
        doffs.append(dy * pw + dx)
        v = jnp.zeros((ph, pw), jnp.float32)
        v = v.at[:ch, rf : rf + cw].set(aff[k])
        vs.append(jnp.pad(v.reshape(-1), (0, n - ph * pw)))
    return jnp.stack(vs), tuple(doffs)


def _shift_r(v: jax.Array, d: int) -> jax.Array:
    """out[..., c] = v[..., c - d] with zero fill."""
    if not d:
        return v
    return jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(d, 0)])[..., :-d]


def build_diag_operator(
    geom: RandomWalkGeometry, edge_capped: jax.Array, beta: int = 10
) -> Tuple[jax.Array, jax.Array]:
    """T as its 2*n_pairs+1 nonzero DIAGONALS: (w [n_pairs, n_pad], inv
    [n_pad]) with doffs = :func:`band_values` offsets.

    Before any squaring, T = colnorm(A^beta) inherits A's sparsity — an
    identity diagonal plus one symmetric diagonal pair per path direction
    (34 at radius 5), i.e. only 69 of the 1113 in-band diagonals are
    nonzero. The e=0 application chain therefore never needs a matrix at
    all: T[c-d, c] = w[k, c-d] (upper), T[c+d, c] = w[k, c] (lower),
    T[c, c] = 1, all divided by colsum[c] = 1 + sum_k(w[k, c-d_k] +
    w[k, c]). No [n, n] buffer is ever materialized."""
    vs, doffs = band_values(geom, edge_capped)
    w = vs.astype(jnp.float32) ** beta
    colsum = 1.0 + sum(
        _shift_r(w[k], d) + w[k] for k, d in enumerate(doffs)
    )
    return w, 1.0 / colsum


def apply_diag_chain(
    x: jax.Array,
    w: jax.Array,
    inv: jax.Array,
    doffs: Tuple[int, ...],
    n_apply: int,
) -> jax.Array:
    """x @ T^n_apply with T in diagonal form — the e=0 fast path.

    Each application is 2*n_pairs+1 shifted fused multiply-adds over the
    [C, n] seed rows (slices of one zero-padded buffer — a stencil XLA
    fuses into vector passes), entirely in f32:

      out[:, c] = (x[:, c] + sum_k x[:, c-d_k] * w[k, c-d_k]
                           + sum_k x[:, c+d_k] * w[k, c]) * inv[c]

    Measured on v5e-1 (n=14336, 256 applications): 17.9 ms/chain, and the
    full e=0 propagate beats the windowed-einsum chain (BASELINE.md
    round-3 stencil table) while being EXACT: the bf16 matmul chains
    round T itself to bf16 and compound that over 2^E applications —
    max-rel 0.45-0.97 vs the f32 oracle, 98.2-98.4% decoded-label
    agreement on realistic scenes (62-64% on adversarial random seeds);
    the stencil stays f32 end-to-end (1.6e-4, 100.000%). Alternatives
    measured and rejected: 2-D (dy, dx) slicing (33.5 ms — the pw=138
    row stride misaligns lanes), 256-aligned row stride (32.8 ms — 82%
    padding overhead); the round-4 headroom sweep
    (tools/bench_stencil_sweep.py) also rejected one diagonal-operator
    squaring (T^2 has 249 nonzero diagonals — the offset SUMSET, not
    2x69 — so 128 applications of it cost 14.3 vs 10.4 ms: the chain is
    VPU-throughput-bound, not loop-bound) and re-rejected image-batching
    at the 8-row bucket (0.99x at B=2). The one sweep win kept: TWO
    applications per loop body (9.07 vs 10.42 ms, same ops in the same
    order — bit-identical results, half the loop trips)."""
    h = max(doffs)
    n = x.shape[-1]
    wpad = jnp.pad(w, ((0, 0), (h, h)))

    def one(x):
        xpad = jnp.pad(x, ((0, 0), (h, h)))
        acc = x
        for k, d in enumerate(doffs):
            acc = (
                acc
                + xpad[:, h - d : h - d + n] * wpad[k, h - d : h - d + n][None]
                + xpad[:, h + d : h + d + n] * w[k][None]
            )
        return acc * inv[None]

    # unroll: same ops in the same order (bit-identical), fewer loop
    # trips. Round-4 sweep adopted 2 (9.07 vs 10.42 ms); the follow-up
    # probe measured 4 another ~3% faster and 8 flat — adopt 4 with
    # fallbacks (2^E application counts always take the 4-way).
    for u in (4, 2):
        if n_apply % u == 0 and n_apply >= u:

            def body(_, x, u=u):
                for _i in range(u):
                    x = one(x)
                return x

            return jax.lax.fori_loop(0, n_apply // u, body, x)
    return jax.lax.fori_loop(0, n_apply, lambda _, x: one(x), x)


def diag_offsets(geom: RandomWalkGeometry) -> Tuple[int, ...]:
    """The static flat-grid diagonal offsets (one per path direction)."""
    pw = geom.padded[1]
    ps = geom.grid_index.path_set
    return tuple(
        int(dy) * pw + int(dx) for dy, dx in np.asarray(ps.dst_offsets)
    )


def apply_transition_diag(
    geom: RandomWalkGeometry,
    cam_capped: jax.Array,
    edge_capped: jax.Array,
    winv: Tuple[jax.Array, jax.Array],
    n_apply: int,
) -> jax.Array:
    """Seed propagation through a diagonal-form T (chunk-reusable: the
    (w, inv) operator is seed-independent, like the banded T)."""
    w, inv = winv
    x = _flat_seeds(geom, cam_capped, edge_capped)
    rw = apply_diag_chain(x, w, inv, diag_offsets(geom), n_apply)
    return _unflatten_rw(geom, rw)


def diag_selected() -> bool:
    """The e=0 diagonal stencil is the default TPU apply path; pinning
    ``IRN_TPU_APPLY=xla|pallas`` opts back into the packed-tile matmul
    chains (which also serve every e > 0)."""
    import os

    return os.environ.get("IRN_TPU_APPLY", "diag") == "diag"


def propagate_diag(
    geom: RandomWalkGeometry,
    cam_capped: jax.Array,
    edge_capped: jax.Array,
    beta: int = 10,
    exp_times: int = 8,
) -> jax.Array:
    """:func:`propagate` at square_times=0 via the diagonal stencil —
    f32-exact (no matrix, no bf16 rounding of T) and the fastest e=0
    route on TPU. See :func:`apply_diag_chain`."""
    winv = build_diag_operator(geom, edge_capped, beta)
    return apply_transition_diag(
        geom, cam_capped, edge_capped, winv, 1 << exp_times
    )


def normalize_transition(affinity: jax.Array, beta: int = 10) -> jax.Array:
    """A^beta, column-normalized (misc/indexing.py:132-137) — the one
    construction shared by the dense, Pallas-banded, and mesh-sharded
    paths."""
    scaled = affinity**beta
    return scaled / jnp.sum(scaled, axis=0, keepdims=True)


def transition_matrix(
    affinity: jax.Array,
    beta: int = 10,
    exp_times: int = 8,
    matmul_dtype: Optional[jnp.dtype] = None,
    sharding=None,
) -> jax.Array:
    """A^beta, column-normalize, then ``exp_times`` squarings => T^(2^e).

    Column (not row) normalization matches the reference
    (indexing.py:135). With ``IRN_TPU_MATPOW=fused`` (single-device TPU
    only) the normalization and the first squaring run as one Pallas
    kernel: A -> T^2 with T never materialized in HBM."""
    from irn_tpu.ops import matpow

    if (
        sharding is None
        and exp_times >= 1
        and matpow.selected_path() == "fused"
    ):
        from irn_tpu.ops.matpow_pallas import square_fused_first

        t = square_fused_first(affinity, beta=beta, matmul_dtype=matmul_dtype)
        return matrix_power_squarings(t, exp_times - 1, matmul_dtype)
    t = normalize_transition(affinity, beta)
    return matrix_power_squarings(
        t, exp_times, matmul_dtype=matmul_dtype, sharding=sharding
    )


def build_transition(
    geom: RandomWalkGeometry,
    edge_capped: jax.Array,
    beta: int = 10,
    exp_times: int = 8,
    matmul_dtype: Optional[jnp.dtype] = None,
    mesh=None,
) -> jax.Array:
    """T^(2^e) from the edge map — seed-independent, so chunked seed
    propagation builds it once per image and reuses it for every chunk.

    With ``mesh`` (a Mesh with a >1 "model" axis) the matrix is block-row
    sharded for every squaring and gathered replicated at the end, so the
    subsequent seed dots keep the single-device reduction order (decoded
    labels stay bit-identical)."""
    sharding = None
    if mesh is not None and mesh.shape.get("model", 1) > 1:
        from jax.sharding import NamedSharding, PartitionSpec

        sharding = NamedSharding(mesh, PartitionSpec("model", None))
    t = transition_matrix(
        dense_affinity(geom, edge_capped), beta, exp_times, matmul_dtype,
        sharding=sharding,
    )
    if sharding is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        t = jax.lax.with_sharding_constraint(
            t, NamedSharding(mesh, PartitionSpec(None, None))
        )
    return t


def _flat_seeds(
    geom: RandomWalkGeometry,
    cam_capped: jax.Array,
    edge_capped: jax.Array,
) -> jax.Array:
    """Boundary-damped seeds embedded in the padded flat grid [C, n_pad]."""
    r = geom.radius
    ch, cw = geom.cap
    c = cam_capped.shape[0]
    damped = cam_capped * (1.0 - edge_capped)[None]
    seeds = jnp.zeros((c, geom.padded[0], geom.padded[1]), jnp.float32)
    seeds = seeds.at[:, :ch, r : r + cw].set(damped)
    seeds_flat = seeds.reshape(c, geom.n_vertices)
    return jnp.pad(seeds_flat, ((0, 0), (0, geom.n_pad - geom.n_vertices)))


def _unflatten_rw(geom: RandomWalkGeometry, rw: jax.Array) -> jax.Array:
    r = geom.radius
    ch, cw = geom.cap
    c = rw.shape[0]
    rw = rw[:, : geom.n_vertices].reshape(c, *geom.padded)
    return rw[:, :ch, r : r + cw]


def band_halfwidth(geom: RandomWalkGeometry) -> int:
    """Affinity band halfwidth in flat-grid elements: the farthest pair
    destination is max(dy)*W_padded + max(dx) off the diagonal (all other
    nonzeros — the mirrored band and the identity diagonal — are closer)."""
    ps = geom.grid_index.path_set
    return int(ps.dst_offsets[:, 0].max()) * geom.padded[1] + int(
        ps.dst_offsets[:, 1].max()
    )


def banded_fits(
    geom: RandomWalkGeometry,
    exp_times: int,
    square_times: int,
    bs: int = 512,
) -> bool:
    """True when the banded kernels stay banded through the whole chain:
    the final band (after ``square_times`` doublings) must not cover the
    matrix — once any step would fall back to dense, the unspecified
    out-of-band blocks of earlier banded squarings would leak."""
    if not 0 <= square_times <= exp_times:
        raise ValueError(f"square_times={square_times} not in [0, {exp_times}]")
    n = geom.n_pad
    if n % bs:
        return False
    h_final = band_halfwidth(geom) << square_times
    return 2 * (-(-h_final // bs)) + 1 < n // bs


def banded_sharded_fits(
    geom: RandomWalkGeometry,
    exp_times: int,
    square_times: int,
    n_model: int,
) -> bool:
    """Gate for the halo-exchange sharded path
    (:mod:`irn_tpu.parallel.rw_sharded`): rows must split evenly and the
    final band must stay well under the matrix (beyond ~n/4 halfwidth the
    halo exchange approaches the all-gather it replaces)."""
    if not 0 <= square_times <= exp_times:
        raise ValueError(f"square_times={square_times} not in [0, {exp_times}]")
    n = geom.n_pad
    if n_model < 2 or n % n_model:
        return False
    return 4 * (band_halfwidth(geom) << square_times) <= n


def diag_sharded_fits(geom: RandomWalkGeometry, n_model: int) -> bool:
    """Gate for the column-sharded diagonal stencil
    (:func:`irn_tpu.parallel.rw_sharded.diag_apply_in_jit`): columns must
    split evenly and each shard must cover the stencil halo (one-neighbor
    ppermute)."""
    n = geom.n_pad
    return (
        n_model >= 2
        and n % n_model == 0
        and n // n_model >= band_halfwidth(geom)
    )


def propagate_mesh_diag(
    geom: RandomWalkGeometry,
    cam_capped: jax.Array,
    edge_capped: jax.Array,
    beta: int,
    exp_times: int,
    mesh,
) -> jax.Array:
    """Mesh (long-context) variant of :func:`propagate_diag`: the seed
    columns shard over the model axis and each of the 2^E applications
    exchanges only the stencil halo over ICI. Same f32-exact results as
    the single-device stencil. Composes the chunk-reusable application
    exactly like :func:`propagate_diag` does, so the fused and chunked
    paths cannot drift apart."""
    return apply_transition_mesh_diag(
        geom, cam_capped, edge_capped,
        build_diag_operator(geom, edge_capped, beta), 1 << exp_times, mesh,
    )


def apply_transition_mesh_diag(
    geom: RandomWalkGeometry,
    cam_capped: jax.Array,
    edge_capped: jax.Array,
    winv: Tuple[jax.Array, jax.Array],
    n_apply: int,
    mesh,
) -> jax.Array:
    """Chunk-reusable mesh-diag application (the (w, inv) operator is
    seed-independent, like the sharded T)."""
    from irn_tpu.parallel import rw_sharded

    w, inv = winv
    seeds = _flat_seeds(geom, cam_capped, edge_capped)
    rw = rw_sharded.diag_apply_in_jit(
        seeds, w, inv, diag_offsets(geom), n_apply, mesh
    )
    return _unflatten_rw(geom, rw)


def propagate_with_transition(
    geom: RandomWalkGeometry,
    cam_capped: jax.Array,
    edge_capped: jax.Array,
    t: jax.Array,
    matmul_dtype: Optional[jnp.dtype] = None,
    n_apply: int = 1,
) -> jax.Array:
    """Boundary-damp the seeds and propagate through a prebuilt T.

    ``n_apply`` right-multiplications: with T = T_base^(2^e), applying it
    2^(E-e) times computes x @ T_base^(2^E) with far fewer FLOPs than
    squaring all the way up — see :func:`pick_square_times`."""
    rw = _flat_seeds(geom, cam_capped, edge_capped)

    if matmul_dtype is not None:
        tb = t.astype(matmul_dtype)  # cast once, reused every application
        for _ in range(n_apply):
            rw = jnp.dot(
                rw.astype(matmul_dtype), tb,
                preferred_element_type=jnp.float32,
            )
    else:
        # right-multiplication x @ T (indexing.py:164)
        for _ in range(n_apply):
            rw = jnp.dot(rw, t, precision=jax.lax.Precision.HIGHEST)
    return _unflatten_rw(geom, rw)


def build_transition_banded(
    geom: RandomWalkGeometry,
    edge_capped: jax.Array,
    beta: int = 10,
    square_times: int = 2,
    matmul_dtype: Optional[jnp.dtype] = None,
    bs: int = 512,
    interpret: bool = False,
) -> Tuple[jax.Array, int]:
    """T^(2^square_times) via banded Pallas squarings.

    The affinity matrix is banded (halfwidth :func:`band_halfwidth`) and
    squaring doubles the band; the banded kernels skip everything outside
    it — 2.4x over the dense hybrid at the VOC-typical bucket (BASELINE.md
    round-2). Returns (t, band): out-of-band blocks of ``t`` are
    UNSPECIFIED — propagate through :func:`apply_transition_banded` only.
    Callers must check :func:`banded_fits` first."""
    from irn_tpu.ops.matpow_pallas import square_banded

    h = band_halfwidth(geom)
    t = normalize_transition(dense_affinity(geom, edge_capped), beta)
    for _ in range(square_times):
        t = square_banded(t, h, matmul_dtype=matmul_dtype, bs=bs,
                          interpret=interpret)
        h *= 2
    return t, h


def apply_transition_banded(
    geom: RandomWalkGeometry,
    cam_capped: jax.Array,
    edge_capped: jax.Array,
    t: jax.Array,
    band: int,
    n_apply: int,
    matmul_dtype: Optional[jnp.dtype] = None,
    bs: int = 512,
    bj: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """Seed propagation through a banded T (one fused application chain)."""
    from irn_tpu.ops.matpow_pallas import apply_banded_chain

    seeds = _flat_seeds(geom, cam_capped, edge_capped)
    c = seeds.shape[0]
    c_pad = _round_up(c, 8)
    seeds = jnp.pad(seeds, ((0, c_pad - c), (0, 0)))
    rw = apply_banded_chain(
        seeds, t, band, n_apply, matmul_dtype=matmul_dtype, bs=bs, bj=bj,
        interpret=interpret,
    )
    return _unflatten_rw(geom, rw[:c])


def propagate_banded(
    geom: RandomWalkGeometry,
    cam_capped: jax.Array,
    edge_capped: jax.Array,
    beta: int = 10,
    exp_times: int = 8,
    matmul_dtype: Optional[jnp.dtype] = None,
    square_times: Optional[int] = None,
    bs: int = 512,
    bj: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """:func:`propagate` evaluated with the banded kernels (single-device
    TPU path; ``interpret=True`` runs them on CPU for tests). Falls back to
    the dense path when the band would outgrow the matrix."""
    e = exp_times if square_times is None else square_times
    if not 0 <= e <= exp_times:
        raise ValueError(f"square_times={e} not in [0, {exp_times}]")
    if e == 0 and diag_selected():
        # the production default: no squarings, no matrix — T applied in
        # diagonal form, f32-exact (matmul_dtype is irrelevant: there is
        # no matmul). Needs no banded_fits gate either: the diagonal
        # operator IS the dense matrix, band overflow cannot occur.
        return propagate_diag(geom, cam_capped, edge_capped, beta,
                              exp_times)
    if not banded_fits(geom, exp_times, e, bs):
        return propagate(geom, cam_capped, edge_capped, beta, exp_times,
                         matmul_dtype, square_times=square_times)
    t, band = build_transition_banded(
        geom, edge_capped, beta, e, matmul_dtype, bs, interpret
    )
    return apply_transition_banded(
        geom, cam_capped, edge_capped, t, band, 1 << (exp_times - e),
        matmul_dtype, bs, bj, interpret,
    )


def propagate_banded_batch(
    geom: RandomWalkGeometry,
    cams_capped: jax.Array,
    edges_capped: jax.Array,
    beta: int = 10,
    exp_times: int = 8,
    matmul_dtype: Optional[jnp.dtype] = None,
    square_times: Optional[int] = None,
    bs: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """B same-bucket images' banded random walks with ONE fused apply
    chain (:func:`matpow_pallas.apply_banded_chain_batched`): each image
    keeps its own transition matrix (edge-dependent), but the thin
    applications — the HBM-rate-bound 2^(E-e) steps that dominate the
    hybrid schedule — share one kernel launch so every band-tile DMA
    carries B images' tiles. Transitions are built per image (the
    squarings are MXU-bound; nothing to amortize).

    ``cams_capped``: [B, C, cap_h, cap_w]; ``edges_capped``:
    [B, cap_h, cap_w]. Returns [B, C, cap_h, cap_w], each row equal to
    :func:`propagate_banded` of that image (same operator, same kernels —
    the batched chain only changes the grid walk)."""
    e = exp_times if square_times is None else square_times
    if not 0 <= e <= exp_times:
        raise ValueError(f"square_times={e} not in [0, {exp_times}]")
    bimg = cams_capped.shape[0]
    if e == 0 and diag_selected():
        # match propagate_banded's e=0 dispatch: the f32-exact diagonal
        # stencil, vmapped over the batch (otherwise the batch path would
        # silently run the bf16 matmul chain and diverge from the
        # per-image labels this docstring promises)
        return jax.vmap(
            lambda c, ed: propagate_diag(geom, c, ed, beta, exp_times)
        )(cams_capped, edges_capped)
    if not banded_fits(geom, exp_times, e, bs):
        return jnp.stack([
            propagate(geom, cams_capped[b], edges_capped[b], beta,
                      exp_times, matmul_dtype, square_times=square_times)
            for b in range(bimg)
        ])
    ts = []
    band = None
    for b in range(bimg):
        t, band = build_transition_banded(
            geom, edges_capped[b], beta, e, matmul_dtype, bs, interpret
        )
        ts.append(t)
    seeds = jnp.stack([
        _flat_seeds(geom, cams_capped[b], edges_capped[b])
        for b in range(bimg)
    ])
    c = seeds.shape[1]
    c_pad = _round_up(c, 8)
    seeds = jnp.pad(seeds, ((0, 0), (0, c_pad - c), (0, 0)))
    from irn_tpu.ops.matpow_pallas import apply_banded_chain_batched

    rw = apply_banded_chain_batched(
        seeds, jnp.stack(ts), band, 1 << (exp_times - e), matmul_dtype,
        bs, interpret,
    )
    return jnp.stack([_unflatten_rw(geom, rw[b, :c]) for b in range(bimg)])


def pick_square_times_banded(exp_times: int) -> int:
    """Squarings-vs-applications split for the BANDED path: e=0.

    With the round-3 windowed-einsum chain (matpow_pallas._apply_chain_xla,
    the default apply impl) the packed band tiles stay VMEM-resident across
    the whole chain, so applications stopped being HBM-bound and squarings
    stopped paying for themselves entirely: measured on v5e-1 at both
    production buckets (tools/bench_banded.py full-propagate sweep,
    BASELINE.md round-3): e=0/e=1/e=2 = 26.9/30.1/46.2 ms at n=14336 and
    39.2/63.3/66.2 ms at n=18432 — zero squarings, 2^E thin applications
    against the narrowest band wins both. (Round-2's e=1 valley was a
    property of the HBM-streaming Pallas chain, kept under
    IRN_TPU_APPLY=pallas.)"""
    return 0


def pick_square_times(
    n_pad: int,
    exp_times: int,
    n_chunks: int = 1,
    matmul_dtype: Optional[jnp.dtype] = None,
) -> int:
    """Cost-model choice of how many squarings to run before switching to
    thin seed applications.

    x @ T^(2^E) = x applied 2^(E-e) times with T^(2^e): each squaring costs
    2*n^3 MXU FLOPs while each application is HBM-bound (one streaming read
    of T). Constants fitted on v5e-1 (tools/bench_matpow.py methodology:
    34.5 ms/squaring, ~0.9 ms/application at n=14336 bf16); the optimum is
    flat, so rough constants transfer. e=E reproduces pure squaring.
    ``n_chunks``: seed-row chunks that will reuse the same T (instance
    stage) — more reuse favors more squarings."""
    bf16 = matmul_dtype is not None
    sq = 2 * n_pad**3 / (1.5e14 if bf16 else 2.8e13)
    ap = (2 if bf16 else 4) * n_pad**2 / 8.2e11 * 1.8
    return min(
        range(exp_times + 1),
        key=lambda e: e * sq + n_chunks * (1 << (exp_times - e)) * ap,
    )


def build_transition_mesh_banded(
    geom: RandomWalkGeometry,
    edge_capped: jax.Array,
    beta: int,
    square_times: int,
    mesh,
    matmul_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """T^(2^square_times) block-row sharded end-to-end: each device
    assembles its OWN row block from the tiny [n_pairs, n] band-value
    table (the full matrix never exists on any single device), column
    sums psum for the normalization, and squarings exchange only band
    halos. The result STAYS row-sharded (propagate with
    :func:`apply_transition_mesh_banded`). Callers must check
    :func:`banded_sharded_fits` first."""
    from irn_tpu.parallel import rw_sharded

    vs, doffs = band_values(geom, edge_capped)
    a = rw_sharded.assemble_rows_in_jit(vs, doffs, geom.n_pad, mesh)
    t = rw_sharded.normalize_rows_in_jit(a, beta, mesh)
    return rw_sharded.banded_power_in_jit(
        t, square_times, band_halfwidth(geom), mesh, matmul_dtype
    )


def apply_transition_mesh_banded(
    geom: RandomWalkGeometry,
    cam_capped: jax.Array,
    edge_capped: jax.Array,
    t: jax.Array,
    n_apply: int,
    mesh,
    matmul_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """Seed propagation through a row-sharded T (psum-reduced partial
    contractions per application)."""
    from irn_tpu.parallel import rw_sharded

    seeds = _flat_seeds(geom, cam_capped, edge_capped)
    rw = rw_sharded.banded_apply_in_jit(seeds, t, n_apply, mesh, matmul_dtype)
    return _unflatten_rw(geom, rw)


def propagate(
    geom: RandomWalkGeometry,
    cam_capped: jax.Array,
    edge_capped: jax.Array,
    beta: int = 10,
    exp_times: int = 8,
    matmul_dtype: Optional[jnp.dtype] = None,
    mesh=None,
    square_times: Optional[int] = None,
    mesh_banded: bool = True,
) -> jax.Array:
    """Random-walk propagation of seed maps to boundaries.

    Args:
      cam_capped: [C, cap_h, cap_w] seed score maps (zeros beyond extent).
      edge_capped: [cap_h, cap_w] edge map (1.0 beyond extent).
      mesh: optional Mesh with a >1 "model" axis: the transition matrix is
        block-row sharded over it (the "long-context" scaling mode). When
        the band permits (:func:`banded_sharded_fits`) and ``mesh_banded``,
        squarings exchange only band halos over ICI and T stays sharded
        end-to-end (psum-reduced applications) — comms O(h*n) per squaring
        and per-device HBM never holds the full matrix. Otherwise the
        partitioner's dense collective matmul runs with a replicated
        gather at the end (full-k contraction: bit-identical to
        single-device execution).
      square_times: squarings before switching to thin applications
        (None = exp_times, the reference's pure-squaring evaluation;
        :func:`pick_square_times` chooses the fast hybrid).

    Returns:
      [C, cap_h, cap_w] propagated scores (zero beyond extent).
    """
    e = exp_times if square_times is None else square_times
    if not 0 <= e <= exp_times:
        raise ValueError(f"square_times={e} not in [0, {exp_times}]")
    n_model = mesh.shape.get("model", 1) if mesh is not None else 1
    if (
        mesh_banded
        and n_model > 1
        and e == 0
        and diag_selected()
        and diag_sharded_fits(geom, n_model)
    ):
        # mesh analogue of the e=0 production default: diagonal stencil
        # with halo ppermutes, f32-exact (see propagate_mesh_diag)
        return propagate_mesh_diag(
            geom, cam_capped, edge_capped, beta, exp_times, mesh
        )
    if (
        mesh_banded
        and n_model > 1
        and banded_sharded_fits(geom, exp_times, e, n_model)
    ):
        t = build_transition_mesh_banded(
            geom, edge_capped, beta, e, mesh, matmul_dtype
        )
        return apply_transition_mesh_banded(
            geom, cam_capped, edge_capped, t, 1 << (exp_times - e), mesh,
            matmul_dtype,
        )
    t = build_transition(geom, edge_capped, beta, e, matmul_dtype, mesh)
    return propagate_with_transition(
        geom, cam_capped, edge_capped, t, matmul_dtype,
        n_apply=1 << (exp_times - e),
    )


def upsample_scores(
    rw_capped: jax.Array,
    h4: jax.Array,
    w4: jax.Array,
    h0: jax.Array,
    w0: jax.Array,
) -> jax.Array:
    """x4 bilinear upsample of propagated scores with dynamic extents.

    The grid-valid region is (h4, w4) stride-4 cells; the pixel-valid
    region is (h0, w0). Returns [C, 4H, 4W] un-normalized scores, zero
    beyond (h0, w0). Normalized (mask-weighted) bilinear reproduces
    clamped-border bilinear exactly for axis-aligned valid regions."""
    c, ch, cw = rw_capped.shape
    m4 = _extent_mask(h4, w4, (ch, cw))
    rw_up = resize_bilinear_chw(rw_capped * m4[None], (4 * ch, 4 * cw))
    m_up = resize_bilinear_chw(m4, (4 * ch, 4 * cw))
    rw_up = jnp.where(m_up > 1e-6, rw_up / jnp.maximum(m_up, 1e-6), 0.0)
    pix = _extent_mask(h0, w0, (4 * ch, 4 * cw))
    return rw_up * pix[None]


def upsample_and_decode(
    rw_capped: jax.Array,
    h4: jax.Array,
    w4: jax.Array,
    h0: jax.Array,
    w0: jax.Array,
    bg_thres: float,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """x4 bilinear upsample, max-normalize, bg-threshold-pad, argmax.

    Matches step/make_sem_seg_labels.py:44-47 with dynamic true extents.
    Returns (labels [4H, 4W] int32 where 0 = background and k >= 1 means
    seed channel k-1; rw_up [C, 4H, 4W] max-normalized upsampled scores —
    the per-instance score source for detection,
    make_ins_seg_labels.py:137-149; max_score scalar).
    Out-of-extent pixels decode to background.
    """
    c, ch, cw = rw_capped.shape
    rw_up = upsample_scores(rw_capped, h4, w4, h0, w0)
    pix = _extent_mask(h0, w0, (4 * ch, 4 * cw))
    max_score = jnp.max(rw_up)
    rw_up = rw_up / jnp.maximum(max_score, 1e-12)
    stacked = jnp.concatenate(
        [jnp.full((1, 4 * ch, 4 * cw), bg_thres, rw_up.dtype), rw_up], axis=0
    )
    labels = jnp.argmax(stacked, axis=0).astype(jnp.int32)
    labels = jnp.where(pix > 0, labels, 0)
    return labels, rw_up, max_score
