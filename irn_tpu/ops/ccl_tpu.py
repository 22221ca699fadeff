"""Device connected-component labeling + centroid clustering.

The instance stage groups pixels by the basin (connected component of the
low-displacement mask) their advected centroid lands on — the reference
runs ``skimage.measure.label`` on host (step/make_ins_seg_labels.py:66)
and indexes it with the converged coordinates (the host twin is
``ops.centroids.cluster_centroids_from_basin``). On a relay-attached TPU
that host hop costs a fetch + re-upload round trip per image, so this
module re-derives the SAME partition entirely on device:

- :func:`min_label_plane`: iterated 4-direction *segmented* min-scans
  under a ``lax.while_loop`` until fixpoint. Every basin pixel converges
  to its component's minimum flat index — and the minimum flat index IS
  the component's raster-order first appearance, so ascending-min-index
  rank equals the host union-find's 1..K first-appearance numbering
  exactly (ops/cc.label_components; exactness argument in the docstring).
- :func:`cluster_masks`: looks the label plane up at the converged
  centroid coordinates (two one-hot matmuls — gathers serialize on TPU),
  then ranks the distinct cluster values ascending with the escape bucket
  (centroid outside every basin) first, reproducing the host's
  ``compress_range(clusters + 1)`` + ``to_one_hot`` bit for bit, as a
  fixed ``k_cap`` stack of masks plus an overflow-detecting count.

Everything is shape-static (one compile per grid cap) and exact: the
while_loop runs to the true fixpoint, so arbitrary mask topology (spirals
included) labels identically to the host union-find.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _seg_cummin(vals: jax.Array, brk: jax.Array, axis: int,
                reverse: bool) -> jax.Array:
    """Segmented cumulative min: running min along ``axis`` that restarts
    at every ``brk``-flagged element (the standard segmented-scan monoid:
    associative, so ``lax.associative_scan`` runs it in log depth)."""

    def op(a, b):
        av, ab = a
        bv, bb = b
        return jnp.where(bb, bv, jnp.minimum(av, bv)), ab | bb

    out, _ = jax.lax.associative_scan(
        op, (vals, brk), axis=axis, reverse=reverse
    )
    return out


def min_label_plane(mask: jax.Array) -> jax.Array:
    """[H, W] bool mask -> [H, W] int32: each True pixel carries the
    minimum flat index of its 4-connected component; False pixels carry
    the sentinel ``H*W``.

    One sweep = segmented min-scans in all four directions (left/right
    along rows, up/down along columns — row/column propagation crosses
    only 4-neighbor edges inside the mask, so connectivity is exactly 4).
    Sweeps iterate under ``while_loop`` until nothing changes; at the
    fixpoint adjacent in-mask pixels in any row or column are equal, so
    the plane is constant on components, values only ever decrease, and
    the component-minimum pixel keeps its own index — every component
    holds its min flat index. Convergence needs O(geodesic direction
    changes) sweeps (1-2 for convex basins, more for spirals) and is
    guaranteed: the plane decreases monotonically and is bounded below."""
    h, w = mask.shape
    iota = (
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
        + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    )
    sentinel = jnp.int32(h * w)
    lab0 = jnp.where(mask, iota, sentinel)
    brk = ~mask

    def sweep(lab):
        lab = _seg_cummin(lab, brk, axis=1, reverse=False)
        lab = _seg_cummin(lab, brk, axis=1, reverse=True)
        lab = _seg_cummin(lab, brk, axis=0, reverse=False)
        lab = _seg_cummin(lab, brk, axis=0, reverse=True)
        return lab

    def body(carry):
        lab, _ = carry
        nxt = sweep(lab)
        return nxt, jnp.any(nxt != lab)

    lab, _ = jax.lax.while_loop(
        lambda c: c[1], body, (lab0, jnp.bool_(True))
    )
    return lab


_BIG = np.int32(np.iinfo(np.int32).max // 2)  # > any flat index or -1


def _lookup(lab: jax.Array, cy: jax.Array, cx: jax.Array) -> jax.Array:
    """lab[cy, cx] for every pixel, gather-free: one-hot row-select matmul
    (MXU) + one-hot column masked reduce (VPU) — the same shifted-weight
    treatment the advection loop uses (ops/centroids.py). Label values
    are <= H*W, exact in f32 for any grid under 4096^2."""
    h, w = lab.shape
    n = h * w
    assert n < (1 << 24), (h, w)  # f32-exact integer transport
    oy = (
        cy.reshape(n)[:, None]
        == jax.lax.broadcasted_iota(jnp.int32, (n, h), 1)
    ).astype(jnp.float32)
    rows = jnp.dot(
        oy, lab.astype(jnp.float32), precision=jax.lax.Precision.HIGHEST
    )  # [N, W]
    ox = (
        cx.reshape(n)[:, None]
        == jax.lax.broadcasted_iota(jnp.int32, (n, w), 1)
    ).astype(jnp.float32)
    return jnp.sum(rows * ox, axis=1).astype(jnp.int32).reshape(h, w)


def cluster_masks(
    lab: jax.Array, cent: jax.Array, h4: jax.Array, w4: jax.Array,
    k_cap: int,
) -> Tuple[jax.Array, jax.Array]:
    """Rank the distinct centroid-landing clusters ascending into a fixed
    one-hot stack.

    Args:
      lab: [H, W] int32 :func:`min_label_plane` output.
      cent: [2, H, W] int32 converged (y, x) coordinates, clipped to the
        true extent (find_centroids_bounded guarantees this).
      h4, w4: true extent inside the capped grid.
      k_cap: static mask-row capacity.

    Returns:
      (masks [k_cap, H, W] bool — rank-k cluster membership, zero beyond
      the true extent and beyond the distinct-cluster count; n_found
      int32 = min(total distinct clusters, k_cap + 1), so a value of
      k_cap + 1 flags overflow).

    Rank semantics match the host twin exactly
    (ops/centroids.cluster_centroids_from_basin): the escape bucket
    (centroid on no basin) ranks first when present — it maps to -1 here
    and to ``basin_label 0`` there — and components rank by ascending min
    flat index = raster first appearance, the host union-find's id order.
    Only clusters some centroid actually lands on get a rank (components
    receiving no centroid are skipped on both sides)."""
    h, w = lab.shape
    v = _lookup(lab, cent[0], cent[1])
    v = jnp.where(v >= h * w, -1, v)  # escape bucket, ranked first
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    v = jnp.where((rows < h4) & (cols < w4), v, _BIG)

    def step(prev, _):
        u = jnp.min(jnp.where(v > prev, v, _BIG))
        return u, u

    # k_cap + 1 ranks: the extra one only detects overflow
    _, us = jax.lax.scan(step, jnp.int32(-2), None, length=k_cap + 1)
    found = us < _BIG
    masks = (v[None] == us[:k_cap, None, None]) & found[:k_cap, None, None]
    return masks, jnp.sum(found.astype(jnp.int32))


def cluster_from_basin(
    basin: jax.Array, cent: jax.Array, h4: jax.Array, w4: jax.Array,
    k_cap: int,
) -> Tuple[jax.Array, jax.Array]:
    """Full device twin of ``cluster_centroids_from_basin``: basin
    [H, W] bool (the raw ``|dp| < thres`` predicate — out-of-extent
    pixels, where dp is zero-padded, are masked off here), cent as in
    :func:`cluster_masks`. Returns (masks [k_cap, H, W] bool, n_found)."""
    h, w = basin.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    lab = min_label_plane(basin & (rows < h4) & (cols < w4))
    return cluster_masks(lab, cent, h4, w4, k_cap)
