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


def _shift(a: jax.Array, axis: int, off: int, fill) -> jax.Array:
    """``a`` displaced by ``off`` along ``axis`` (out[i] = a[i - off]),
    vacated edge filled with ``fill`` — shaped like jnp.roll but without
    the wraparound (component adjacency never crosses the image border)."""
    pad = [(0, 0)] * a.ndim
    pad[axis] = (max(off, 0), max(-off, 0))
    padded = jnp.pad(a, pad, constant_values=fill)
    idx = [slice(None)] * a.ndim
    n = a.shape[axis]
    idx[axis] = slice(0, n) if off >= 0 else slice(-n, None)
    return padded[tuple(idx)]


def min_label_plane_multi(labels: jax.Array) -> jax.Array:
    """[H, W] int32 map (0 = background) -> [H, W] int32: each nonzero
    pixel carries the minimum flat index of its 4-connected SAME-VALUE
    component; background carries the sentinel ``H*W``.

    The multi-label generalization of :func:`min_label_plane`: segment
    breaks fall wherever the scan-direction neighbor holds a different
    value (or the pixel is background), so min propagation never crosses
    a label boundary — per-value components label exactly as if each
    value's mask ran :func:`min_label_plane` alone, which is how the host
    twin splits them (ops/centroids.split_components runs
    cc.label_components per decoded row; components of an argmax map
    cannot cross rows). Same fixpoint/exactness argument as the
    single-mask variant; breaks differ per scan direction (the neighbor
    "before" each element is direction-dependent)."""
    h, w = labels.shape
    iota = (
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
        + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    )
    bg = labels <= 0
    lab0 = jnp.where(bg, jnp.int32(h * w), iota)

    def brk(axis, reverse):
        nb = _shift(labels, axis, -1 if reverse else 1, -1)
        return bg | (labels != nb)

    brks = [
        (1, False, brk(1, False)),
        (1, True, brk(1, True)),
        (0, False, brk(0, False)),
        (0, True, brk(0, True)),
    ]

    def sweep(lab):
        for axis, reverse, b in brks:
            lab = _seg_cummin(lab, b, axis=axis, reverse=reverse)
        return lab

    def body(carry):
        lab, _ = carry
        nxt = sweep(lab)
        return nxt, jnp.any(nxt != lab)

    lab, _ = jax.lax.while_loop(
        lambda c: c[1], body, (lab0, jnp.bool_(True))
    )
    return lab


def component_tables(
    labels: jax.Array, best: jax.Array, comp_cap: int,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Device twin of the instance stage's host component split + score
    reduction (ops/centroids.split_components + ``np.maximum.at``,
    mirroring the reference's per-mask ``skimage.measure.label`` +
    per-segment max, make_ins_seg_labels.py:82-105): components of the
    decoded label map, globally numbered by (ascending label value,
    ascending min flat index) — exactly the host's per-row union-find
    ids concatenated with per-row offsets, since union-find numbering is
    raster first appearance = ascending min flat index.

    Args:
      labels: [H, W] int32 decoded walk output, 0 = background.
      best: [H, W] f32 per-pixel winning score (labels' argmax row score).
      comp_cap: static component capacity.

    Returns:
      (comp_map [H, W] int32 ids 1..n (0 = background, 0 past the cap),
      rows [comp_cap] int32 — each component's seed row, label value - 1;
      sizes [comp_cap] int32 pixel counts; scores [comp_cap] f32
      per-component max of ``best``; n_comp int32 = min(total components,
      comp_cap + 1) — comp_cap + 1 flags overflow, callers fall back to
      the host path)."""
    h, w = labels.shape
    assert (1 << 31) // (h * w + 1) > 256, (h, w)  # key = label*HW + idx
    minidx = min_label_plane_multi(labels)
    key = jnp.where(labels > 0, labels * (h * w) + minidx, _BIG)

    def step(prev, _):
        u = jnp.min(jnp.where(key > prev, key, _BIG))
        return u, u

    # comp_cap + 1 ranks: the extra one only detects overflow
    _, us = jax.lax.scan(step, jnp.int32(-1), None, length=comp_cap + 1)
    found = us < _BIG
    n_comp = jnp.sum(found.astype(jnp.int32))
    usk = us[:comp_cap]
    # found gating: past-exhaustion ranks hold _BIG, which would "match"
    # every background pixel (key = _BIG there)
    eq = (
        key[None] == usk[:, None, None]
    ) & found[:comp_cap, None, None]  # [comp_cap, H, W]
    ranks = jnp.arange(1, comp_cap + 1, dtype=jnp.int32)
    comp_map = jnp.sum(eq * ranks[:, None, None], axis=0)
    sizes = jnp.sum(eq, axis=(1, 2), dtype=jnp.int32)
    scores = jnp.max(
        jnp.where(eq, best[None].astype(jnp.float32), 0.0), axis=(1, 2)
    )
    rows = jnp.where(found[:comp_cap], usk // (h * w) - 1, 0)
    return comp_map, rows, sizes, scores, n_comp


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
