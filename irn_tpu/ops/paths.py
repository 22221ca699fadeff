"""Radial pixel-pair path geometry ("PathIndex").

This is the unifying abstraction of the IRNet pipeline: a set of straight-line
pixel paths from every source pixel to all neighbours within a radius, used
for (a) affinity *labels*, (b) the affinity *loss*, and (c) the random-walk
transition matrix at inference.

Behavioral contract matches the reference geometry
(/root/reference/misc/indexing.py:6-88):

- Direction vectors enumerate a half-plane so each unordered pair is counted
  once: first ``(0, x)`` for ``x in 1..r-1``, then ``(y, x)`` for ``y in
  1..r-1``, ``x in -(r-1)..(r-1)`` with ``x^2 + y^2 < r^2``.
- Each direction's path is the rasterized segment from (0,0) to (dy,dx): all
  integer cells of the bounding box whose squared perpendicular distance to
  the line is < 1, ordered far-to-near (destination first).
- Directions are grouped by path length; groups are ordered by increasing
  length; within a group, directions keep enumeration order.
- On an (H, W) grid the valid source window is
  ``H' = H - rf`` by ``W' = W - 2*rf`` with ``rf = ceil(radius) - 1``,
  offset ``(0, rf)``; a path cell (dy,dx) maps to the flat index of
  ``grid[dy : dy+H', rf+dx : rf+dx+W']``.

Golden figures (checked in tests): radius 10 -> 152 pairs in 20 length
groups (max path length 22); radius 5 -> 34 pairs in 9 groups.

The rebuild departs from the reference representation in one way that
matters on TPU: in addition to the per-length-group index arrays we export a
single *dense* ``(n_pairs, L_max)`` cell table (padded with the destination
cell, which is idempotent under max) plus per-pair destination offsets, so
that device code computes path-max affinities with one ``lax.scan`` of
shifted-window maxes instead of 20 variable-shaped gathers.
"""

from __future__ import annotations

import dataclasses
import functools
import numpy as np


@dataclasses.dataclass(frozen=True)
class PathSet:
    """Grid-independent path geometry for a given radius.

    Attributes:
      radius: search radius (pairs have squared distance < radius^2).
      radius_floor: window margin, ``ceil(radius) - 1``.
      paths_by_length: one int32 array ``[n_dirs_g, L_g, 2]`` of (dy, dx)
        path cells per length group, destination cell first.
      dst_offsets: int32 ``[n_pairs, 2]`` destination (dy, dx) per pair,
        concatenated over length groups (== each path's first cell).
      cells: int32 ``[n_pairs, L_max, 2]`` dense path-cell table, padded by
        repeating the destination cell (safe under max-reduction).
      lengths: int32 ``[n_pairs]`` true path lengths.
    """

    radius: float
    radius_floor: int
    paths_by_length: tuple
    dst_offsets: np.ndarray
    cells: np.ndarray
    lengths: np.ndarray

    @property
    def n_pairs(self) -> int:
        return int(self.dst_offsets.shape[0])

    @property
    def max_path_length(self) -> int:
        return int(self.cells.shape[1])


def _search_directions(radius: int) -> list:
    dirs = []
    for x in range(1, radius):
        dirs.append((0, x))
    for y in range(1, radius):
        for x in range(-radius + 1, radius):
            if x * x + y * y < radius * radius:
                dirs.append((y, x))
    return dirs


def _rasterize(direction) -> list:
    dy, dx = direction
    length_sq = dy * dy + dx * dx
    min_y, max_y = sorted((0, dy))
    min_x, max_x = sorted((0, dx))
    cells = []
    for y in range(min_y, max_y + 1):
        for x in range(min_x, max_x + 1):
            # squared perpendicular distance from cell to the segment's line
            dist_sq = (dy * x - dx * y) ** 2 / length_sq
            if dist_sq < 1:
                cells.append((y, x))
    # far-to-near: destination cell first (stable for ties, matching the
    # reference's stable sort by -(|y|+|x|))
    cells.sort(key=lambda c: -abs(c[0]) - abs(c[1]))
    return cells


@functools.lru_cache(maxsize=None)
def build_path_set(radius: int) -> PathSet:
    """Enumerate all half-plane paths within ``radius`` (pure host precompute).

    ``radius`` must be integral (the reference geometry enumerates
    integer direction grids, misc/indexing.py:18-30); a float-typed
    integral value (10.0 from a config) is accepted and normalized —
    it used to crash in range()."""
    if not float(radius).is_integer():
        raise ValueError(f"radius must be integral, got {radius!r}")
    radius = int(radius)
    radius_floor = int(np.ceil(radius) - 1)
    by_length: dict = {}
    for d in _search_directions(radius):
        cells = _rasterize(d)
        by_length.setdefault(len(cells), []).append(cells)

    lengths_sorted = sorted(by_length.keys())
    groups = tuple(
        np.asarray(by_length[L], dtype=np.int32) for L in lengths_sorted
    )
    dst = np.concatenate([g[:, 0] for g in groups], axis=0)

    n_pairs = int(dst.shape[0])
    l_max = max(lengths_sorted)
    cells = np.zeros((n_pairs, l_max, 2), dtype=np.int32)
    lengths = np.zeros((n_pairs,), dtype=np.int32)
    k = 0
    for g in groups:
        n_g, l_g, _ = g.shape
        cells[k : k + n_g, :l_g] = g
        # pad with the destination cell: max over the path is unchanged
        cells[k : k + n_g, l_g:] = g[:, :1]
        lengths[k : k + n_g] = l_g
        k += n_g

    return PathSet(
        radius=float(radius),
        radius_floor=radius_floor,
        paths_by_length=groups,
        dst_offsets=dst,
        cells=cells,
        lengths=lengths,
    )


@dataclasses.dataclass(frozen=True)
class GridPathIndex:
    """Path geometry bound to a concrete (H, W) grid.

    Attributes:
      size: (H, W) of the grid.
      window: (H', W') of the valid source window.
      path_set: the grid-independent geometry.
      src_indices: int32 ``[P]`` flat grid indices of window pixels
        (P = H' * W').
      dst_indices: int32 ``[n_pairs, P]`` flat grid indices of each pair's
        destination pixel for every window pixel.
      group_indices: per length group, int32 ``[n_dirs_g, L_g, P]`` flat grid
        indices of every path cell for every window pixel (the reference's
        ``path_indices`` layout, kept for parity tests and label extraction).
    """

    size: tuple
    window: tuple
    path_set: PathSet
    src_indices: np.ndarray
    dst_indices: np.ndarray
    group_indices: tuple

    @property
    def n_window_pixels(self) -> int:
        return int(self.src_indices.shape[0])


def build_grid_index(path_set: PathSet, size) -> GridPathIndex:
    """Bind a PathSet to an (H, W) grid, precomputing flat gather indices."""
    h, w = int(size[0]), int(size[1])
    rf = path_set.radius_floor
    ch = h - rf
    cw = w - 2 * rf
    if ch <= 0 or cw <= 0:
        raise ValueError(
            f"grid {size} too small for radius {path_set.radius} (window {ch}x{cw})"
        )
    # int32 per the class contract (grids are <= a few thousand px per
    # side, far under 2^31 flat indices); was silently int64
    full = np.arange(h * w, dtype=np.int32).reshape(h, w)

    def window_at(dy: int, dx: int) -> np.ndarray:
        return full[dy : dy + ch, rf + dx : rf + dx + cw].reshape(-1)

    group_indices = []
    for g in path_set.paths_by_length:
        grp = np.stack(
            [
                np.stack([window_at(dy, dx) for dy, dx in path], axis=0)
                for path in g
            ],
            axis=0,
        )
        group_indices.append(grp)

    src = window_at(0, 0)
    dst = np.concatenate([g[:, 0] for g in group_indices], axis=0)

    return GridPathIndex(
        size=(h, w),
        window=(ch, cw),
        path_set=path_set,
        src_indices=src,
        dst_indices=dst,
        group_indices=tuple(group_indices),
    )


def unique_cells(path_set: PathSet):
    """Deduplicated path cells across all pairs (test oracle).

    Returns:
      cells_u: int32 ``[U, 2]`` unique (dy, dx) cells.
      cell_table: int32 ``[n_pairs, L_max]`` index into ``cells_u`` per path
        position (padded positions repeat the destination's unique id).

    Historical note: this fed an abandoned scan-over-unique-cell-windows
    device strategy; the production path-max is now fully-unrolled
    shifted-window chains (ops/affinity._path_max). Kept as the
    dedup-consistency oracle for tests/test_paths.py.
    """
    flat = path_set.cells.reshape(-1, 2)
    cells_u, inverse = np.unique(flat, axis=0, return_inverse=True)
    cell_table = inverse.reshape(path_set.cells.shape[:2]).astype(np.int32)
    return cells_u.astype(np.int32), cell_table
