"""Golden tests for the path geometry against the reference PathIndex.

The reference class (/root/reference/misc/indexing.py:6-88) is pure NumPy, so
it can be instantiated directly for index-level comparison without any CUDA.
"""

import sys

import numpy as np
import pytest

from irn_tpu.ops import paths

from conftest import requires_reference, REFERENCE_ROOT


def test_pair_counts_radius10():
    ps = paths.build_path_set(10)
    assert ps.n_pairs == 152
    assert len(ps.paths_by_length) == 20
    assert ps.max_path_length == 22
    assert ps.radius_floor == 9


def test_pair_counts_radius5():
    ps = paths.build_path_set(5)
    assert ps.n_pairs == 34
    assert len(ps.paths_by_length) == 9
    assert ps.radius_floor == 4


def test_dst_offsets_within_radius():
    ps = paths.build_path_set(10)
    d2 = (ps.dst_offsets.astype(np.int64) ** 2).sum(axis=1)
    assert (d2 < 100).all()
    assert (d2 >= 1).all()
    # half-plane: dy > 0, or dy == 0 and dx > 0
    dy, dx = ps.dst_offsets[:, 0], ps.dst_offsets[:, 1]
    assert ((dy > 0) | ((dy == 0) & (dx > 0))).all()
    # unordered pairs counted once
    assert len({(int(a), int(b)) for a, b in ps.dst_offsets}) == ps.n_pairs


def test_cells_padding_is_destination():
    ps = paths.build_path_set(5)
    for k in range(ps.n_pairs):
        L = int(ps.lengths[k])
        assert (ps.cells[k, L:] == ps.cells[k, :1]).all()
        # destination first
        assert (ps.cells[k, 0] == ps.dst_offsets[k]).all()
        # path terminates at the source (0, 0)
        assert (ps.cells[k, L - 1] == 0).all()


def test_window_geometry():
    ps = paths.build_path_set(5)
    gi = paths.build_grid_index(ps, (16, 20))
    assert gi.window == (16 - 4, 20 - 8)
    assert gi.src_indices.shape == (12 * 12,)
    assert gi.dst_indices.shape == (34, 144)
    # src window flat ids are grid[0:12, 4:16]
    full = np.arange(16 * 20).reshape(16, 20)
    np.testing.assert_array_equal(
        gi.src_indices, full[0:12, 4:16].reshape(-1)
    )


def test_unique_cells_roundtrip():
    ps = paths.build_path_set(10)
    cells_u, table = paths.unique_cells(ps)
    np.testing.assert_array_equal(cells_u[table], ps.cells)
    assert cells_u.shape[0] < ps.n_pairs * ps.max_path_length


@requires_reference
@pytest.mark.parametrize("radius,size", [(10, (32, 32)), (5, (21, 26))])
def test_matches_reference_pathindex(radius, size):
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        from misc.indexing import PathIndex  # reference, pure numpy
    finally:
        sys.path.pop(0)

    ref = PathIndex(radius=radius, default_size=size)
    ps = paths.build_path_set(radius)
    gi = paths.build_grid_index(ps, size)

    assert len(ref.path_indices) == len(gi.group_indices)
    for ref_g, new_g in zip(ref.path_indices, gi.group_indices):
        np.testing.assert_array_equal(np.asarray(ref_g), new_g)
    np.testing.assert_array_equal(ref.src_indices, gi.src_indices)
    np.testing.assert_array_equal(ref.dst_indices, gi.dst_indices)
    np.testing.assert_array_equal(ref.search_dst, ps.dst_offsets)
