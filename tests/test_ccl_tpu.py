"""Device CCL (ops/ccl_tpu) parity vs the host union-find twin.

The stage contract: make_ins_seg's device clustering must produce the
SAME instance one-hot masks as ops/centroids.cluster_centroids_from_basin
(itself pinned against the reference's skimage.measure.label semantics,
step/make_ins_seg_labels.py:66), including id ORDER — components rank by
raster first appearance = ascending min flat index, escape bucket first.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from irn_tpu.ops import cc
from irn_tpu.ops import ccl_tpu
from irn_tpu.ops.centroids import cluster_centroids_from_basin


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _host_min_plane(mask):
    """Oracle: per-component min flat index from the host union-find."""
    h, w = mask.shape
    lab, k = cc.label_components(mask.astype(np.uint8))
    out = np.full((h, w), h * w, np.int32)
    flat = lab.reshape(-1)
    for comp in range(1, k + 1):
        idx = np.flatnonzero(flat == comp)
        out.reshape(-1)[idx] = idx.min()
    return out


@pytest.mark.parametrize("p", [0.2, 0.5, 0.8])
@pytest.mark.parametrize("shape", [(16, 16), (13, 21)])
def test_min_label_plane_random(rng, p, shape):
    mask = rng.random(shape) < p
    got = np.asarray(ccl_tpu.min_label_plane(jnp.asarray(mask)))
    np.testing.assert_array_equal(got, _host_min_plane(mask))


def test_min_label_plane_spiral():
    """A spiral needs many sweeps (each adds one geodesic turn) — pins the
    while_loop's run-to-fixpoint exactness, not a fixed sweep count."""
    h = w = 17
    mask = np.zeros((h, w), bool)
    top, bot, lef, rig = 0, h - 1, 0, w - 1
    while top <= bot and lef <= rig:
        mask[top, lef : rig + 1] = True
        mask[top : bot + 1, rig] = True
        mask[bot, lef : rig + 1] = True
        # leave a gap so the spiral stays one path, not nested rings
        mask[top + 2 : bot + 1, lef] = True
        top += 2
        bot -= 2
        lef += 2
        rig -= 2
    got = np.asarray(ccl_tpu.min_label_plane(jnp.asarray(mask)))
    np.testing.assert_array_equal(got, _host_min_plane(mask))


def test_min_label_plane_empty_and_full():
    for mask in (np.zeros((8, 8), bool), np.ones((8, 8), bool)):
        got = np.asarray(ccl_tpu.min_label_plane(jnp.asarray(mask)))
        np.testing.assert_array_equal(got, _host_min_plane(mask))


def _random_case(rng, h, w, h4, w4, p=0.25):
    """(basin [h, w] with padding junk beyond extent, cent clipped to the
    true extent) — mirrors what the advection program hands the device
    clustering: dp is zero beyond extent so the raw basin predicate is
    True there, and centroids are clipped inside."""
    basin = rng.random((h, w)) < p
    basin[h4:, :] = True  # the |0| < 2.5 padding artifact
    basin[:, w4:] = True
    cy = rng.integers(0, h4, (h, w)).astype(np.int32)
    cx = rng.integers(0, w4, (h, w)).astype(np.int32)
    return basin, np.stack([cy, cx])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cluster_parity_vs_host(seed):
    rng = np.random.default_rng(seed)
    h, w, h4, w4 = 24, 32, 19, 27
    basin, cent = _random_case(rng, h, w, h4, w4)
    k_cap = 64  # roomy: this test pins values, not overflow
    masks, n_found = jax.jit(
        ccl_tpu.cluster_from_basin, static_argnums=4
    )(jnp.asarray(basin), jnp.asarray(cent), jnp.int32(h4), jnp.int32(w4),
      k_cap)
    masks = np.asarray(masks)
    n_found = int(n_found)

    host = cluster_centroids_from_basin(
        cent[:, :h4, :w4], basin[:h4, :w4].astype(np.uint8)
    )  # [K, h4, w4] bool one-hot, escape bucket first when present
    k = host.shape[0]
    assert n_found == k
    np.testing.assert_array_equal(masks[:k, :h4, :w4], host)
    assert not masks[k:].any()
    assert not masks[:, h4:, :].any() and not masks[:, :, w4:].any()


def test_cluster_escape_bucket_first(rng):
    """All centroids on one basin except escapees -> rank 0 is the escape
    bucket (host: compress_range puts clusters==0 first)."""
    h = w = 16
    basin = np.zeros((h, w), bool)
    basin[4:8, 4:8] = True
    cy = np.full((h, w), 5, np.int32)
    cx = np.full((h, w), 5, np.int32)
    cy[0], cx[0] = 0, 0  # row 0 escapes (0, 0) is not basin
    cent = np.stack([cy, cx])
    masks, n_found = ccl_tpu.cluster_from_basin(
        jnp.asarray(basin), jnp.asarray(cent), jnp.int32(h), jnp.int32(w), 4
    )
    masks = np.asarray(masks)
    assert int(n_found) == 2
    host = cluster_centroids_from_basin(cent, basin.astype(np.uint8))
    np.testing.assert_array_equal(masks[:2], host)


def test_cluster_overflow_flag():
    """More distinct clusters than k_cap -> n_found == k_cap + 1 (the
    stage's signal to fall back to the exact host path)."""
    h = w = 16
    basin = np.zeros((h, w), bool)
    basin[::2, ::2] = True  # 64 singleton components
    cy, cx = np.mgrid[:h, :w].astype(np.int32)
    cy, cx = cy & ~1, cx & ~1  # every pixel lands on its nearest singleton
    cent = np.stack([cy, cx])
    k_cap = 5
    masks, n_found = ccl_tpu.cluster_from_basin(
        jnp.asarray(basin), jnp.asarray(cent), jnp.int32(h), jnp.int32(w),
        k_cap,
    )
    assert int(n_found) == k_cap + 1
    # the first k_cap ranks are still exact
    host = cluster_centroids_from_basin(cent, basin.astype(np.uint8))
    np.testing.assert_array_equal(np.asarray(masks), host[:k_cap])


def _host_multi_min_plane(labels):
    """Oracle for min_label_plane_multi: per label value, the single-mask
    host min plane, combined (components of an int map cannot cross
    values)."""
    h, w = labels.shape
    out = np.full((h, w), h * w, np.int32)
    for v in np.unique(labels):
        if v <= 0:
            continue
        m = labels == v
        out[m] = _host_min_plane(m)[m]
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n_vals", [1, 3, 7])
def test_min_label_plane_multi_random(seed, n_vals):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, n_vals + 1, (21, 17)).astype(np.int32)
    got = np.asarray(ccl_tpu.min_label_plane_multi(jnp.asarray(labels)))
    np.testing.assert_array_equal(got, _host_multi_min_plane(labels))


def test_min_label_plane_multi_touching_labels():
    """Different nonzero values sharing every border must NOT merge: a
    label-1 spiral interleaved with label-2 filling its gaps — min
    propagation has to break at value boundaries in all four scan
    directions, and the spiral still needs the full fixpoint."""
    h = w = 17
    mask = np.zeros((h, w), bool)
    top, bot, lef, rig = 0, h - 1, 0, w - 1
    while top <= bot and lef <= rig:
        mask[top, lef : rig + 1] = True
        mask[top : bot + 1, rig] = True
        mask[bot, lef : rig + 1] = True
        mask[top + 2 : bot + 1, lef] = True
        top += 2
        bot -= 2
        lef += 2
        rig -= 2
    labels = np.where(mask, 1, 2).astype(np.int32)
    got = np.asarray(ccl_tpu.min_label_plane_multi(jnp.asarray(labels)))
    np.testing.assert_array_equal(got, _host_multi_min_plane(labels))


def _host_component_tables(labels, best):
    """Oracle: the stage's host decode tail (split_components +
    np.maximum.at), the exact semantics _finish_monosplit must match."""
    from irn_tpu.ops.centroids import split_components

    comp_map, comp_rows, comp_sizes = split_components(
        labels, int(labels.max(initial=0))
    )
    k = comp_rows.shape[0]
    scores = np.zeros(k + 1, np.float32)
    np.maximum.at(scores, comp_map.reshape(-1), best.reshape(-1))
    return comp_map, comp_rows, comp_sizes, scores[1:]


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize(
    "blobby,cap",
    [(True, 64), (False, 400)],  # blobby scenes vs speckle noise (many
    # hundreds of single-pixel components — the cap just has to cover
    # them; production sizes the cap for walked blobs and falls back
    # past it)
)
def test_component_tables_parity(seed, blobby, cap):
    rng = np.random.default_rng(seed)
    h, w = 24, 32
    if blobby:
        labels = np.kron(
            rng.integers(0, 4, (h // 4, w // 4)), np.ones((4, 4), int)
        ).astype(np.int32)
    else:
        labels = rng.integers(0, 4, (h, w)).astype(np.int32)
    best = rng.random((h, w)).astype(np.float32)
    cmap, rows, sizes, scores, n_comp = [
        np.asarray(x)
        for x in jax.jit(ccl_tpu.component_tables, static_argnums=2)(
            jnp.asarray(labels), jnp.asarray(best), cap
        )
    ]
    h_map, h_rows, h_sizes, h_scores = _host_component_tables(labels, best)
    k = h_rows.shape[0]
    assert int(n_comp) == k <= cap
    np.testing.assert_array_equal(cmap, h_map)
    np.testing.assert_array_equal(rows[:k], h_rows)
    np.testing.assert_array_equal(sizes[:k], h_sizes)
    # same f32 values reduced by max on both sides: bitwise equal
    np.testing.assert_array_equal(scores[:k], h_scores)
    assert not rows[k:].any() and not sizes[k:].any()


def test_component_tables_overflow():
    """More components than the cap -> n_comp == cap + 1 (the stage's
    fall-back-to-host signal); the first cap entries stay exact."""
    labels = np.zeros((16, 16), np.int32)
    labels[::2, ::2] = 1  # 64 singleton components of one label
    best = np.linspace(0, 1, 256, dtype=np.float32).reshape(16, 16)
    cap = 5
    cmap, rows, sizes, scores, n_comp = [
        np.asarray(x)
        for x in ccl_tpu.component_tables(
            jnp.asarray(labels), jnp.asarray(best), cap
        )
    ]
    assert int(n_comp) == cap + 1
    h_map, h_rows, h_sizes, h_scores = _host_component_tables(labels, best)
    np.testing.assert_array_equal(rows, h_rows[:cap])
    np.testing.assert_array_equal(sizes, h_sizes[:cap])
    np.testing.assert_array_equal(scores, h_scores[:cap])
    # ids past the cap report 0 in the map (callers discard it on overflow)
    np.testing.assert_array_equal(cmap[h_map <= cap], h_map[h_map <= cap])
    assert (cmap[h_map > cap] == 0).all()


def test_component_tables_empty():
    labels = np.zeros((8, 8), np.int32)
    best = np.ones((8, 8), np.float32)
    cmap, rows, sizes, scores, n_comp = [
        np.asarray(x)
        for x in ccl_tpu.component_tables(
            jnp.asarray(labels), jnp.asarray(best), 4
        )
    ]
    assert int(n_comp) == 0
    assert not cmap.any() and not rows.any() and not sizes.any()
    assert not scores.any()


def test_cluster_empty_basin():
    """Everything escapes -> one all-extent bucket, like the host's
    [1, h, w] all-ones one-hot."""
    h, w, h4, w4 = 8, 8, 6, 7
    basin = np.zeros((h, w), bool)
    cent = np.zeros((2, h, w), np.int32)
    masks, n_found = ccl_tpu.cluster_from_basin(
        jnp.asarray(basin), jnp.asarray(cent), jnp.int32(h4), jnp.int32(w4),
        3,
    )
    masks = np.asarray(masks)
    assert int(n_found) == 1
    expect = np.zeros((h, w), bool)
    expect[:h4, :w4] = True
    np.testing.assert_array_equal(masks[0], expect)
    assert not masks[1:].any()
