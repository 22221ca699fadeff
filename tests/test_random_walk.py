"""Random-walk propagation tests against an independent NumPy oracle that
follows the reference algorithm literally (pad -> affinity -> dense scatter
-> crop -> pow/normalize -> repeated squaring -> damped seed matmul,
misc/indexing.py:141-166), including the crop-before-normalize step our
capped implementation proves unnecessary."""

import jax.numpy as jnp
import numpy as np
import pytest

from irn_tpu.ops import paths
from irn_tpu.ops.affinity import affinity_labels, edge_to_affinity
from irn_tpu.ops import random_walk as rw_mod


def oracle_propagate(cam, edge, radius, beta, exp_times):
    """Literal reference semantics in NumPy (float64 for stability)."""
    c, h, w = cam.shape
    ph, pw = h + radius, w + 2 * radius
    epad = np.ones((ph, pw), np.float64)
    epad[:h, radius : radius + w] = edge

    ps = paths.build_path_set(radius)
    gi = paths.build_grid_index(ps, (ph, pw))
    eflat = epad.reshape(-1)
    aff = np.concatenate(
        [1.0 - eflat[g].max(axis=1) for g in gi.group_indices], axis=0
    )  # [n_pairs, P]

    n = ph * pw
    a = np.zeros((n, n), np.float64)
    srcs = np.broadcast_to(gi.src_indices[None], gi.dst_indices.shape).ravel()
    dsts = gi.dst_indices.ravel()
    a[srcs, dsts] = aff.ravel()
    a = a + a.T
    np.fill_diagonal(a, 1.0)
    # reference crops the padding ring before normalization (indexing.py:157)
    a = a.reshape(ph, pw, ph, pw)[:h, radius : radius + w, :h, radius : radius + w]
    a = a.reshape(h * w, h * w)

    a = a**beta
    t = a / a.sum(axis=0, keepdims=True)
    for _ in range(exp_times):
        t = t @ t
    x = (cam * (1.0 - edge)[None]).reshape(c, -1)
    return (x @ t).reshape(c, h, w)


def test_edge_to_affinity_bruteforce(rng):
    ps = paths.build_path_set(5)
    gi = paths.build_grid_index(ps, (12, 16))
    edge = rng.random((12, 16)).astype(np.float32)
    got = np.asarray(edge_to_affinity(edge.reshape(-1), gi))
    eflat = edge.reshape(-1)
    want = np.concatenate(
        [1.0 - eflat[g].max(axis=1) for g in gi.group_indices], axis=0
    )
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_affinity_labels_bruteforce(rng):
    ps = paths.build_path_set(5)
    gi = paths.build_grid_index(ps, (12, 16))
    label = rng.choice(
        np.array([0, 1, 2, 255], np.int32), size=(12 * 16,), p=[0.4, 0.25, 0.25, 0.1]
    )
    bg, fg, neg = affinity_labels(label, gi.src_indices, gi.dst_indices)
    ls = label[gi.src_indices][None]
    lt = label[gi.dst_indices]
    valid = (ls < 21) & (lt < 21)
    eq = ls == lt
    np.testing.assert_array_equal(np.asarray(bg), ((eq & valid) & (ls == 0)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(fg), ((eq & valid) & (ls > 0)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(neg), ((~eq) & valid).astype(np.float32))


def test_transition_is_column_stochastic(rng):
    geom = rw_mod.build_geometry(12, 12, radius=5)
    edge = rng.random((12, 12)).astype(np.float32)
    a = rw_mod.dense_affinity(geom, edge)
    t = rw_mod.transition_matrix(a, beta=4, exp_times=0)
    np.testing.assert_allclose(np.asarray(t).sum(axis=0), 1.0, atol=1e-4)


@pytest.mark.parametrize("exp_times", [0, 3])
def test_propagate_matches_oracle_exact_cap(rng, exp_times):
    h = w = 12
    cam = rng.random((3, h, w)).astype(np.float32)
    edge = rng.random((h, w)).astype(np.float32) * 0.9
    want = oracle_propagate(cam, edge, radius=5, beta=6, exp_times=exp_times)

    geom = rw_mod.build_geometry(h, w, radius=5)
    got = np.asarray(
        rw_mod.propagate(geom, cam, edge, beta=6, exp_times=exp_times)
    )
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-3)


def test_propagate_matches_oracle_padded_cap(rng):
    """True extent (10, 9) inside a (16, 12) cap must reproduce the
    exact-size reference computation on the interior."""
    h, w = 10, 9
    cap_h, cap_w = 16, 12
    cam = rng.random((2, h, w)).astype(np.float32)
    edge = rng.random((h, w)).astype(np.float32) * 0.9
    want = oracle_propagate(cam, edge, radius=5, beta=6, exp_times=2)

    cam_c = np.zeros((2, cap_h, cap_w), np.float32)
    cam_c[:, :h, :w] = cam
    edge_c = np.ones((cap_h, cap_w), np.float32)
    edge_c[:h, :w] = edge
    geom = rw_mod.build_geometry(cap_h, cap_w, radius=5)
    got = np.asarray(rw_mod.propagate(geom, cam_c, edge_c, beta=6, exp_times=2))
    np.testing.assert_allclose(got[:, :h, :w], want, atol=5e-5, rtol=1e-3)
    # out-of-extent stays (near) zero
    assert np.abs(got[:, h:, :]).max() < 1e-6
    assert np.abs(got[:, :, w:]).max() < 1e-6


def test_decode_matches_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    h4, w4, h0, w0 = 10, 9, 37, 33
    cap = 12
    c = 4
    rw = rng.random((c, h4, w4)).astype(np.float32)
    bg_thres = 0.35

    rw_t = torch.from_numpy(rw)[None]
    up = F.interpolate(rw_t, scale_factor=4, mode="bilinear", align_corners=False)
    up = up[0, :, :h0, :w0]
    up = up / torch.max(up)
    padded = F.pad(up, (0, 0, 0, 0, 1, 0), value=bg_thres)
    want = torch.argmax(padded, dim=0).numpy()

    rw_c = np.zeros((c, cap, cap), np.float32)
    rw_c[:, :h4, :w4] = rw
    labels, _, _ = rw_mod.upsample_and_decode(rw_c, h4, w4, h0, w0, bg_thres)
    got = np.asarray(labels)[:h0, :w0]
    np.testing.assert_array_equal(got, want)


def test_matpow_path_selection(monkeypatch):
    """IRN_TPU_MATPOW selects the squaring path; Pallas kernels are
    TPU-only so other backends fall back to XLA; bad values are loud."""
    from irn_tpu.ops import matpow

    monkeypatch.delenv("IRN_TPU_MATPOW", raising=False)
    assert matpow.selected_path() == "xla"
    monkeypatch.setenv("IRN_TPU_MATPOW", "fused")
    assert matpow.selected_path() == "xla"  # CPU backend in tests
    monkeypatch.setenv("IRN_TPU_MATPOW", "bogus")
    with pytest.raises(ValueError):
        matpow.selected_path()


@pytest.mark.parametrize("square_times", [0, 1, 2])
def test_hybrid_square_apply_matches_pure_squaring(rng, square_times):
    """x @ T^(2^E) evaluated as 2^(E-e) applications of T^(2^e) equals the
    pure-squaring evaluation (same operator, fewer FLOPs) to fp noise."""
    geom = rw_mod.build_geometry(12, 12, radius=2)
    h4 = w4 = 10
    edge = np.ones((12, 12), np.float32)
    edge[:h4, :w4] = rng.random((h4, w4)).astype(np.float32)
    cam = np.zeros((3, 12, 12), np.float32)
    cam[:, :h4, :w4] = rng.random((3, h4, w4))

    pure = np.asarray(
        rw_mod.propagate(geom, cam, edge, beta=10, exp_times=3)
    )
    hybrid = np.asarray(
        rw_mod.propagate(
            geom, cam, edge, beta=10, exp_times=3, square_times=square_times
        )
    )
    np.testing.assert_allclose(hybrid, pure, atol=1e-6, rtol=1e-5)


def test_pick_square_times_bounds():
    for n in (512, 14336, 18432):
        for chunks in (1, 4):
            for md in (None, "bf16"):
                e = rw_mod.pick_square_times(n, 8, chunks, md)
                assert 0 <= e <= 8
    # pure squaring recovered at e = exp_times when applications are free
    assert rw_mod.pick_square_times(18432, 0) == 0


def test_banded_kernels_match_dense(rng):
    """Interpret-mode banded Pallas kernels vs dense references: in-band
    squaring agreement and full propagate parity (out-of-band unspecified
    blocks never leak into the propagated scores)."""
    from irn_tpu.ops.matpow_pallas import square_banded

    n, bs, h = 768, 128, 130
    r = np.arange(n)
    band = np.abs(r[:, None] - r[None, :]) <= h
    a = np.zeros((n, n), np.float32)
    a[band] = rng.random(band.sum(), dtype=np.float32)
    want = a @ a
    got = np.asarray(square_banded(jnp.asarray(a), h, bs=bs, interpret=True))
    inband = np.abs(r[:, None] - r[None, :]) <= 2 * h
    np.testing.assert_allclose(got[inband], want[inband], atol=1e-4)

    geom = rw_mod.build_geometry(24, 24, radius=2)
    assert geom.n_pad % 128 == 0
    h4 = w4 = 20
    edge = np.ones((24, 24), np.float32)
    edge[:h4, :w4] = rng.random((h4, w4)).astype(np.float32)
    cam = np.zeros((3, 24, 24), np.float32)
    cam[:, :h4, :w4] = rng.random((3, h4, w4))
    assert rw_mod.banded_fits(geom, 3, 2, bs=128)
    dense = np.asarray(
        rw_mod.propagate(geom, cam, edge, beta=10, exp_times=3,
                         square_times=2)
    )
    banded = np.asarray(
        rw_mod.propagate_banded(geom, cam, edge, beta=10, exp_times=3,
                                square_times=2, bs=128, interpret=True)
    )
    np.testing.assert_allclose(banded, dense, atol=1e-5, rtol=1e-4)


def test_propagate_diag_matches_dense(rng):
    """The e=0 diagonal-stencil path (the TPU production default) equals
    the dense f32 schedule: T before any squaring has only 2*n_pairs+1
    nonzero diagonals, and the stencil applies exactly those — no matrix,
    no bf16 rounding of T. Also pins the propagate_banded dispatch: at
    square_times=0 with the default impl it routes to the stencil
    (bit-identical to propagate_diag), and the chunk-reusable
    build/apply split equals the fused call bit-for-bit."""
    geom = rw_mod.build_geometry(24, 24, radius=2)
    h4 = w4 = 20
    edge = np.ones((24, 24), np.float32)
    edge[:h4, :w4] = rng.random((h4, w4)).astype(np.float32)
    cam = np.zeros((3, 24, 24), np.float32)
    cam[:, :h4, :w4] = rng.random((3, h4, w4))
    dense = np.asarray(
        rw_mod.propagate(geom, cam, edge, beta=10, exp_times=3,
                         square_times=0)
    )
    diag = np.asarray(
        rw_mod.propagate_diag(geom, cam, edge, beta=10, exp_times=3)
    )
    np.testing.assert_allclose(diag, dense, atol=1e-5, rtol=1e-4)

    via_banded = np.asarray(
        rw_mod.propagate_banded(geom, cam, edge, beta=10, exp_times=3,
                                square_times=0)
    )
    np.testing.assert_array_equal(via_banded, diag)

    winv = rw_mod.build_diag_operator(geom, jnp.asarray(edge), beta=10)
    split = np.asarray(rw_mod.apply_transition_diag(
        geom, jnp.asarray(cam), jnp.asarray(edge), winv, 1 << 3
    ))
    np.testing.assert_array_equal(split, diag)


def test_banded_fits_gates():
    geom = rw_mod.build_geometry(16, 16, radius=2)
    # tiny grid: band covers the matrix -> dense fallback required
    assert not rw_mod.banded_fits(geom, 3, 2, bs=512)


def test_pack_banded_matches_dynamic_slices(rng):
    """The block-diagonal pack equals the literal per-column slice of the
    zero-row-padded matrix (tile j = rows [j*bs - kh*bs, j*bs + (kh+1)*bs)
    of column block j)."""
    from irn_tpu.ops.matpow_pallas import pack_banded

    n, bs, h = 1024, 128, 200
    kh = -(-h // bs)
    t = rng.random((n, n), dtype=np.float32)
    got = np.asarray(pack_banded(jnp.asarray(t), h, bs, interpret=True))
    tpad = np.pad(t, ((kh * bs, kh * bs), (0, 0)))
    for j in range(n // bs):
        want = tpad[j * bs : j * bs + (2 * kh + 1) * bs,
                    j * bs : (j + 1) * bs]
        np.testing.assert_array_equal(got[j], want, err_msg=str(j))


def test_apply_chain_rect_tiles_ignore_out_of_band_garbage(rng):
    """Rectangular (bj > bs) apply tiles can straddle square_banded's
    written-band boundary; the operand-downcast band mask must keep the
    unspecified fill out of the result. Poison is planted exactly where
    the contract allows it: beyond the written square-block band."""
    from irn_tpu.ops.matpow_pallas import apply_banded_chain

    n, bs, h = 1024, 128, 130
    r = np.arange(n)
    band = np.abs(r[:, None] - r[None, :]) <= h
    t = np.zeros((n, n), np.float32)
    t[band] = rng.random(band.sum(), dtype=np.float32) * 0.01
    tp = t.copy()
    kh = -(-h // bs)
    bi = r // bs
    written = np.abs(bi[:, None] - bi[None, :]) <= kh
    tp[~written] = 1e6
    x = rng.random((8, n), dtype=np.float32)
    want = x @ t @ t @ t @ t
    for bsz, bj in [(128, 128), (128, 512), (256, 512)]:
        got = np.asarray(
            apply_banded_chain(jnp.asarray(x), jnp.asarray(tp), h, 4,
                               bs=bsz, bj=bj, interpret=True)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_apply_chain_xla_matches_pallas(rng):
    """The windowed-einsum chain (impl='xla', the TPU default) is
    bit-identical to the Pallas packed chain: same packed tiles, same f32
    accumulation, same f32->operand-dtype carry rounding between
    applications. Checked in both f32 and bf16 operand modes."""
    from irn_tpu.ops.matpow_pallas import apply_banded_chain

    n, bs, h = 1024, 128, 130
    r = np.arange(n)
    band = np.abs(r[:, None] - r[None, :]) <= h
    t = np.zeros((n, n), np.float32)
    t[band] = rng.random(band.sum(), dtype=np.float32) * 0.01
    t /= t.sum(0, keepdims=True)
    x = rng.random((8, n), dtype=np.float32)
    for dt in (None, jnp.bfloat16):
        pallas = np.asarray(apply_banded_chain(
            jnp.asarray(x), jnp.asarray(t), h, 4, matmul_dtype=dt,
            bs=bs, interpret=True, impl="pallas",
        ))
        xla = np.asarray(apply_banded_chain(
            jnp.asarray(x), jnp.asarray(t), h, 4, matmul_dtype=dt,
            bs=bs, interpret=True, impl="xla",
        ))
        np.testing.assert_array_equal(xla, pallas, err_msg=str(dt))


def test_batched_apply_chain_matches_per_image(rng):
    """apply_banded_chain_batched == per-image apply_banded_chain (the
    batched grid only changes the tile walk), and the full
    propagate_banded_batch == per-image propagate_banded."""
    from irn_tpu.ops.matpow_pallas import (
        apply_banded_chain,
        apply_banded_chain_batched,
    )

    n, bs, h, bimg = 1024, 128, 130, 3
    r = np.arange(n)
    band = np.abs(r[:, None] - r[None, :]) <= h
    ts, xs = [], []
    for _ in range(bimg):
        t = np.zeros((n, n), np.float32)
        t[band] = rng.random(band.sum(), dtype=np.float32) * 0.01
        ts.append(t)
        xs.append(rng.random((8, n), dtype=np.float32))
    got = np.asarray(apply_banded_chain_batched(
        jnp.asarray(np.stack(xs)), jnp.asarray(np.stack(ts)), h, 4,
        bs=bs, interpret=True,
    ))
    for b in range(bimg):
        want = np.asarray(apply_banded_chain(
            jnp.asarray(xs[b]), jnp.asarray(ts[b]), h, 4, bs=bs,
            interpret=True,
        ))
        np.testing.assert_array_equal(got[b], want, err_msg=str(b))

    geom = rw_mod.build_geometry(24, 24, radius=2)
    h4 = w4 = 20
    edges = np.ones((bimg, 24, 24), np.float32)
    edges[:, :h4, :w4] = rng.random((bimg, h4, w4)).astype(np.float32)
    cams = np.zeros((bimg, 3, 24, 24), np.float32)
    cams[:, :, :h4, :w4] = rng.random((bimg, 3, h4, w4))
    assert rw_mod.banded_fits(geom, 3, 1, bs=128)
    got_b = np.asarray(rw_mod.propagate_banded_batch(
        geom, jnp.asarray(cams), jnp.asarray(edges), beta=10, exp_times=3,
        square_times=1, bs=128, interpret=True,
    ))
    for b in range(bimg):
        want = np.asarray(rw_mod.propagate_banded(
            geom, cams[b], edges[b], beta=10, exp_times=3,
            square_times=1, bs=128, interpret=True,
        ))
        np.testing.assert_array_equal(got_b[b], want, err_msg=str(b))

    # square_times=0 (the production default split): the batch path must
    # dispatch to the vmapped f32 diagonal stencil like propagate_banded
    # does per image, not silently run the bf16 matmul chain (found by
    # review; the dispatch lives in propagate_banded_batch)
    got_0 = np.asarray(rw_mod.propagate_banded_batch(
        geom, jnp.asarray(cams), jnp.asarray(edges), beta=10, exp_times=3,
        square_times=0, bs=128, interpret=True,
    ))
    for b in range(bimg):
        want = np.asarray(rw_mod.propagate_banded(
            geom, cams[b], edges[b], beta=10, exp_times=3,
            square_times=0, bs=128, interpret=True,
        ))
        np.testing.assert_array_equal(got_0[b], want, err_msg=str(b))
