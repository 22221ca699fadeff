"""CRF, permutohedral, connected components, and RLE tests.

The native C++ lattice and the vectorized NumPy lattice implement the same
algorithm; they cross-validate each other here. Filter correctness is
checked against a brute-force O(n^2) Gaussian."""

import numpy as np
import pytest

from irn_tpu.ops import cc, crf, native


def brute_force_gaussian(features, values):
    """Exact symmetric-normalized dense Gaussian filtering."""
    d2 = ((features[:, None, :] - features[None, :, :]) ** 2).sum(-1)
    k = np.exp(-0.5 * d2)
    norm = k.sum(1)
    inv = 1.0 / np.sqrt(norm)
    return inv[:, None] * (k @ (values * inv[:, None]))


def test_numpy_lattice_approximates_gaussian(rng):
    feats = rng.random((150, 2)).astype(np.float64) * 4
    vals = rng.random((150, 3))
    want = brute_force_gaussian(feats, vals)
    got = crf._filter_normalized_np(feats, vals)
    # permutohedral is an approximation; demand high correlation
    c = np.corrcoef(want.ravel(), got.ravel())[0, 1]
    assert c > 0.97, c


@pytest.mark.skipif(native.load() is None, reason="native lib not built")
def test_native_matches_numpy_lattice(rng):
    feats = rng.random((200, 5)).astype(np.float32) * 3
    vals = rng.random((200, 4)).astype(np.float32)
    got_native = crf.filter_normalized(feats, vals)
    got_np = crf._filter_normalized_np(feats, vals).astype(np.float32)
    np.testing.assert_allclose(got_native, got_np, atol=1e-3, rtol=1e-3)


def _synthetic_scene(rng, h=48, w=48):
    """Sharp color blob + noisy labels inside it."""
    img = np.full((h, w, 3), 200, np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    blob = ((yy - h / 2) ** 2 + (xx - w / 2) ** 2) < (h / 3) ** 2
    img[blob] = (60, 90, 170)
    img = (img.astype(np.int32) + rng.integers(-8, 8, img.shape)).clip(0, 255)
    labels = blob.astype(np.int32)
    noisy = labels.copy()
    flip = rng.random((h, w)) < 0.15
    noisy[flip] = 1 - noisy[flip]
    return img.astype(np.uint8), labels, noisy


def test_crf_denoises_labels(rng):
    img, gt, noisy = _synthetic_scene(rng)
    refined = crf.crf_inference_label(img, noisy, t=5, n_labels=2)
    err_before = (noisy != gt).mean()
    err_after = (refined != gt).mean()
    assert err_after < err_before * 0.5, (err_before, err_after)


@pytest.mark.skipif(native.load() is None, reason="native lib not built")
def test_crf_native_vs_numpy_agree(rng):
    img, _, noisy = _synthetic_scene(rng, 24, 24)
    ref = crf._crf_label_np(
        img.astype(np.float64), noisy.astype(np.int32), 3, 2, 0.7,
        3.0, 3.0, 50.0, 5.0, 10.0,
    )
    got = crf.crf_inference_label(img, noisy, t=3, n_labels=2)
    agree = (ref == got).mean()
    assert agree > 0.97, agree


@pytest.mark.skipif(native.load() is None, reason="native lib not built")
def test_crf_multithreaded_matches_serial(rng):
    """OpenMP filter threads change only summation order in the splat
    reduction; refined labels must match the serial path (forced back to 1
    thread afterwards — this box has one core)."""
    img, _, noisy = _synthetic_scene(rng, 32, 32)
    want = crf.crf_inference_label(img, noisy, t=5, n_labels=2)
    native.set_num_threads(4)
    try:
        got = crf.crf_inference_label(img, noisy, t=5, n_labels=2)
    finally:
        native.set_num_threads(1)
    agree = (got == want).mean()
    assert agree > 0.999, agree


def test_label_components_matches_scipy(rng):
    from scipy import ndimage

    mask = (rng.random((30, 40)) < 0.4).astype(np.uint8)
    got, k = cc.label_components(mask)
    want, k2 = ndimage.label(
        mask, structure=np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])
    )
    assert k == k2
    np.testing.assert_array_equal(got, want)


def test_one_hot():
    lab = np.array([[0, 1], [2, 1]])
    oh = cc.to_one_hot(lab)
    assert oh.shape == (3, 2, 2)
    assert oh[1, 0, 1] and oh[1, 1, 1] and oh[2, 1, 0]
    assert oh.sum() == 4


def test_rle_roundtrip(rng):
    mask = (rng.random((17, 23)) < 0.3).astype(np.uint8)
    rle = cc.rle_encode(mask)
    back = cc.rle_decode(rle)
    np.testing.assert_array_equal(back, mask)
    assert sum(rle["counts"]) == 17 * 23


def test_rle_known_example():
    # 2x3 mask, column-major: columns (1,0),(0,0),(0,1) -> flat 1 0 0 0 0 1
    mask = np.array([[1, 0, 0], [0, 0, 1]], np.uint8)
    rle = cc.rle_encode(mask)
    assert rle["counts"] == [0, 1, 4, 1]
