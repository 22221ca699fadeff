"""Host augmentation tests (reference semantics, seeded randomness)."""

import numpy as np
import pytest

from irn_tpu.data import transforms as T


def test_pil_rescale_rounding(rng):
    img = rng.integers(0, 255, (37, 53, 3)).astype(np.uint8)
    out = T.pil_rescale(img, 0.5, 3)
    assert out.shape[:2] == (round(37 * 0.5), round(53 * 0.5))
    out = T.pil_rescale(img, 1.0, 3)
    assert out is img  # no-op returns the input


def test_random_resize_long(rng):
    img = rng.integers(0, 255, (100, 50, 3)).astype(np.uint8)
    g = np.random.default_rng(0)
    out = T.random_resize_long(img, 60, 80, g)
    assert 60 <= max(out.shape[:2]) <= 81
    # aspect preserved (long edge is height)
    assert out.shape[0] >= out.shape[1]


def test_random_crop_small_image_pads(rng):
    g = np.random.default_rng(0)
    img = rng.random((20, 30, 3)).astype(np.float32)
    lab = rng.integers(0, 3, (20, 30)).astype(np.uint8)
    ci, cl = T.random_crop((img, lab), 64, (0, 255), g)
    assert ci.shape == (64, 64, 3) and cl.shape == (64, 64)
    # padded region fill values
    assert (cl == 255).sum() >= 64 * 64 - 20 * 30
    # joint geometry: image zeros exactly where label is fill
    assert ((ci == 0).all(axis=-1) | (cl != 255)).all()


def test_random_crop_large_image_crops(rng):
    g = np.random.default_rng(0)
    img = rng.random((100, 90, 3)).astype(np.float32)
    out = T.random_crop(img, 64, 0, g)
    assert out.shape == (64, 64, 3)


def test_flip_tuple_consistency(rng):
    g = np.random.default_rng(3)  # seed chosen so a flip occurs eventually
    img = rng.random((8, 8, 3))
    lab = rng.integers(0, 2, (8, 8))
    flipped_any = False
    for _ in range(10):
        fi, fl = T.random_lr_flip((img, lab), g)
        if not np.array_equal(fi, img):
            flipped_any = True
            np.testing.assert_allclose(fi, img[:, ::-1])
            np.testing.assert_array_equal(fl, lab[:, ::-1])
    assert flipped_any


def test_center_and_topleft_crop():
    img = np.arange(36).reshape(6, 6).astype(np.uint8)
    tl = T.top_left_crop(img, 4, 0)
    np.testing.assert_array_equal(tl, img[:4, :4])
    big = T.top_left_crop(img, 8, 7)
    assert big.shape == (8, 8) and (big[6:, :] == 7).all()
    c = T.center_crop(img, 4)
    np.testing.assert_array_equal(c, img[1:5, 1:5])


def test_normalize_range(rng):
    img = rng.integers(0, 255, (5, 5, 3)).astype(np.uint8)
    out = T.normalize(img)
    assert out.dtype == np.float32
    assert -3 < out.min() and out.max() < 3
