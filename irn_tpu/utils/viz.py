"""Visualization helpers (capability of misc/imutils.py:193-272): colorize
score maps, displacement fields, and label maps for debugging."""

from __future__ import annotations

import numpy as np

VOC_COLORS = np.array(
    [(0, 0, 0), (128, 0, 0), (0, 128, 0), (128, 128, 0), (0, 0, 128),
     (128, 0, 128), (0, 128, 128), (128, 128, 128), (64, 0, 0), (192, 0, 0),
     (64, 128, 0), (192, 128, 0), (64, 0, 128), (192, 0, 128), (64, 128, 128),
     (192, 128, 128), (0, 64, 0), (128, 64, 0), (0, 192, 0), (128, 192, 0),
     (0, 64, 128), (255, 255, 255)],
    np.float32,
)


def _hsv_to_rgb(h: np.ndarray, s: np.ndarray, v: np.ndarray) -> np.ndarray:
    i = np.floor(h * 6.0).astype(int) % 6
    f = h * 6.0 - np.floor(h * 6.0)
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    out = np.choose(
        i[..., None] * np.ones(3, int),
        [np.stack([v, t, p], -1), np.stack([q, v, p], -1),
         np.stack([p, v, t], -1), np.stack([p, q, v], -1),
         np.stack([t, p, v], -1), np.stack([v, p, q], -1)],
    )
    return out


def colorize_score(score_map: np.ndarray, exclude_zero: bool = False,
                   normalize: bool = True, by_hue: bool = False) -> np.ndarray:
    """[K, H, W] score maps -> [H, W, 3] argmax-colored visualization."""
    if by_hue:
        k = score_map.shape[0]
        hues = np.arange(k) / k
        palette = _hsv_to_rgb(hues, np.ones(k), np.ones(k))
        img = palette[np.argmax(score_map, axis=0)]
    else:
        palette = VOC_COLORS if not exclude_zero else VOC_COLORS[1:]
        img = palette[np.argmax(score_map, axis=0) % len(palette)]
    img = np.max(score_map, axis=0)[..., None] * img
    if normalize:
        img = img / (img.max() + 1e-5)
    return img


def colorize_displacement(disp: np.ndarray) -> np.ndarray:
    """[2, H, W] (dy, dx) field -> [H, W, 3] hue=direction, sat=magnitude."""
    angle = (np.arctan2(-disp[0], -disp[1]) / np.pi + 1) / 2
    r = np.sqrt(disp[0] ** 2 + disp[1] ** 2)
    s = r / (r.max() + 1e-12)
    return _hsv_to_rgb(angle, s, np.ones_like(angle))


def colorize_label(label_map: np.ndarray, by_hue: bool = True,
                   exclude_zero: bool = False,
                   normalize: bool = True) -> np.ndarray:
    """[H, W] int labels -> [H, W, 3] colors (hue wheel or VOC palette)."""
    label_map = label_map.astype(np.int64)
    if by_hue:
        sz = max(int(label_map.max()), 1)
        hues = np.arange(sz) / sz
        palette = np.concatenate(
            [np.zeros((1, 3)), _hsv_to_rgb(hues, np.ones(sz), np.ones(sz))],
            axis=0,
        )
        return palette[np.clip(label_map, 0, sz)]
    palette = VOC_COLORS if not exclude_zero else VOC_COLORS[1:]
    # 255-void maps to the last palette entry (white) so ignore regions
    # stay visually distinct; the modulo wrap painted them as an
    # arbitrary class color (found by review)
    label_map = np.where(label_map == 255, len(palette) - 1,
                         label_map % len(palette))
    img = palette[label_map]
    if normalize:
        img = img / (img.max() + 1e-12)
    return img
