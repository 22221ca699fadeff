"""Displacement-field instance grouping.

Reference semantics (step/make_ins_seg_labels.py:18-105):

- every pixel advects a particle through the displacement field for N
  iterations with bilinear sampling and border clipping
  (``find_centroids_with_refinement``) — a 300-step NumPy loop per image on
  CPU in the reference; here one jitted ``lax.fori_loop`` over the whole
  grid on device;
- pixels whose displacement magnitude is below a threshold form basins;
  connected components of the basin mask label the instances; each pixel
  joins the instance its converged centroid lands on
  (``cluster_centroids``) — the CC labeling runs on host (cheap union-find);
- each (instance x class) mask is re-split into connected components and
  fragments below 1% of the image are zero-scored (``detect_instance``).
"""

from __future__ import annotations

import functools
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from irn_tpu.data.transforms import compress_range
from irn_tpu.ops import cc


def find_centroids(dp: jax.Array, iterations: int = 300) -> jax.Array:
    """Advect per-pixel particles through the displacement field.

    Args:
      dp: [2, H, W] displacement (dy, dx channels — reference layout).

    Returns:
      [2, H, W] int32 rounded converged (y, x) coordinates.

    The static-extent special case of :func:`find_centroids_bounded`
    (clipping to the full grid)."""
    h, w = dp.shape[1], dp.shape[2]
    return find_centroids_bounded(
        dp, jnp.int32(h), jnp.int32(w), iterations
    )


def find_centroids_bounded(
    dp: jax.Array, h_true: jax.Array, w_true: jax.Array, iterations: int = 300
) -> jax.Array:
    """Like :func:`find_centroids` but clips particles to a *dynamic* true
    extent inside a fixed capped grid, reproducing the reference's
    exact-size border clipping (make_ins_seg_labels.py:47-49) under a
    single compilation.

    Two implementations behind ``IRN_TPU_ADVECT``:

    - ``matmul`` (default): the bilinear sample is decomposed into a
      two-tap row-interpolation matmul (``Wy @ field``, MXU, f32
      ``Precision.HIGHEST``) followed by a two-tap column masked reduce
      (VPU) — no gathers. Gathers serialize on TPU (one element per
      issue); this form keeps the whole 300-iteration loop on the wide
      units, the same shifted-slice/matmul treatment the resize, path-max,
      and stencil paths got. Each weight row has exactly two nonzeros and
      zero-products are exact in f32, so the sums have the same two terms
      as the gather form.
    - ``gather``: the direct 4-corner flat-gather formulation (the
      round-1..3 path, kept for A/B and as the oracle form).
    """
    if os.environ.get("IRN_TPU_ADVECT", "matmul") == "gather":
        return _find_centroids_gather(dp, h_true, w_true, iterations)
    return _find_centroids_matmul(dp, h_true, w_true, iterations)


def _start_positions(h, w, ymax, xmax):
    cy0 = jnp.minimum(jax.lax.broadcasted_iota(jnp.float32, (h, w), 0), ymax)
    cx0 = jnp.minimum(jax.lax.broadcasted_iota(jnp.float32, (h, w), 1), xmax)
    return cy0, cx0


@functools.partial(jax.jit, static_argnames=("iterations",))
def _find_centroids_gather(
    dp: jax.Array, h_true: jax.Array, w_true: jax.Array, iterations: int = 300
) -> jax.Array:
    h, w = dp.shape[1], dp.shape[2]
    dpy = dp[0]
    dpx = dp[1]
    ymax = (h_true - 1).astype(jnp.float32)
    xmax = (w_true - 1).astype(jnp.float32)
    cy0, cx0 = _start_positions(h, w, ymax, xmax)

    def sample(field: jax.Array, y: jax.Array, x: jax.Array) -> jax.Array:
        uy = jnp.ceil(y).astype(jnp.int32)
        dy = jnp.floor(y).astype(jnp.int32)
        yc = y - dy
        ux = jnp.ceil(x).astype(jnp.int32)
        dx = jnp.floor(x).astype(jnp.int32)
        xc = x - dx
        flat = field.reshape(-1)

        def at(yy, xx):
            return flat[(yy * w + xx).reshape(-1)].reshape(h, w)

        return (
            at(uy, ux) * yc * xc
            + at(dy, ux) * (1 - yc) * xc
            + at(uy, dx) * yc * (1 - xc)
            + at(dy, dx) * (1 - yc) * (1 - xc)
        )

    def body(_, carry):
        y, x = carry
        ny = jnp.clip(y + sample(dpy, y, x), 0.0, ymax)
        nx = jnp.clip(x + sample(dpx, y, x), 0.0, xmax)
        return ny, nx

    cy, cx = jax.lax.fori_loop(0, iterations, body, (cy0, cx0))
    return jnp.stack(
        [jnp.rint(cy).astype(jnp.int32), jnp.rint(cx).astype(jnp.int32)], axis=0
    )


def _two_tap_weights(pos: jax.Array, n: int) -> jax.Array:
    """[N] positions in [0, n-1] -> [N, n] rows with the two bilinear taps
    ``(1-frac)`` at floor(pos) and ``frac`` at floor(pos)+1. At integer
    positions the second tap's weight is exactly 0, so a floor(pos)+1 that
    lands on a padded (or nonexistent) row contributes an exact 0 — the
    same value the gather form's ceil==floor collapse produces."""
    lo = jnp.floor(pos)
    frac = (pos - lo)[:, None]
    iota = jax.lax.broadcasted_iota(jnp.float32, (pos.shape[0], n), 1)
    lo = lo[:, None]
    return jnp.where(iota == lo, 1.0 - frac, 0.0) + jnp.where(
        iota == lo + 1.0, frac, 0.0
    )


@functools.partial(jax.jit, static_argnames=("iterations",))
def _find_centroids_matmul(
    dp: jax.Array, h_true: jax.Array, w_true: jax.Array, iterations: int = 300
) -> jax.Array:
    h, w = dp.shape[1], dp.shape[2]
    n = h * w
    # [H, 2W]: columns 0..W-1 = dy field, W..2W-1 = dx field — one matmul
    # row-interpolates both channels
    field2 = jnp.concatenate([dp[0], dp[1]], axis=1)
    ymax = (h_true - 1).astype(jnp.float32)
    xmax = (w_true - 1).astype(jnp.float32)
    cy0, cx0 = _start_positions(h, w, ymax, xmax)

    def body(_, carry):
        y, x = carry
        wy = _two_tap_weights(y.reshape(n), h)  # [N, H]
        wx = _two_tap_weights(x.reshape(n), w)  # [N, W]
        # HIGHEST keeps the two nonzero products f32-faithful; the MXU
        # passes cost nothing at this size (~0.4 GMAC/iter at 128^2)
        rows = jnp.dot(wy, field2, precision=jax.lax.Precision.HIGHEST)
        sy = jnp.sum(rows[:, :w] * wx, axis=1).reshape(h, w)
        sx = jnp.sum(rows[:, w:] * wx, axis=1).reshape(h, w)
        ny = jnp.clip(y + sy, 0.0, ymax)
        nx = jnp.clip(x + sx, 0.0, xmax)
        return ny, nx

    cy, cx = jax.lax.fori_loop(0, iterations, body, (cy0, cx0))
    return jnp.stack(
        [jnp.rint(cy).astype(jnp.int32), jnp.rint(cx).astype(jnp.int32)], axis=0
    )


def cluster_centroids(
    centroids: np.ndarray, dp: np.ndarray, thres: float = 2.5
) -> np.ndarray:
    """[K, H, W] boolean one-hot instance masks (K includes the 0 bucket of
    pixels whose centroid escaped every basin)."""
    strength = np.sqrt(dp[0] ** 2 + dp[1] ** 2)
    return cluster_centroids_from_basin(
        centroids, (strength < thres).astype(np.uint8)
    )


def cluster_centroids_from_basin(
    centroids: np.ndarray, basin: np.ndarray
) -> np.ndarray:
    """:func:`cluster_centroids` from a precomputed basin mask.

    The stage's advection program evaluates the ``|dp| < 2.5`` predicate
    on device with the same f32 sqrt (uint8 fetch instead of the f32
    displacement planes); the clustering itself is unchanged."""
    h, w = basin.shape
    basin_labels, _ = cc.label_components(basin.astype(np.uint8))
    flat = basin_labels.reshape(-1)
    centroid_flat = (
        centroids[0].astype(np.int64).reshape(-1) * w
        + centroids[1].astype(np.int64).reshape(-1)
    )
    clusters = flat[centroid_flat].reshape(h, w)
    cluster_map = compress_range(clusters + 1)
    return cc.to_one_hot(cluster_map)


def mask_scores_by_instance(
    scores: np.ndarray, instance_masks: np.ndarray
) -> np.ndarray:
    """[K*C, H, W] per-(instance, class) masked score maps in the
    reference's (class-major) interleaving: row k*... = scores[c] *
    mask[k]? The reference broadcast is [C, 1, H, W] * [1, K, H, W]
    -> [C, K, H, W] flattened C-major (separte_score_by_mask +
    view(-1, ...) at make_ins_seg_labels.py:135)."""
    c = scores.shape[0]
    k = instance_masks.shape[0]
    out = scores[:, None] * instance_masks[None].astype(scores.dtype)
    return out.reshape(c * k, *scores.shape[1:])


def split_components(labels_np: np.ndarray, n_rows: int):
    """Global component map over the per-row masks of a decoded label map.

    Components never cross rows (labels are an argmax), so per-row CC
    results concatenate into one map. Returns (comp_map [H, W] int32 with
    ids 1..K, comp_rows [K] the seed row of each component, comp_sizes [K]).
    """
    comp_map = np.zeros(labels_np.shape, np.int32)
    comp_rows = []
    comp_sizes = []
    present = np.unique(labels_np)
    # labels name seed rows 1..n_rows (0 = background): a violation means
    # the upstream decode and the seed table disagree — fail loudly
    # instead of emitting components with out-of-range row ids
    assert present.max(initial=0) <= n_rows, (present.max(), n_rows)
    offset = 0
    for row in present:
        if row == 0:
            continue
        mask = labels_np == row
        lab, k = cc.label_components(mask.astype(np.uint8))
        comp_map[mask] = lab[mask] + offset
        sizes = np.bincount(lab.reshape(-1), minlength=k + 1)[1 : k + 1]
        comp_rows.extend([int(row) - 1] * k)
        comp_sizes.extend(sizes.tolist())
        offset += k
    return comp_map, np.asarray(comp_rows, np.int32), np.asarray(
        comp_sizes, np.int64
    )


def detect_instance(
    score_map: np.ndarray,
    masks: np.ndarray,
    class_ids: np.ndarray,
    max_fragment_size: float = 0,
) -> Dict[str, np.ndarray]:
    """Split winning masks into components, zero-score small fragments.

    Args mirror the reference (make_ins_seg_labels.py:82-105): score_map
    [N, H, W], masks [N, H, W] bool, class_ids [N]."""
    pred_score, pred_label, pred_mask = [], [], []
    for score, mask, cls in zip(score_map, masks, class_ids):
        if mask.sum() < 1:
            continue
        labels, k = cc.label_components(mask.astype(np.uint8))
        for comp in range(1, k + 1):
            seg = labels == comp
            if seg.sum() < max_fragment_size:
                pred_score.append(0.0)
            else:
                pred_score.append(float(np.max(score * seg)))
            pred_label.append(int(cls))
            pred_mask.append(seg)
    if not pred_mask:
        h, w = masks.shape[1:]
        return {
            "score": np.zeros((0,), np.float32),
            "mask": np.zeros((0, h, w), bool),
            "class": np.zeros((0,), np.int32),
        }
    return {
        "score": np.asarray(pred_score, np.float32),
        "mask": np.stack(pred_mask, 0),
        "class": np.asarray(pred_label, np.int32),
    }
