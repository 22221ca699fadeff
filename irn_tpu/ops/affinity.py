"""Device ops over path geometry: affinities, affinity labels, displacements.

These are the jit-friendly equivalents of three reference pieces:

- ``edge_to_affinity`` — per-pair path affinity = 1 - max(edge along path)
  (misc/indexing.py:91-109 and net/resnet50_irn.py:162-175).
- ``affinity_labels`` — the three {bg-pos, fg-pos, neg} per-pair masks the
  reference extracts on CPU inside DataLoader workers
  (voc12/dataloader.py:80-106); here a trivially-vectorized device op.
- ``pair_displacement`` — per-pair displacement differences src - dst
  (net/resnet50_irn.py:177-193).
- ``affinity_displacement_losses`` — the four raw per-pair loss maps
  (net/resnet50_irn.py:198-213) and their masked reduction
  (step/train_irn.py:58-69).

All shapes are static given (radius, grid size); geometry tensors come from
:mod:`irn_tpu.ops.paths` and are closed over as device constants.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from irn_tpu.ops.paths import GridPathIndex, PathSet


def shifted_window(x: jax.Array, dy: int, dx: int, rf: int,
                   ch: int, cw: int) -> jax.Array:
    """Static slice of the (dy, dx)-shifted valid window of [..., H, W]."""
    return x[..., dy : dy + ch, rf + dx : rf + dx + cw]


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _path_max(edge2d: jax.Array, meta) -> jax.Array:
    """Per-pair max of the edge map over each path's cells, fully static.

    ``meta`` = (rf, ch, cw, cells) with ``cells`` a tuple (per pair) of
    (dy, dx) tuples (true path length, no padding). The forward is an
    unrolled winner-take-all max chain over statically shifted window
    slices — no gathers, no scan, so XLA fuses the whole reduction into
    elementwise passes over the small edge map.

    Memory: a plain ``lax.scan`` running max stores every carry for the
    backward pass — [L_max, n_pairs, B, ch, cw] f32 is 5.4 GB at the
    production IRN train shapes (radius 10, batch 32), which OOMed a
    16 GB chip. This custom VJP keeps only the winning cell index (int8,
    64 MB) and routes the cotangent to it: grouped per unique cell, the
    backward is ~2r^2 fused masked sums + window-slice adds. Winner-take-
    all at ties (first maximal cell, destination first) — the torch
    reference's ``max_pool2d`` backward semantics (resnet50_irn.py:170),
    where JAX's builtin max-grad would split ties."""
    val, _ = _path_max_unrolled(edge2d, meta)
    return val


def _path_max_unrolled(edge2d, meta):
    rf, ch, cw, cells = meta
    vals, args = [], []
    for path in cells:
        dy, dx = path[0]
        m = shifted_window(edge2d, dy, dx, rf, ch, cw)
        a = jnp.zeros(m.shape, jnp.int8)
        for l in range(1, len(path)):
            dy, dx = path[l]
            wl = shifted_window(edge2d, dy, dx, rf, ch, cw)
            take = wl > m
            m = jnp.where(take, wl, m)
            a = jnp.where(take, jnp.int8(l), a)
        vals.append(m)
        args.append(a)
    # [n_pairs, ..., ch, cw]
    return jnp.stack(vals), jnp.stack(args)


def _path_max_fwd(edge2d, meta):
    val, arg = _path_max_unrolled(edge2d, meta)
    return val, arg


def _path_max_bwd(meta, arg, g):
    rf, ch, cw, cells = meta
    # g, arg: [n_pairs, ..., ch, cw]; the primal edge map restores the
    # window crops: [..., ch + rf, cw + 2*rf]
    edge_shape = g.shape[1:-2] + (ch + rf, cw + 2 * rf)
    by_cell = {}
    for p, path in enumerate(cells):
        for l, c in enumerate(path):
            by_cell.setdefault(c, []).append((p, l))
    grad = jnp.zeros(edge_shape, g.dtype)
    for (dy, dx), plist in by_cell.items():
        s = None
        for p, l in plist:
            contrib = jnp.where(arg[p] == jnp.int8(l), g[p], 0.0)
            s = contrib if s is None else s + contrib
        grad = grad.at[..., dy : dy + ch, rf + dx : rf + dx + cw].add(s)
    return (grad,)


_path_max.defvjp(_path_max_fwd, _path_max_bwd)


def _path_cells_meta(path_set: PathSet, ch: int, cw: int):
    """Hashable (rf, ch, cw, cells) for :func:`_path_max`; padded positions
    (which repeat the destination cell and can never win the strict-> max)
    are dropped via the true lengths."""
    # _path_max stores the winning position index in int8; a path longer
    # than 127 cells (radius ~60+, production is 10) would silently wrap
    # and route backward cotangents to the wrong cells — fail loudly
    assert path_set.max_path_length <= 127, (
        f"path length {path_set.max_path_length} overflows the int8 "
        "argmax storage in _path_max"
    )
    cells = tuple(
        tuple(
            (int(dy), int(dx))
            for dy, dx in path_set.cells[p][: int(path_set.lengths[p])]
        )
        for p in range(path_set.n_pairs)
    )
    return (path_set.radius_floor, ch, cw, cells)


def path_affinity(edge2d: jax.Array, path_set: PathSet) -> jax.Array:
    """Path affinities from a 2-D edge map — gather-free formulation.

    Equivalent to :func:`edge_to_affinity` but an unrolled max chain over
    statically-shifted window slices (:func:`_path_max`: memory-lean
    custom VJP, winner-take-all like the reference's max_pool2d), so the
    compiled program carries only tiny slice offsets instead of
    multi-million element gather-index literals (which cost minutes of
    XLA compile time and serialize on TPU).

    Args:
      edge2d: [..., H, W] edge strength in [0, 1].

    Returns:
      [..., n_pairs, P] affinity, P = (H - rf) * (W - 2rf), pair order
      matching the concatenated length groups.
    """
    rf = path_set.radius_floor
    h, w = edge2d.shape[-2], edge2d.shape[-1]
    ch, cw = h - rf, w - 2 * rf
    maxed = _path_max(edge2d, _path_cells_meta(path_set, ch, cw))
    aff = 1.0 - maxed  # [n_pairs, ..., ch, cw]
    aff = jnp.moveaxis(aff, 0, -3) if edge2d.ndim > 2 else aff
    return aff.reshape(edge2d.shape[:-2] + (path_set.n_pairs, ch * cw))


def label_pair_views(label2d: jax.Array, path_set: PathSet):
    """(src [..., 1, P], dst [..., n_pairs, P]) label views via slices."""
    rf = path_set.radius_floor
    h, w = label2d.shape[-2], label2d.shape[-1]
    ch, cw = h - rf, w - 2 * rf
    src = shifted_window(label2d, 0, 0, rf, ch, cw)
    src = src.reshape(label2d.shape[:-2] + (1, ch * cw))
    dst = jnp.stack(
        [shifted_window(label2d, int(dy), int(dx), rf, ch, cw)
         for dy, dx in path_set.dst_offsets],
        axis=-3,
    )
    return src, dst.reshape(label2d.shape[:-2] + (path_set.n_pairs, ch * cw))


def affinity_labels_2d(
    label2d: jax.Array, path_set: PathSet, n_classes_with_bg: int = 21
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Gather-free :func:`affinity_labels` over [..., H, W] int labels."""
    lab_src, lab_dst = label_pair_views(label2d, path_set)
    valid = (lab_src < n_classes_with_bg) & (lab_dst < n_classes_with_bg)
    equal = lab_src == lab_dst
    pos = equal & valid
    bg_pos = (pos & (lab_src == 0)).astype(jnp.float32)
    fg_pos = (pos & (lab_src > 0)).astype(jnp.float32)
    neg = (~equal) & valid
    return bg_pos, fg_pos, neg.astype(jnp.float32)


def edge_to_affinity(edge_flat: jax.Array, grid_index: GridPathIndex) -> jax.Array:
    """Path affinities from a flattened edge map — reference-layout gather
    variant, kept as the parity-test oracle. Production code uses the
    gather-free :func:`path_affinity` (giant index literals cost minutes of
    XLA compile time and TPU scatters/gathers serialize).

    Args:
      edge_flat: [..., H*W] edge strength in [0, 1].
      grid_index: geometry bound to (H, W).

    Returns:
      [..., n_pairs, P] affinity = 1 - max(edge over path cells), where
      P = n_window_pixels. Pair order matches the geometry's concatenated
      length groups (and therefore the reference's buffer order).
    """
    affs = []
    for gi in grid_index.group_indices:  # [n_g, L_g, P]
        idx = jnp.asarray(gi.reshape(-1))
        vals = jnp.take(edge_flat, idx, axis=-1)
        vals = vals.reshape(edge_flat.shape[:-1] + gi.shape)
        affs.append(1.0 - vals.max(axis=-2))  # [..., n_g, P]
    return jnp.concatenate(affs, axis=-2)


def affinity_labels(
    label_flat: jax.Array,
    src_indices: jax.Array,
    dst_indices: jax.Array,
    n_classes_with_bg: int = 21,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """{bg-pos, fg-pos, neg} float masks from an int label map —
    reference-layout gather variant (parity-test oracle); production uses
    :func:`affinity_labels_2d`.

    Args:
      label_flat: [..., H*W] int labels (0 = bg, 1..20 = classes,
        255 = ignore).
      src_indices: [P] flat window indices.
      dst_indices: [n_pairs, P] flat destination indices.

    Returns three float32 arrays of shape [..., n_pairs, P].
    """
    lab_src = jnp.take(label_flat, jnp.asarray(src_indices), axis=-1)
    lab_src = lab_src[..., None, :]  # [..., 1, P]
    lab_dst = jnp.take(
        label_flat, jnp.asarray(dst_indices).reshape(-1), axis=-1
    ).reshape(label_flat.shape[:-1] + dst_indices.shape)
    valid = (lab_src < n_classes_with_bg) & (lab_dst < n_classes_with_bg)
    equal = lab_src == lab_dst
    pos = equal & valid
    bg_pos = (pos & (lab_src == 0)).astype(jnp.float32)
    fg_pos = (pos & (lab_src > 0)).astype(jnp.float32)
    neg = (~equal) & valid
    return bg_pos, fg_pos, neg.astype(jnp.float32)


def pair_displacement(dp: jax.Array, path_set: PathSet) -> jax.Array:
    """Per-pair displacement differences.

    Args:
      dp: [B, H, W, 2] displacement field (dy, dx channels).

    Returns:
      [B, 2, n_pairs, P] src - dst differences over the valid window
      (channel-first pair layout to align with the reference's loss maps).
    """
    rf = path_set.radius_floor
    b, h, w, _ = dp.shape
    ch, cw = h - rf, w - 2 * rf
    src = dp[:, :ch, rf : rf + cw, :]  # [B, ch, cw, 2]
    dsts = jnp.stack(
        [
            dp[:, dy : dy + ch, rf + dx : rf + dx + cw, :]
            for dy, dx in path_set.dst_offsets
        ],
        axis=1,
    )  # [B, n_pairs, ch, cw, 2]
    pair = src[:, None] - dsts
    pair = pair.reshape(b, path_set.n_pairs, ch * cw, 2)
    return jnp.transpose(pair, (0, 3, 1, 2))


class AffinityLossMaps(NamedTuple):
    pos_aff: jax.Array  # [B, n_pairs, P]
    neg_aff: jax.Array  # [B, n_pairs, P]
    dp_fg: jax.Array    # [B, 2, n_pairs, P]
    dp_bg: jax.Array    # [B, 2, n_pairs, P]


def affinity_displacement_loss_maps(
    edge_logit: jax.Array, dp: jax.Array, grid_index: GridPathIndex
) -> AffinityLossMaps:
    """The four raw per-pair loss maps (resnet50_irn.py:198-213).

    Args:
      edge_logit: [B, H, W, 1] boundary logits at stride 4.
      dp: [B, H, W, 2] displacement field.
    """
    edge = jax.nn.sigmoid(edge_logit[..., 0])  # [B, H, W]
    aff = path_affinity(edge, grid_index.path_set)
    pos_aff = -jnp.log(aff + 1e-5)
    neg_aff = -jnp.log(1.0 + 1e-5 - aff)

    pair = pair_displacement(dp, grid_index.path_set)
    target = jnp.asarray(
        grid_index.path_set.dst_offsets.T.astype(np.float32)
    )[None, :, :, None]  # [1, 2, n_pairs, 1]
    dp_fg = jnp.abs(pair - target)
    dp_bg = jnp.abs(pair)
    return AffinityLossMaps(pos_aff, neg_aff, dp_fg, dp_bg)


def irn_total_loss(
    maps: AffinityLossMaps,
    bg_pos_label: jax.Array,
    fg_pos_label: jax.Array,
    neg_label: jax.Array,
):
    """Masked reduction and weighting (step/train_irn.py:58-69).

    Labels are [B, n_pairs, P] float masks. Returns (total, metrics dict).
    """
    eps = 1e-5
    bg_pos = jnp.sum(bg_pos_label * maps.pos_aff) / (jnp.sum(bg_pos_label) + eps)
    fg_pos = jnp.sum(fg_pos_label * maps.pos_aff) / (jnp.sum(fg_pos_label) + eps)
    pos = bg_pos / 2.0 + fg_pos / 2.0
    neg = jnp.sum(neg_label * maps.neg_aff) / (jnp.sum(neg_label) + eps)
    dp_fg = jnp.sum(maps.dp_fg * fg_pos_label[:, None]) / (
        2.0 * jnp.sum(fg_pos_label) + eps
    )
    dp_bg = jnp.sum(maps.dp_bg * bg_pos_label[:, None]) / (
        2.0 * jnp.sum(bg_pos_label) + eps
    )
    total = (pos + neg) / 2.0 + (dp_fg + dp_bg) / 2.0
    return total, {
        "loss_pos_aff": pos,
        "loss_neg_aff": neg,
        "loss_dp_fg": dp_fg,
        "loss_dp_bg": dp_bg,
    }
