"""Bilinear resize matching torch ``F.interpolate(align_corners=False)``.

Both use half-pixel source coordinates ``src = (dst + 0.5) * in/out - 0.5``
with border clamping and no antialiasing — ``jax.image.resize`` with
``method='linear', antialias=False``. Used wherever the reference calls
``F.interpolate``/``nn.Upsample`` (decoder upsamples, CAM rescaling,
random-walk x4 upsample)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def resize_bilinear(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Resize spatial dims of NHWC (or HWC / HW) to ``size``.

    Spatial dims are assumed to be the last two for rank-2 inputs, and dims
    (-3, -2) for rank>=3 (channel-last convention)."""
    if x.ndim == 2:
        shape = (size[0], size[1])
    else:
        shape = x.shape[:-3] + (size[0], size[1]) + x.shape[-1:]
    return jax.image.resize(x, shape, method="linear", antialias=False)


def resize_bilinear_chw(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Resize [..., C, H, W] (channel-first) to spatial ``size``."""
    shape = x.shape[:-2] + (size[0], size[1])
    return jax.image.resize(x, shape, method="linear", antialias=False)


def _axis_weights(out_cap: int, src_cap: int, out_true, src_true):
    """Half-pixel sample positions for a dynamic-extent resize along one
    axis: output pixels [0, out_true) sample source [0, src_true) with
    border clamping (torch align_corners=False semantics); both live in
    fixed-capacity buffers."""
    j = jnp.arange(out_cap, dtype=jnp.float32)
    scale = src_true.astype(jnp.float32) / out_true.astype(jnp.float32)
    x = jnp.clip((j + 0.5) * scale - 0.5, 0.0, src_true.astype(jnp.float32) - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, src_true.astype(jnp.int32) - 1)
    frac = x - x0
    x0 = jnp.clip(x0, 0, src_cap - 1)
    x1 = jnp.clip(x1, 0, src_cap - 1)
    return x0, x1, frac


def resize_bilinear_dynamic(
    src: jax.Array,
    src_true,
    out_true,
    out_cap: Tuple[int, int],
) -> jax.Array:
    """Bilinear resize with *dynamic* true extents in fixed buffers.

    Args:
      src: [..., H_cap, W_cap] with valid content in [0, src_true).
      src_true: (h, w) dynamic scalars — the true source extent.
      out_true: (h, w) dynamic scalars — the true output extent.
      out_cap: static output buffer shape; cells beyond ``out_true`` are
        zeroed.

    Matches torch ``F.interpolate(mode='bilinear', align_corners=False)``
    from the (src_true) grid to the (out_true) grid. Enables single-
    compilation multi-scale fusion where every image has its own source
    and target sizes.
    """
    sh, sw = src_true
    oh, ow = out_true
    y0, y1, fy = _axis_weights(out_cap[0], src.shape[-2], jnp.asarray(oh), jnp.asarray(sh))
    x0, x1, fx = _axis_weights(out_cap[1], src.shape[-1], jnp.asarray(ow), jnp.asarray(sw))

    # interpolation as two small matmuls: W[j, i] = (1-f_j)[i==i0_j]
    # + f_j[i==i1_j] (the i0==i1 border case sums to exactly 1). Axis
    # gathers (jnp.take) lower to TPU gathers and were 28% of the make_cam
    # chain; the dense [out_cap, src_cap] weight matrices ride the MXU and
    # XLA folds the row/col products into two fused contractions.
    def wmat(i0, i1, f, src_cap):
        i = jnp.arange(src_cap)
        return ((i[None, :] == i0[:, None]) * (1.0 - f)[:, None]
                + (i[None, :] == i1[:, None]) * f[:, None])

    wy = wmat(y0, y1, fy, src.shape[-2])            # [out_h, src_h]
    wx = wmat(x0, x1, fx, src.shape[-1])            # [out_w, src_w]
    # f32 sources interpolate at HIGHEST so the matmul formulation stays
    # exact like the gather/lerp it replaced (TPU DEFAULT would compute
    # f32 operands in bf16 — a silent fidelity downgrade in f32 runs).
    # bf16 sources keep DEFAULT: the taps are already bf16-valued, and
    # the ~2^-8 weight rounding is the same order as the mode's own
    # model error (HIGHEST would triple the resize cost for nothing).
    prec = (
        jax.lax.Precision.HIGHEST
        if src.dtype == jnp.float32 else None
    )
    rows = jnp.einsum("uh,...hw->...uw", wy, src, precision=prec)
    out = jnp.einsum("vw,...uw->...uv", wx, rows, precision=prec)

    oy = jax.lax.broadcasted_iota(jnp.int32, out_cap, 0)
    ox = jax.lax.broadcasted_iota(jnp.int32, out_cap, 1)
    mask = (oy < oh) & (ox < ow)
    return jnp.where(mask, out, 0.0)
