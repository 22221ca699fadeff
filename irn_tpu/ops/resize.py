"""Bilinear resize matching torch ``F.interpolate(align_corners=False)``.

Both use half-pixel source coordinates ``src = (dst + 0.5) * in/out - 0.5``
with border clamping and no antialiasing — ``jax.image.resize`` with
``method='linear', antialias=False``. Used wherever the reference calls
``F.interpolate``/``nn.Upsample`` (decoder upsamples, CAM rescaling,
random-walk x4 upsample)."""

from __future__ import annotations

from typing import Sequence, Tuple

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
