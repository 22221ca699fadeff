"""ResNet-50 backbone with frozen batch-norm statistics (Flax, NHWC).

Behavioral contract (matches /root/reference/net/resnet50.py):

- Bottleneck [3, 4, 6, 3]; constructor-configurable per-layer strides and
  dilations; the *first* block of each layer is always built with dilation 1
  regardless of the layer's dilation argument (resnet50.py:86).
- Batch norm always applies the stored running statistics ("FixedBatchNorm",
  resnet50.py:11-14): the running mean/var are immutable constants held in
  the ``stats`` collection, while the affine scale/bias are ordinary params
  (they do receive gradients wherever the backbone is trainable).
- Both IRNet and the CAM classifier use strides (2, 2, 2, 1) => overall
  stride 16, with layer4 at stride 1.

TPU-first design notes: NHWC layout throughout, explicit symmetric conv
padding reproducing torch's arithmetic, and a ``stop_grad_after`` knob so
training configurations freeze a prefix of the network with
``lax.stop_gradient`` instead of optimizer bookkeeping (the XLA-friendly way
to express the reference's per-stage ``.detach()`` calls).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# Feature names in forward order; ``stop_grad_after`` refers to these.
FEATURE_NAMES = ("stem", "c2", "c3", "c4", "c5")


class FrozenBatchNorm(nn.Module):
    """Batch norm that always normalizes with stored running statistics.

    ``scale``/``bias`` are trainable params; ``mean``/``var`` live in the
    ``stats`` collection and are never updated by training.
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, calibrate: bool = False) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable(
            "stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        var = self.variable(
            "stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        if calibrate:
            # stats-calibration mode (apply with mutable=['stats']): write
            # the batch distribution into the frozen stats and normalize
            # with it, so downstream layers calibrate against normalized
            # inputs. For training without pretrained running statistics.
            xf = x.astype(jnp.float32)
            bm = jnp.mean(xf, axis=(0, 1, 2))
            bv = jnp.var(xf, axis=(0, 1, 2))
            if not self.is_initializing():
                mean.value = bm
                var.value = bv
        inv = (scale * jax.lax.rsqrt(var.value + self.eps)).astype(x.dtype)
        shift = (bias - mean.value * scale * jax.lax.rsqrt(var.value + self.eps)).astype(
            x.dtype
        )
        return x * inv + shift


def _conv(features: int, kernel: int, stride: int = 1, dilation: int = 1,
          padding: int = 0, name: Optional[str] = None,
          dtype=None) -> nn.Conv:
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        kernel_dilation=(dilation, dilation),
        use_bias=False,
        name=name,
        dtype=dtype,
    )


def _extent_mask_nhwc(x: jax.Array, extent) -> jax.Array:
    """Zero NHWC activations at/beyond a dynamic (eh, ew) spatial extent.

    Reproduces exact-size inference inside a padded buffer: values beyond
    the true extent would not exist in an exact-size run, and every spatial
    op (7x7/3x3 conv, maxpool) implicitly zero-pads there — so its *input*
    must be zero beyond the extent. Without this, frozen-BN shifts turn the
    zero-padded region into nonzero "hallucinated" features that bleed into
    border cells (the reference's make_cam runs exact shapes,
    step/make_cam.py:35)."""
    if extent is None:
        return x
    eh, ew = extent
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape[1:3], 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape[1:3], 1)
    mask = ((rows < eh) & (cols < ew)).astype(x.dtype)
    return x * mask[None, :, :, None]


def _halve_extent(extent):
    """Spatial extent after a stride-2 k3/p1 (or k7/p3, or maxpool k3/p1)
    op: floor((e - 1) / 2) + 1 == ceil(e / 2) (torch arithmetic)."""
    if extent is None:
        return None
    eh, ew = extent
    return (eh - 1) // 2 + 1, (ew - 1) // 2 + 1


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride, dilation) -> 1x1(x4) with identity/projection skip."""

    planes: int
    stride: int = 1
    dilation: int = 1
    project: bool = False  # True when a 1x1-projection skip is needed
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, extent=None,
                 calibrate: bool = False) -> jax.Array:
        residual = x
        out = _conv(self.planes, 1, name="conv1", dtype=self.dtype)(x)
        out = FrozenBatchNorm(self.planes, name="bn1")(out, calibrate)
        out = nn.relu(out)
        out = _extent_mask_nhwc(out, extent)  # before the spatial conv
        out = _conv(self.planes, 3, stride=self.stride, dilation=self.dilation,
                    padding=self.dilation, name="conv2", dtype=self.dtype)(out)
        out = FrozenBatchNorm(self.planes, name="bn2")(out, calibrate)
        out = nn.relu(out)
        out = _conv(self.planes * 4, 1, name="conv3", dtype=self.dtype)(out)
        out = FrozenBatchNorm(self.planes * 4, name="bn3")(out, calibrate)
        if self.project:
            residual = _conv(self.planes * 4, 1, stride=self.stride,
                             name="down_conv", dtype=self.dtype)(x)
            residual = FrozenBatchNorm(self.planes * 4, name="down_bn")(
                residual, calibrate)
        return nn.relu(out + residual)


class ResNet50(nn.Module):
    """Stage-feature extractor. Returns dict of NHWC features.

    Features: ``stem`` (64ch, stride 4, post-maxpool), ``c2``..``c5``
    (256/512/1024/2048 ch). ``stop_grad_after`` names the last feature that
    still has gradients *blocked through it* — e.g. ``"c3"`` reproduces the
    CAM net's detach-after-layer2 (resnet50_cam.py:28), ``"c5"`` freezes the
    whole backbone (resnet50_irn.py:111-115).
    """

    strides: Sequence[int] = (2, 2, 2, 1)
    dilations: Sequence[int] = (1, 1, 1, 1)
    blocks: Sequence[int] = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, stop_grad_after: Optional[str] = None,
                 extent=None, calibrate: bool = False):
        """``extent``: optional dynamic (h, w) true-content extent of a
        padded input buffer; activations beyond it are zeroed before every
        spatial op so outputs inside the (progressively strided) extent are
        bit-identical to an exact-size run."""
        if stop_grad_after is not None and stop_grad_after not in FEATURE_NAMES:
            raise ValueError(f"unknown feature {stop_grad_after!r}")
        x = x.astype(self.dtype)

        def maybe_stop(feat: jax.Array, name: str) -> jax.Array:
            if stop_grad_after is None:
                return feat
            idx = FEATURE_NAMES.index(name)
            cut = FEATURE_NAMES.index(stop_grad_after)
            return jax.lax.stop_gradient(feat) if idx <= cut else feat

        feats = {}
        # the padded input is zero beyond the extent already (host pads 0)
        x = _conv(64, 7, stride=self.strides[0], padding=3, name="conv1",
                  dtype=self.dtype)(x)
        x = FrozenBatchNorm(64, name="bn1")(x, calibrate)
        x = nn.relu(x)
        if self.strides[0] == 2:  # track the stem's actual stride
            extent = _halve_extent(extent)
        x = _extent_mask_nhwc(x, extent)  # before the spatial maxpool
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        extent = _halve_extent(extent)
        x = maybe_stop(x, "stem")
        feats["stem"] = x

        planes = (64, 128, 256, 512)
        layer_strides = (1, self.strides[1], self.strides[2], self.strides[3])
        for li in range(4):
            for bi in range(self.blocks[li]):
                first = bi == 0
                stride = layer_strides[li] if first else 1
                x = Bottleneck(
                    planes=planes[li],
                    stride=stride,
                    # reference quirk: first block of every layer ignores the
                    # layer dilation (resnet50.py:86)
                    dilation=1 if first else self.dilations[li],
                    project=first,
                    name=f"layer{li + 1}_{bi}",
                    dtype=self.dtype,
                )(x, extent=extent, calibrate=calibrate)
                if stride == 2:
                    extent = _halve_extent(extent)
            name = FEATURE_NAMES[li + 1]
            x = maybe_stop(x, name)
            feats[name] = x
        return feats
