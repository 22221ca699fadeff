"""IRNet: class-boundary and displacement-field decoders (Flax, NHWC).

Behavioral contract (matches /root/reference/net/resnet50_irn.py:7-141):

- Frozen ResNet-50 backbone (every stage detached, resnet50_irn.py:111-115);
  only the two decoder branches train.
- Boundary branch: per-stage 1x1 conv (bias-free) -> GroupNorm(4, 32) ->
  bilinear x2/x4 upsample for the stride-8/16 stages -> ReLU; all maps
  cropped to the stride-4 size of edge2; concat(160) -> 1x1 conv (bias) ->
  1-channel logit at stride 4.
- Displacement branch: fc_dp1..7 pyramid (64/128/256/256/256 -> 256 -> 2
  channels, GroupNorm(8|16, .), bilinear upsamples, crops) producing a
  2-channel (dy, dx) field at stride 4, with a terminal MeanShift that is
  identity in training and subtracts a calibrated running mean at eval
  (resnet50_irn.py:99-108).

The inference wrapper (pad-to-crop-size, flip-averaged sigmoid edge —
EdgeDisplacement, resnet50_irn.py:216-234) is
irn_tpu.pipeline.stages_irn.EdgeDisplacementRunner: one fixed-shape XLA
program with dynamic true extents serving every image.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from irn_tpu.models.resnet import ResNet50
from irn_tpu.ops.resize import resize_bilinear


class ConvGN(nn.Module):
    """Bias-free 1x1 conv -> GroupNorm -> optional bilinear upsample -> ReLU."""

    features: int
    groups: int
    upsample: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(self.features, (1, 1), use_bias=False, name="conv")(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, name="gn")(x)
        if self.upsample != 1:
            b, h, w, c = x.shape
            x = resize_bilinear(x, (h * self.upsample, w * self.upsample))
        return nn.relu(x)


class IRNet(nn.Module):
    """Two-headed inter-pixel relation network over a frozen backbone."""

    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.resnet50 = ResNet50(strides=(2, 2, 2, 1), dtype=self.dtype)
        self.fc_edge1 = ConvGN(32, 4)
        self.fc_edge2 = ConvGN(32, 4)
        self.fc_edge3 = ConvGN(32, 4, upsample=2)
        self.fc_edge4 = ConvGN(32, 4, upsample=4)
        self.fc_edge5 = ConvGN(32, 4, upsample=4)
        self.fc_edge6 = nn.Conv(1, (1, 1), use_bias=True)

        self.fc_dp1 = ConvGN(64, 8)
        self.fc_dp2 = ConvGN(128, 16)
        self.fc_dp3 = ConvGN(256, 16)
        self.fc_dp4 = ConvGN(256, 16, upsample=2)
        self.fc_dp5 = ConvGN(256, 16, upsample=2)
        self.fc_dp6 = ConvGN(256, 16, upsample=2)
        self.fc_dp7a = ConvGN(256, 16)
        self.fc_dp7b = nn.Conv(2, (1, 1), use_bias=False)
        # displacement calibration (MeanShift.running_mean,
        # resnet50_irn.py:99-108); written once post-training
        self.dp_mean = self.variable(
            "stats", "dp_mean", lambda: jnp.zeros((2,), jnp.float32)
        )

    def __call__(self, x: jax.Array, apply_mean_shift: bool = False):
        """Returns (edge_logit [B,h4,w4,1], displacement [B,h4,w4,2]).

        ``apply_mean_shift=True`` subtracts the calibrated displacement mean
        (eval-mode MeanShift)."""
        feats = self.resnet50(x, stop_grad_after="c5")  # fully frozen backbone
        x1, x2, x3, x4, x5 = (
            feats["stem"], feats["c2"], feats["c3"], feats["c4"], feats["c5"]
        )

        e1 = self.fc_edge1(x1)
        e2 = self.fc_edge2(x2)
        h2, w2 = e2.shape[1], e2.shape[2]
        e3 = self.fc_edge3(x3)[:, :h2, :w2, :]
        e4 = self.fc_edge4(x4)[:, :h2, :w2, :]
        e5 = self.fc_edge5(x5)[:, :h2, :w2, :]
        e1 = e1[:, :h2, :w2, :]
        edge = self.fc_edge6(jnp.concatenate([e1, e2, e3, e4, e5], axis=-1))

        d1 = self.fc_dp1(x1)
        d2 = self.fc_dp2(x2)
        d3 = self.fc_dp3(x3)
        h3, w3 = d3.shape[1], d3.shape[2]
        d4 = self.fc_dp4(x4)[:, :h3, :w3, :]
        d5 = self.fc_dp5(x5)[:, :h3, :w3, :]
        d_up3 = self.fc_dp6(jnp.concatenate([d3, d4, d5], axis=-1))[:, :h2, :w2, :]
        d1 = d1[:, :h2, :w2, :]
        dp = self.fc_dp7b(self.fc_dp7a(jnp.concatenate([d1, d2, d_up3], axis=-1)))

        if apply_mean_shift:
            dp = dp - self.dp_mean.value.astype(dp.dtype)
        return edge, dp
