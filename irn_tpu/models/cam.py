"""Multi-label CAM classifier (Flax, NHWC).

Behavioral contract (matches /root/reference/net/resnet50_cam.py):

- ResNet-50 backbone, strides (2, 2, 2, 1); gradients are blocked through
  layer2's output (detach at resnet50_cam.py:28), so the stem and layers 1-2
  are effectively frozen while layers 3-4 train at 1x LR and the classifier
  head at 10x LR.
- Head: bias-free 1x1 conv 2048 -> n_classes. During training it is applied
  after global average pooling (logits, resnet50_cam.py:33-35); at inference
  it is applied *before* pooling to produce per-class activation maps
  followed by ReLU (resnet50_cam.py:65-66).
- Flip fusion (``x[0] + x[1].flip(-1)``, resnet50_cam.py:68) is a pipeline
  concern here: :func:`fuse_flip` operates on a [2, H, W, C] stack.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from irn_tpu.models.resnet import ResNet50


class CAMNet(nn.Module):
    """ResNet-50 multi-label classifier with a CAM inference path.

    ``stop_grad_at``: feature through which training gradients are blocked;
    "c3" is the reference's detach-after-layer2 (the faithful default, which
    assumes an ImageNet-pretrained stem); None trains the full backbone.
    """

    n_classes: int = 20
    dtype: jnp.dtype = jnp.float32
    stop_grad_at: str | None = "c3"

    def setup(self):
        self.resnet50 = ResNet50(strides=(2, 2, 2, 1), dtype=self.dtype)
        # bias-free 1x1 conv == dense over channels
        self.classifier = nn.Conv(
            self.n_classes, (1, 1), use_bias=False, name="classifier"
        )

    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        """Classification logits [B, n_classes].

        ``train=True`` blocks gradients through ``stop_grad_at`` like the
        reference's detach; inference skips the stop_gradient (no-op anyway).
        """
        feats = self.resnet50(
            x, stop_grad_after=self.stop_grad_at if train else None
        )
        x = feats["c5"]
        x = jnp.mean(x, axis=(1, 2), keepdims=True)  # GAP, [B,1,1,2048]
        x = self.classifier(x)
        return x.reshape(x.shape[0], self.n_classes)

    def calibrate_stats(self, x: jax.Array) -> jax.Array:
        """One calibration forward: writes batch statistics into every
        frozen-BN's running stats (apply with ``mutable=['stats']``).
        Enables from-scratch training, where the reference's frozen
        ImageNet statistics don't exist."""
        feats = self.resnet50(x, calibrate=True)
        return jnp.mean(feats["c5"], axis=(1, 2))

    def cam(self, x: jax.Array, extent=None) -> jax.Array:
        """Raw per-class activation maps [B, h, w, n_classes] (stride 16).

        ``extent``: dynamic (h, w) true extent when ``x`` is a padded
        buffer — masks propagate through the backbone so in-extent maps
        match an exact-size run bit-for-bit (the reference's make_cam runs
        exact shapes)."""
        feats = self.resnet50(x, extent=extent)
        maps = self.classifier(feats["c5"])
        return nn.relu(maps)


def fuse_flip(cam_pair: jax.Array) -> jax.Array:
    """Fuse an (original, horizontally-flipped) CAM pair.

    ``cam_pair`` is [2, h, w, C] where entry 1 was computed on the flipped
    image; returns [h, w, C] = orig + flip-back(flipped)
    (resnet50_cam.py:68).
    """
    return cam_pair[0] + cam_pair[1][:, ::-1, :]


def multilabel_soft_margin_loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """torch.nn.functional.multilabel_soft_margin_loss (mean over batch and
    classes): -mean( y*log(sigmoid(x)) + (1-y)*log(sigmoid(-x)) )."""
    log_pos = jax.nn.log_sigmoid(logits)
    log_neg = jax.nn.log_sigmoid(-logits)
    per_class = -(targets * log_pos + (1.0 - targets) * log_neg)
    return jnp.mean(per_class)
