"""CAM classifier training (stage contract: step/train_cam.py).

5 epochs, batch 16, crop 512, multilabel soft-margin loss, poly SGD with a
10x head LR; aug = random long-edge resize (320, 640) + flip + random crop.
Data parallelism is batch sharding over the mesh with XLA-inserted gradient
all-reduce over ICI (replacing nn.DataParallel, train_cam.py:62)."""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import optax

from irn_tpu.models.cam import CAMNet, multilabel_soft_margin_loss
from irn_tpu.train.state import TrainState


def make_train_step(model: CAMNet, tx: optax.GradientTransformation):
    """Returns jitted (state, images, labels) -> (state, metrics)."""

    @jax.jit
    def train_step(state: TrainState, images: jax.Array, labels: jax.Array
                   ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        def loss_fn(params):
            logits = model.apply(
                {"params": params, "stats": state.stats}, images, train=True
            )
            return multilabel_soft_margin_loss(logits, labels)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params, opt_state=opt_state, step=state.step + 1
        )
        return new_state, {"loss": loss}

    return train_step


def make_eval_step(model: CAMNet):
    @jax.jit
    def eval_step(state: TrainState, images: jax.Array, labels: jax.Array):
        logits = model.apply(state.variables, images, train=False)
        return multilabel_soft_margin_loss(logits, labels)

    return eval_step
