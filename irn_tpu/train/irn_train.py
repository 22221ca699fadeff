"""IRNet training (stage contract: step/train_irn.py).

3 epochs, batch 32, crop 512, PathIndex radius 10 on the 128^2 stride-4
grid; the four masked affinity/displacement losses with the reference's
weighting; post-training displacement-mean calibration written into the
``stats`` collection (MeanShift, train_irn.py:95-107).

The affinity label masks are computed on device from the reduced label map
(a gather + compares), not in data workers."""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from irn_tpu.models.irn import IRNet
from irn_tpu.ops import paths
from irn_tpu.ops.affinity import (
    affinity_displacement_loss_maps,
    affinity_labels_2d,
    irn_total_loss,
)
from irn_tpu.train.state import TrainState


def build_train_geometry(crop_size: int = 512, radius: int = 10) -> paths.GridPathIndex:
    ps = paths.build_path_set(radius)
    return paths.build_grid_index(ps, (crop_size // 4, crop_size // 4))


def make_train_step(model: IRNet, tx: optax.GradientTransformation,
                    grid_index: paths.GridPathIndex):
    path_set = grid_index.path_set

    @jax.jit
    def train_step(state: TrainState, images: jax.Array,
                   reduced_labels: jax.Array
                   ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        bg_pos, fg_pos, neg = affinity_labels_2d(reduced_labels, path_set)

        # NO remat: round 2 wrapped the loss maps in jax.checkpoint
        # because the path-max *scan* stored [L_max, n_pairs, B, ch, cw]
        # carries (5.4 GB, OOM at bs32). The unrolled path-max custom VJP
        # already keeps only an int8 argmax (ops/affinity.py:_path_max),
        # so the blanket remat only re-ran the loss maps in the backward:
        # dropping it measured 196.8 -> 155.8 ms/step bf16 (222 -> 178
        # f32) at bs32 with comfortable memory, and compiles faster too
        # (BASELINE.md round-3).
        def loss_fn(params):
            edge_logit, dp = model.apply(
                {"params": params, "stats": state.stats}, images
            )
            maps = affinity_displacement_loss_maps(edge_logit, dp, grid_index)
            return irn_total_loss(maps, bg_pos, fg_pos, neg)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params, opt_state=opt_state, step=state.step + 1
        )
        metrics = dict(metrics)
        metrics["loss"] = loss
        return new_state, metrics

    return train_step


def make_dp_mean_step(model: IRNet):
    """Per-batch displacement means for the MeanShift calibration
    (train_irn.py:95-107): mean over batch and space per channel."""

    @jax.jit
    def dp_mean_step(state: TrainState, images: jax.Array) -> jax.Array:
        _, dp = model.apply(state.variables, images)
        return jnp.mean(dp, axis=(0, 1, 2))  # [2]

    return dp_mean_step


def calibrate_mean_shift(state: TrainState, dp_means) -> TrainState:
    """Write mean(dp_means) into stats['dp_mean'] (the model's MeanShift)."""
    mean = jnp.mean(jnp.stack(list(dp_means)), axis=0)
    stats = dict(state.stats)
    stats["dp_mean"] = mean.astype(jnp.float32)
    return state.replace(stats=stats)
