"""Optimizers: poly-decay SGD with per-group LR multipliers and freeze masks.

Reference contract (misc/torchutils.py:9-31 + step/train_cam.py:57-60,
step/train_irn.py:33-36): SGD with LR ``base_lr * (1 - step/max_step)^0.9``,
a 10x multiplier on the "new" parameter group (CAM classifier head; IRN
displacement branch), and frozen parameters receiving no updates at all.

Faithfulness note: the reference's PolyOptimizer passes its
``weight_decay`` argument into torch SGD's *momentum* positional slot
(torchutils.py:10), and its ``momentum=0.9`` attribute is only the poly
power — BUT the per-group dicts the train steps construct
(train_cam.py:57-59, train_irn.py:34-36) carry explicit ``weight_decay``
keys that override the swallowed constructor default. Net effective
hyper-parameters: **weight decay 1e-4 (real) + stray momentum 1e-4**,
which the stages reproduce exactly (pinned to torch in float64 by
tests/test_train_step_parity.py). Composition order matters and matches
torch SGD: decay -> momentum -> per-group LR mult -> schedule, with the
mult-0 freeze masks reproducing torch's skip of grad-less params.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import optax


def poly_schedule(base_lr: float, max_step: int, power: float = 0.9):
    """LR = base * (1 - step/max_step)^power, frozen at the last value after
    max_step (torchutils.py:21-27)."""

    def schedule(step):
        import jax.numpy as jnp

        # int32 / int yields float32 even under enable_x64 (optax's count
        # is int32) — cast to the configured float width so float64 step
        # parity against the reference holds to ~1e-15
        ftype = jnp.result_type(float)
        frac = jnp.minimum(step, max_step - 1).astype(ftype) / max_step
        return base_lr * (1.0 - frac) ** power

    return schedule


def scale_by_path(mult_fn: Callable[[tuple], float]) -> optax.GradientTransformation:
    """Multiply each leaf's update by ``mult_fn(path)`` (param-group LRs and
    freeze masks in one mechanism)."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        scaled = jax.tree_util.tree_map_with_path(
            lambda path, u: u * mult_fn(tuple(k.key for k in path)), updates
        )
        return scaled, state

    return optax.GradientTransformation(init, update)


def poly_sgd(
    base_lr: float,
    max_step: int,
    power: float = 0.9,
    momentum: float = 0.0,
    weight_decay: float = 0.0,
    mult_fn: Optional[Callable[[tuple], float]] = None,
) -> optax.GradientTransformation:
    """SGD + poly LR decay + per-path LR multipliers.

    ``mult_fn(path) -> float`` returns the LR multiplier for a param path
    (0.0 freezes; 10.0 is the reference's new-head group)."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if momentum:
        parts.append(optax.trace(decay=momentum))
    if mult_fn is not None:
        parts.append(scale_by_path(mult_fn))
    parts.append(optax.scale_by_schedule(poly_schedule(base_lr, max_step, power)))
    parts.append(optax.scale(-1.0))
    return optax.chain(*parts)


def sgdr_schedule(base_lr: float, steps_per_epoch: int, epoch_start: int = 1,
                  restart_mult: int = 2):
    """Cosine-annealing warm-restart LR (the reference's SGDROptimizer,
    torchutils.py:33-63 — present in its API surface though unused by the
    pipeline): cycle length starts at ``steps_per_epoch * epoch_start`` and
    multiplies by ``restart_mult`` per restart; peak LR decays as
    1/(restarts + 1)."""
    import numpy as np

    c0 = steps_per_epoch * epoch_start
    m = restart_mult

    if m == 1:
        # constant cycle length: closed form, restarts forever (the
        # precomputed-table path used to stop restarting after its 64th
        # entry and run the cosine past pi — found by review)
        def schedule(step):
            import jax.numpy as jnp

            step = jnp.asarray(step)
            k = step // c0
            local = step - k * c0
            mult = (1 + jnp.cos(jnp.pi * local / c0)) / 2
            return base_lr * mult / (k + 1)

        return schedule

    # m >= 2: exact integer cycle boundaries, capped inside int32 (x64 is
    # disabled by default, so boundaries must not overflow when traced).
    # Lengths grow geometrically, so the boundaries pass 2^30 within ~31
    # entries — the table can never be exhausted by a reachable step.
    limit = 2**30
    starts_l = [0]
    lengths_l = [c0]
    while starts_l[-1] + lengths_l[-1] < limit:
        starts_l.append(starts_l[-1] + lengths_l[-1])
        lengths_l.append(lengths_l[-1] * m)
    starts = np.asarray(starts_l, np.int32)
    lengths = np.asarray(lengths_l, np.int32)

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step)
        k = jnp.sum(step >= jnp.asarray(starts)) - 1
        start = jnp.asarray(starts)[k]
        length = jnp.asarray(lengths)[k]
        local = step - start
        mult = (1 + jnp.cos(jnp.pi * local / length)) / 2
        return base_lr * mult / (k + 1)

    return schedule


def sgdr(base_lr: float, steps_per_epoch: int, epoch_start: int = 1,
         restart_mult: int = 2, weight_decay: float = 0.0,
         mult_fn: Optional[Callable[[tuple], float]] = None
         ) -> optax.GradientTransformation:
    """Reference-faithful SGDR: like PolyOptimizer, SGDROptimizer's
    constructor passes weight_decay into torch SGD's *momentum*
    positional (torchutils.py:36) — and unlike the Poly train stages, no
    per-group dicts ever restore real decay (the optimizer is unused by
    the pipeline). The effective reference behavior for ``weight_decay``
    is therefore stray momentum and ZERO decayed weights, reproduced
    here."""
    parts = []
    if weight_decay:
        parts.append(optax.trace(decay=weight_decay))
    if mult_fn is not None:
        parts.append(scale_by_path(mult_fn))
    parts.append(optax.scale_by_schedule(
        sgdr_schedule(base_lr, steps_per_epoch, epoch_start, restart_mult)
    ))
    parts.append(optax.scale(-1.0))
    return optax.chain(*parts)


# --- param-group policies -------------------------------------------------

CAM_FROZEN_PREFIXES = ("conv1", "bn1", "layer1_", "layer2_")


def cam_lr_mult(path: tuple) -> float:
    """CAM net groups: stem+layer1+layer2 frozen (detach at
    resnet50_cam.py:28 + train() freeze at :39-43), layer3/4 1x, head 10x."""
    if path and path[0] == "classifier":
        return 10.0
    if len(path) >= 2 and path[0] == "resnet50":
        name = path[1]
        if any(name.startswith(p) for p in CAM_FROZEN_PREFIXES):
            return 0.0
        return 1.0
    return 1.0


def cam_lr_mult_full(path: tuple) -> float:
    """CAM groups with no backbone freeze (for from-scratch training where
    no ImageNet stem exists): backbone 1x, head 10x."""
    return 10.0 if path and path[0] == "classifier" else 1.0


def irn_lr_mult(path: tuple) -> float:
    """IRN groups: backbone frozen (resnet50_irn.py:111-115), edge branch
    1x, displacement branch 10x (train_irn.py:33-36)."""
    if path and path[0] == "resnet50":
        return 0.0
    if path and path[0].startswith("fc_dp"):
        return 10.0
    return 1.0
