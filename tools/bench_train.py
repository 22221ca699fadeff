"""Training-step throughput at the reference's production settings.

The reference prints "imps" (images/sec) in its train loops
(step/train_cam.py:92, step/train_irn.py:81) but never records them; this
measures our jitted steps steady-state on the current accelerator so
BASELINE.md carries concrete train-side numbers:

- CAM: batch 16, 512^2, multilabel soft-margin, poly SGD, 10x head LR
  (step/train_cam.py:39-94)
- IRN: batch 32, 512^2, PathIndex radius 10, 4 masked affinity/dp losses,
  remat (step/train_irn.py:10-83)

Axon-tunnel rules: batches generated ON device (a bs32 512^2 f32 upload
through the tunnel is minutes), distinct batch per step, one scalar fetch
drains the queue.

Usage: python tools/bench_train.py [--dtype float32] [--steps 8]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from irn_tpu.models.cam import CAMNet
from irn_tpu.models.irn import IRNet
from irn_tpu.train import cam_train, irn_train, optim
from irn_tpu.train.state import create_train_state


def device_batches(n, shapes_dtypes, seed0=0):
    """n pytrees of on-device random arrays (images in [0,1), labels)."""
    outs = []
    for s in range(n):
        key = jax.random.PRNGKey(seed0 + s)
        batch = []
        for shape, dtype, kind in shapes_dtypes:
            key, sub = jax.random.split(key)
            if kind == "img":
                batch.append(jax.random.uniform(sub, shape, jnp.float32))
            elif kind == "multihot":
                batch.append(
                    (jax.random.uniform(sub, shape) < 0.15).astype(jnp.float32)
                )
            else:  # seg label map with ignore pixels
                lab = jax.random.randint(sub, shape, 0, 21, jnp.int32)
                key, sub = jax.random.split(key)
                ign = jax.random.uniform(sub, shape) < 0.3
                batch.append(jnp.where(ign, 255, lab))
        outs.append(batch)
    return outs


def steady(step, state, batches, reps):
    state, m = step(state, *batches[0])  # compile + warm
    jax.tree.map(lambda x: x.block_until_ready(), m)
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        for b in batches[1:]:
            state, m = step(state, *b)
        lm = m["loss"] if isinstance(m, dict) else m
        float(lm)  # fetch forces the queue through the tunnel
        best = min(best, (time.perf_counter() - t0) / (len(batches) - 1))
    return best, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cam-bs", type=int, default=16)
    ap.add_argument("--irn-bs", type=int, default=32)
    args = ap.parse_args()
    dtype = jnp.dtype(args.dtype)

    # CAM: reference production settings (train_cam.py:44-62)
    model = CAMNet(dtype=dtype, stop_grad_at="c3")
    variables = jax.tree.map(
        np.asarray,
        model.init(jax.random.PRNGKey(0),
                   np.zeros((1, 512, 512, 3), np.float32), train=True),
    )
    tx = optim.poly_sgd(0.1, max_step=3305, power=0.9, weight_decay=1e-4,
                        momentum=1e-4, mult_fn=optim.cam_lr_mult)
    state = create_train_state(variables, tx)
    step = cam_train.make_train_step(model, tx)
    batches = device_batches(
        args.steps + 1,
        [((args.cam_bs, 512, 512, 3), jnp.float32, "img"),
         ((args.cam_bs, 20), jnp.float32, "multihot")],
    )
    dt, _ = steady(step, state, batches, args.reps)
    print(f"train_cam  bs={args.cam_bs} 512^2 {args.dtype}: "
          f"{dt * 1000:7.1f} ms/step  {args.cam_bs / dt:6.1f} img/s",
          flush=True)

    # IRN: radius-10 PathIndex on the 128^2 stride-4 grid (train_irn.py:12)
    model = IRNet(dtype=dtype)
    variables = jax.tree.map(
        np.asarray,
        model.init(jax.random.PRNGKey(0),
                   np.zeros((1, 512, 512, 3), np.float32)),
    )
    grid = irn_train.build_train_geometry(512, 10)
    tx = optim.poly_sgd(0.1, max_step=990, power=0.9, weight_decay=1e-4,
                        momentum=1e-4, mult_fn=optim.irn_lr_mult)
    state = create_train_state(variables, tx)
    step = irn_train.make_train_step(model, tx, grid)
    batches = device_batches(
        args.steps + 1,
        [((args.irn_bs, 512, 512, 3), jnp.float32, "img"),
         ((args.irn_bs, 128, 128), jnp.int32, "seg")],
    )
    dt, _ = steady(step, state, batches, args.reps)
    print(f"train_irn  bs={args.irn_bs} 512^2 {args.dtype}: "
          f"{dt * 1000:7.1f} ms/step  {args.irn_bs / dt:6.1f} img/s",
          flush=True)


if __name__ == "__main__":
    main()
