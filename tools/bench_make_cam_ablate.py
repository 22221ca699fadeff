"""make_cam device-compute ablation (VERDICT r2 #3).

Decomposes the 77 img/s make_cam scale-pass chain into its components on
the real chip to find where the time goes relative to the ~160 GFLOP/img
of backbone math (which at even 50% MFU would be ~600 img/s):

- full        : the production 4-scale chain (build_cam_scale_pass)
- fwd         : backbone+CAM-head forwards only (no resizes/accumulation)
- fwd-nomask  : forwards with extent masking disabled (timing signal for
                the per-spatial-op dynamic-extent masks; results are NOT
                bit-exact — never a production mode)
- scale=s     : one full scale pass alone, per scale (pixel scaling law)
- resize      : the two dynamic-extent resizes + accumulate alone

Methodology: distinct pre-uploaded inputs, one scalar fetch per chunk
(axon tunnel rules, CLAUDE.md).

Usage: python tools/bench_make_cam_ablate.py [--k 16] [--images 48]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

from irn_tpu.data import transforms as T
from irn_tpu.models.cam import CAMNet
from irn_tpu.pipeline.stages_cam import build_cam_scale_pass
from bench_make_cam import SIZE, SCALES, S4_CAP, SU_CAP, prepare_chunks

assert SIZE and SCALES  # re-exported production geometry


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--images", type=int, default=48)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--only", nargs="+", default=None,
                    help="subset of variants: full fwd nomask scales")
    args = ap.parse_args()
    k = args.k

    rng = np.random.default_rng(0)
    model = CAMNet(dtype=jnp.dtype(args.dtype))
    variables = jax.tree.map(
        np.asarray,
        model.init(jax.random.PRNGKey(0),
                   np.zeros((1, 64, 64, 3), np.float32)),
    )
    print(f"backend={jax.default_backend()} dtype={args.dtype} k={k}",
          flush=True)

    n = (args.images // k) * k
    chunks = prepare_chunks(rng, n, k)
    chunks = [
        [(jax.device_put(p), *s) for p, *s in per_scale]
        for per_scale in chunks
    ]

    mean = jnp.asarray(T.IMAGENET_MEAN)
    std = jnp.asarray(T.IMAGENET_STD)

    @functools.lru_cache(maxsize=None)
    def fwd_pass(ph, pw, masked):
        @jax.jit
        def run(img_u8, sh, sw):
            x = (img_u8.astype(jnp.float32) / 255.0 - mean) / std
            pr = jax.lax.broadcasted_iota(jnp.int32, (ph, pw), 0)
            pc = jax.lax.broadcasted_iota(jnp.int32, (ph, pw), 1)
            x = jnp.where(((pr < sh) & (pc < sw))[None, ..., None], x, 0.0)
            flip = jnp.roll(x[:, :, ::-1, :], -(pw - sw), axis=2)
            stack = jnp.concatenate([x, flip], axis=0)
            maps = model.apply(
                variables, stack,
                extent=(sh, sw) if masked else None, method=model.cam,
            )
            return maps.sum()

        return run

    def time_variant(label, fn):
        fn(chunks[0])  # warm
        t0 = time.perf_counter()
        for ch in chunks[1:]:
            fn(ch)
        dt = time.perf_counter() - t0
        n_timed = (len(chunks) - 1) * k
        print(f"{label:14s}: {dt / n_timed * 1000:7.2f} ms/img "
              f"({n_timed / dt:6.1f} img/s)", flush=True)
        return dt / n_timed

    scale_pass = build_cam_scale_pass(model, variables, S4_CAP, SU_CAP)

    def run_full(per_scale):
        s_acc = jnp.zeros((k, 20, S4_CAP, S4_CAP), jnp.float32)
        h_acc = jnp.zeros((k, 20, SU_CAP, SU_CAP), jnp.float32)
        for padded, *scalars in per_scale:
            ph, pw = padded.shape[1:3]
            s_acc, h_acc = scale_pass(ph, pw, k)(
                padded, *[jnp.int32(s) for s in scalars], s_acc, h_acc
            )
        float(s_acc.sum())

    def run_fwd(per_scale, masked=True):
        outs = []
        for padded, sh, sw, *_ in per_scale:
            ph, pw = padded.shape[1:3]
            outs.append(fwd_pass(ph, pw, masked)(
                padded, jnp.int32(sh), jnp.int32(sw)))
        float(sum(outs))

    def run_one_scale(per_scale, idx):
        padded, *scalars = per_scale[idx]
        ph, pw = padded.shape[1:3]
        s_acc = jnp.zeros((k, 20, S4_CAP, S4_CAP), jnp.float32)
        h_acc = jnp.zeros((k, 20, SU_CAP, SU_CAP), jnp.float32)
        s_acc, h_acc = scale_pass(ph, pw, k)(
            padded, *[jnp.int32(s) for s in scalars], s_acc, h_acc
        )
        float(s_acc.sum())

    sel = set(args.only or ("full", "fwd", "nomask", "scales"))
    t_full = time_variant("full", run_full) if "full" in sel else None
    t_fwd = time_variant("fwd", run_fwd) if "fwd" in sel else None
    if "nomask" in sel:
        time_variant("fwd-nomask", lambda ch: run_fwd(ch, masked=False))
    if "scales" in sel:
        for idx, s in enumerate(SCALES):
            time_variant(f"scale={s}", lambda ch, i=idx: run_one_scale(ch, i))
    if t_full is not None and t_fwd is not None:
        print(f"full - fwd   : {1000 * (t_full - t_fwd):7.2f} ms/img "
              "(resizes + accumulation + glue)", flush=True)


if __name__ == "__main__":
    main()
