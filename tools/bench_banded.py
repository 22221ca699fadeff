"""Banded random-walk propagation sweep: square_times (e) x apply j-block.

The banded chain's HBM traffic per application is ~n*(bj + 2h_e) bytes with
h_e = h << e, while the application count is 2^(E-e) — so e trades banded
squaring FLOPs against thin-application traffic, and bj trades read
contiguity/grid-step count against band over-read. This sweep times the
FULL banded propagate (build + squarings + application chain + decode
input) at the production bucket geometries on the real chip to pin the
defaults (SURVEY 2.5 is the workload; misc/indexing.py:141-166 the
reference evaluation).

Axon-tunnel rules (CLAUDE.md): operands generated on device, fresh seeds
per timed run, scalar fetch to force execution.

Usage:
  python tools/bench_banded.py                # (96,128) VOC-typical bucket
  python tools/bench_banded.py --cap 128 128  # 512px worst case
"""

from __future__ import annotations

import argparse
import functools
import os
import time

import jax
import jax.numpy as jnp

from irn_tpu.ops import random_walk as rw_mod

EXP_TIMES = 8
BETA = 10


def make_inputs(geom, seed: int, c: int = 24):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    ch, cw = geom.cap
    edge = jax.random.uniform(k1, (ch, cw), jnp.float32)
    cam = jax.random.uniform(k2, (c, ch, cw), jnp.float32)
    return cam, edge


def make_run(geom, e, bj, banded):
    @jax.jit
    def run(cam, edge):
        if banded:
            rw = rw_mod.propagate_banded(
                geom, cam, edge, beta=BETA, exp_times=EXP_TIMES,
                matmul_dtype=jnp.bfloat16, square_times=e, bj=bj,
            )
        else:
            rw = rw_mod.propagate(
                geom, cam, edge, beta=BETA, exp_times=EXP_TIMES,
                matmul_dtype=jnp.bfloat16, square_times=e,
            )
        return rw.sum()

    return run


def timed(geom, e, bj, banded=True, reps=2, n_images=8):
    """Steady-state per-image time, bench.py methodology: enqueue
    ``n_images`` distinct inputs back-to-back, fetch only the last scalar
    (dispatch/tunnel latency overlaps across the queue)."""
    run = make_run(geom, e, bj, banded)
    seeds = iter(range(1000))
    best = float("inf")
    for r in range(reps + 1):
        ins = [make_inputs(geom, next(seeds)) for _ in range(n_images)]
        for cam, edge in ins:
            float(cam[0, 0, 0])  # materialize inputs before timing
        t0 = time.perf_counter()
        for cam, edge in ins:
            out = run(cam, edge)
        float(out)
        if r:  # rep 0 is compile+warm
            best = min(best, (time.perf_counter() - t0) / n_images)
    return best


def make_run_batch(geom, e, bimg):
    @jax.jit
    def run(cams, edges):
        rw = rw_mod.propagate_banded_batch(
            geom, cams, edges, beta=BETA, exp_times=EXP_TIMES,
            matmul_dtype=jnp.bfloat16, square_times=e,
        )
        return rw.sum()

    return run


def timed_batch(geom, e, bimg, reps=2, n_images=8):
    run = make_run_batch(geom, e, bimg)
    seeds = iter(range(2000, 3000))
    best = float("inf")
    for r in range(reps + 1):
        groups = []
        for _ in range(n_images // bimg):
            ins = [make_inputs(geom, next(seeds)) for _ in range(bimg)]
            cams = jnp.stack([c for c, _ in ins])
            edges = jnp.stack([ed for _, ed in ins])
            float(cams[0, 0, 0, 0])
            groups.append((cams, edges))
        t0 = time.perf_counter()
        for cams, edges in groups:
            out = run(cams, edges)
        float(out)
        if r:
            best = min(best, (time.perf_counter() - t0)
                       / (len(groups) * bimg))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, nargs=2, default=(96, 128))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--batch_only", action="store_true")
    ap.add_argument("--impl", default=None, choices=("xla", "pallas"),
                    help="apply-chain body (IRN_TPU_APPLY); default xla")
    args = ap.parse_args()
    if args.impl:
        os.environ["IRN_TPU_APPLY"] = args.impl
    assert jax.default_backend() == "tpu", "sweep needs the TPU"

    geom = rw_mod.build_geometry(*args.cap, radius=5)
    h = rw_mod.band_halfwidth(geom)
    n = geom.n_pad
    print(f"bucket {tuple(args.cap)}: n_pad={n}, band h={h}")

    if not args.batch_only:
        e_dense = rw_mod.pick_square_times(n, EXP_TIMES,
                                           matmul_dtype=jnp.bfloat16)
        dt = timed(geom, e_dense, None, banded=False, reps=args.reps)
        print(f"dense hybrid e={e_dense}: {dt * 1000:7.1f} ms", flush=True)

        for e in range(0, EXP_TIMES + 1):
            if not rw_mod.banded_fits(geom, EXP_TIMES, e):
                print(f"banded e={e}: band outgrows matrix, skipped")
                continue
            for bj in (512, 1024, 2048):
                if n % bj:
                    continue
                dt = timed(geom, e, bj, reps=args.reps)
                print(f"banded e={e} bj={bj}: {dt * 1000:7.1f} ms",
                      flush=True)

    # multi-image batched apply chain (VERDICT r2 #5): per-image builds,
    # one fused application chain per group
    e = rw_mod.pick_square_times_banded(EXP_TIMES)
    for bimg in (1, 2, 4, 8):
        dt = timed_batch(geom, e, bimg, reps=args.reps)
        print(f"batched e={e} B={bimg}: {dt * 1000:7.1f} ms/img",
              flush=True)


if __name__ == "__main__":
    main()
