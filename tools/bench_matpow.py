"""Transition-power benchmark: XLA dot vs Pallas kernels (VERDICT r1 #7).

Times the full T^(2^8) chain of the random-walk propagation (SURVEY 2.5) at
the pipeline's two production matrix sizes — 14336 (VOC-typical (96,128)
grid) and 18432 (512px worst case (128,128)) — for f32 and bf16 operands,
through three paths:

- xla:    T = A^beta col-normalized (XLA), 8 x jnp.dot squarings
- pallas: same T, 8 x blocked Pallas squarings
- fused:  Pallas A -> T^2 (pow + col-normalize folded into operand loads,
          T never hits HBM), then 7 Pallas squarings

Axon-tunnel rules: operands are generated ON device, one scalar fetch per
timed chain forces execution, and every timed call gets a fresh seed (the
tunnel value-caches identical executions).

Usage:
  python tools/bench_matpow.py                 # the BASELINE.md table
  python tools/bench_matpow.py --sweep         # block-size sweep (bf16 14k)
  python tools/bench_matpow.py --check         # small-size correctness
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from irn_tpu.ops.matpow_pallas import square_fused_first, square_pallas

EXP_TIMES = 8
BETA = 10


def make_a(n: int, seed: int) -> jax.Array:
    """Affinity-like matrix, generated on device: entries in [0,1], unit
    diagonal (as dense_affinity produces)."""
    a = jax.random.uniform(jax.random.PRNGKey(seed), (n, n), jnp.float32)
    return a.at[jnp.arange(n), jnp.arange(n)].set(1.0)


def normalize(a):
    b = a**BETA
    return b / jnp.sum(b, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("path", "dtype", "blocks"))
def chain(a, path: str, dtype, blocks):
    """Unrolled squaring chains, matching the production
    matrix_power_squarings (unrolled beats fori_loop on compile AND run:
    1.7 s/180 TFLOPS vs 11.1 s/157 TFLOPS for XLA at 18432 bf16)."""
    md = jnp.bfloat16 if dtype == "bf16" else None
    if path == "xla":
        t = normalize(a)
        for _ in range(EXP_TIMES):
            if md is not None:
                tb = t.astype(md)
                t = jnp.dot(tb, tb, preferred_element_type=jnp.float32)
            else:
                t = jnp.dot(t, t, precision=jax.lax.Precision.HIGHEST)
    elif path == "pallas":
        t = normalize(a)
        for _ in range(EXP_TIMES):
            t = square_pallas(t, matmul_dtype=md, blocks=blocks)
    elif path == "fused":
        t = square_fused_first(a, beta=BETA, matmul_dtype=md, blocks=blocks)
        for _ in range(EXP_TIMES - 1):
            t = square_pallas(t, matmul_dtype=md, blocks=blocks)
    else:
        raise ValueError(path)
    return t.sum()


def timed(n, path, dtype, blocks, reps=2):
    seeds = iter(range(1000))
    a = make_a(n, next(seeds))
    float(chain(a, path, dtype, blocks))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        a = make_a(n, next(seeds))
        float(a[0, 0])  # materialize input before timing
        t0 = time.perf_counter()
        float(chain(a, path, dtype, blocks))
        best = min(best, time.perf_counter() - t0)
    tflops = EXP_TIMES * 2 * n**3 / best / 1e12
    return best, tflops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--sizes", type=int, nargs="*", default=[14336, 18432])
    args = ap.parse_args()
    assert jax.default_backend() == "tpu", "bench needs the TPU"

    if args.check:
        n = 2048
        a = make_a(n, 0)
        want = np.asarray(chain(a, "xla", "f32", (512, 512, 512)))
        for path in ("pallas", "fused"):
            got = np.asarray(chain(a, path, "f32", (512, 512, 512)))
            err = abs(got - want) / abs(want)
            print(f"{path} f32 rel err vs xla: {err:.2e}")
            assert err < 1e-5, (path, got, want)
        print("check OK")
        return

    if args.sweep:
        n = args.sizes[0]
        for blocks in [(1024, 512, 512), (512, 512, 512), (2048, 512, 512),
                       (1024, 1024, 512), (512, 1024, 512), (1024, 512, 1024),
                       (2048, 1024, 512), (1024, 1024, 1024),
                       (512, 2048, 512), (2048, 2048, 512)]:
            try:
                dt, tf = timed(n, "pallas", "bf16", blocks, reps=1)
                print(f"blocks={blocks}: {dt*1000/EXP_TIMES:.1f} ms/sq "
                      f"{tf:.0f} TFLOPS", flush=True)
            except Exception as e:  # OOM/VMEM limits at big blocks
                print(f"blocks={blocks}: FAIL {type(e).__name__}", flush=True)
        return

    blocks = (1024, 1024, 1024)
    print(f"{'n':>6} {'dtype':>5} {'path':>7} {'s/chain':>8} {'TFLOPS':>7}")
    for n in args.sizes:
        for dtype in ("bf16", "f32"):
            for path in ("xla", "pallas", "fused"):
                dt, tf = timed(n, path, dtype, blocks)
                print(f"{n:>6} {dtype:>5} {path:>7} {dt:8.3f} {tf:7.0f}",
                      flush=True)


if __name__ == "__main__":
    main()
