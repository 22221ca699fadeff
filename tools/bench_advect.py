"""Centroid-advection A/B: 4-corner gather vs two-tap matmul (VERDICT r3).

find_centroids_bounded runs 300 bilinear-advection iterations per image in
make_ins_seg (reference hot loop: make_ins_seg_labels.py:18-56). The
round-1..3 form issued 8 flat gathers per iteration; gathers serialize on
TPU. The matmul form (ops/centroids._find_centroids_matmul) row-interpolates
with a [N, H] two-tap weight matmul on the MXU and column-reduces on the
VPU — no gathers. This times both at the production cap on the real chip.

Methodology per CLAUDE.md: pre-uploaded device inputs, distinct inputs per
timed run (the axon tunnel value-caches identical executions), scalar
fetch to force execution, best of 2 passes.

Usage: python tools/bench_advect.py [--iters 300]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from irn_tpu.ops import centroids


def bench(fn, dps, h4, w4, iters, n_passes=2):
    h4 = jnp.int32(h4)
    w4 = jnp.int32(w4)
    # dedicated warmup input; timed passes never re-execute it
    float(fn(dps[-1], h4, w4, iters).sum())
    n = (len(dps) - 1) // n_passes
    best = float("inf")
    for p in range(n_passes):
        t0 = time.time()
        for i in range(p * n, (p + 1) * n):
            out = fn(dps[i], h4, w4, iters)
        float(out.sum())
        best = min(best, (time.time() - t0) / n)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--n", type=int, default=8, help="fields per pass")
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}")

    rng = np.random.default_rng(0)
    for cap_h, cap_w, h4, w4 in ((128, 128, 94, 125), (128, 128, 128, 128)):
        dps = [
            jnp.asarray(
                (rng.standard_normal((2, cap_h, cap_w)) * 1.5).astype(
                    np.float32
                )
            )
            for _ in range(2 * args.n + 1)
        ]
        float(dps[-1].sum())  # drain uploads before timing
        tg = bench(
            centroids._find_centroids_gather, dps, h4, w4, args.iters
        )
        tm = bench(
            centroids._find_centroids_matmul, dps, h4, w4, args.iters
        )
        print(
            f"cap ({cap_h},{cap_w}) extent ({h4},{w4}) iters {args.iters}: "
            f"gather {tg*1e3:.2f} ms  matmul {tm*1e3:.2f} ms  "
            f"speedup {tg/tm:.2f}x"
        )


if __name__ == "__main__":
    main()
