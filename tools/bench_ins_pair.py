"""make_ins_seg transport probe: single-image monolith vs paired program.

The monolith flow already folded the instance stage to 1 dispatch + 1
fetch per image (BASELINE.md round-5); this probe measures whether
tracing TWO same-bucket images through ONE program
(RandomWalkRunner.propagate_monolith_pair_packed — 1 dispatch + 1 fetch
per PAIR) buys anything on a relay-style transport, where per-call
overhead is ~10-30 ms and call COUNT dominates bytes (round-4
breakdown). Device time should be ~unchanged (the two bodies run back to
back); the question is purely transport amortization vs the 2-deep
thread pipeline the stage already runs.

Identical methodology to bench.py's bench_make_ins_seg (pre-staged
blobs, distinct inputs per pass, synthetic 4-attractor basins blended
inside the fused program, 2-deep ThreadPool pipeline, best of N passes).

Usage: python tools/bench_ins_pair.py [--n 8] [--passes 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8, help="images per pass")
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import _stage_device
    from irn_tpu.models.irn import IRNet
    from irn_tpu.pipeline.config import Config
    from irn_tpu.pipeline.stages_irn import (
        EdgeDisplacementRunner,
        RandomWalkRunner,
        _pow2_ge,
        _split_unpack_np,
        monolith_pack,
    )

    rng = np.random.default_rng(0)
    cfg = Config(model_dtype="bfloat16", rw_matmul_dtype="bfloat16")
    model = IRNet(dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, cfg.rw_grid_cap * 4, cfg.rw_grid_cap * 4, 3)),
    )
    runner = EdgeDisplacementRunner(cfg, variables)
    walker = RandomWalkRunner(cfg, n_seed_rows=cfg.ins_seed_cap)
    k_cap = cfg.ins_cluster_cap

    # 4-attractor field blended inside the fused program, exactly as
    # bench.bench_make_ins_seg (see its docstring for the honesty story)
    cap = cfg.rw_grid_cap
    yyg, xxg = np.mgrid[:cap, :cap].astype(np.float32)
    attractors = [(20.0, 20.0), (20.0, 90.0), (70.0, 40.0), (75.0, 100.0)]
    d2a = np.stack(
        [(yyg - py) ** 2 + (xxg - px) ** 2 for py, px in attractors]
    )
    near = np.argmin(d2a, axis=0)
    field = np.zeros((cap, cap, 2), np.float32)
    for j, (py, px) in enumerate(attractors):
        sel = near == j
        field[..., 0][sel] = 0.25 * (py - yyg[sel])
        field[..., 1][sel] = 0.25 * (px - xxg[sel])
    field_dev = jnp.asarray(field)

    class _BasinBlend:
        def apply(self, vs, pair, apply_mean_shift=True):
            e, d = model.apply(vs, pair, apply_mean_shift=apply_mean_shift)
            return e, d.astype(jnp.float32) * 0.01 + field_dev[None]

    runner.model = _BasinBlend()

    n_images, n_passes = args.n, args.passes
    n_total = n_images * n_passes + 2  # dedicated warmups (single + pair)
    imgs_np = [
        (rng.random((375, 500, 3)) * 255).astype(np.uint8)
        for _ in range(n_total)
    ]
    yy, xx = np.mgrid[:96, :128].astype(np.float32)

    def blob_cams(k=2):
        out = []
        for _ in range(k):
            cy, cx = rng.uniform(10, 84), rng.uniform(10, 115)
            s = rng.uniform(8, 25)
            out.append(
                np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
            )
        return np.stack(out).astype(np.float32)[:, :94, :125]

    def pack(i):
        cams = blob_cams()
        c_pad = _pow2_ge(cams.shape[0])
        camp = np.zeros((c_pad, 96, 128), np.float32)
        camp[: cams.shape[0], :94, :125] = cams
        return monolith_pack(runner, imgs_np[i], camp)

    packs = [pack(i) for i in range(n_total)]
    blobs = _stage_device(packs)
    # pair arm: the same bytes staged as [2, L] stacks (same total
    # upload; the transport fold is in dispatch/fetch, not staging)
    pair_blobs = _stage_device([
        np.stack([packs[i], packs[i + 1]])
        for i in range(0, n_total - 1, 2)
    ])

    size = (375, 500)

    def one_single(i):
        wpack = np.asarray(walker.propagate_monolith_packed(
            runner, blobs[i], 375, 500, size, 0.25
        ))
        out = _split_unpack_np(wpack, walker.comp_cap)
        assert 0 < out[5] <= k_cap, out[5]
        return out[3]

    def one_pair(j):
        wpack2 = np.asarray(walker.propagate_monolith_pair_packed(
            runner, pair_blobs[j], size, size, 0.25
        ))
        outs = [_split_unpack_np(w, walker.comp_cap) for w in wpack2]
        for out in outs:
            assert 0 < out[5] <= k_cap, out[5]
        return [o[3] for o in outs]

    # warmups on the dedicated tail inputs (never re-timed)
    one_single(n_total - 1)
    one_pair(len(pair_blobs) - 1)

    best_single = 0.0
    for p in range(n_passes):
        t0 = time.time()
        with ThreadPoolExecutor(2) as pool:  # the stage's pipeline depth
            list(pool.map(
                one_single, range(p * n_images, (p + 1) * n_images)
            ))
        best_single = max(best_single, n_images / (time.time() - t0))
    print(f"single monolith: {best_single:6.2f} img/s "
          f"({1000/best_single:5.1f} ms/img)", flush=True)

    best_pair = 0.0
    per_pass = n_images // 2
    for p in range(n_passes):
        t0 = time.time()
        with ThreadPoolExecutor(2) as pool:
            list(pool.map(
                one_pair, range(p * per_pass, (p + 1) * per_pass)
            ))
        best_pair = max(best_pair, n_images / (time.time() - t0))
    print(f"paired monolith: {best_pair:6.2f} img/s "
          f"({1000/best_pair:5.1f} ms/img)  "
          f"x{best_pair/best_single:4.2f} vs single", flush=True)


if __name__ == "__main__":
    main()
