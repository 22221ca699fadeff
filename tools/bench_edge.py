"""EdgeDisplacement inference batching benchmark (ROADMAP r2 #4).

make_sem_seg/make_ins_seg run one (orig, flip) IRNet forward per image in
the reference (step/make_sem_seg_labels.py:28-33, batch 1); every image
here shares the fixed padded crop buffer, so any size mix batches into a
[2B, 512, 512, 3] pass. This times the per-image program (pipelined, 8
distinct inputs, one final fetch) against the batched program at several
B on the real chip.

Usage: python tools/bench_edge.py [--f32]
"""

from __future__ import annotations

import argparse
import time

import jax
import numpy as np

from irn_tpu.models.irn import IRNet
from irn_tpu.pipeline.config import Config
from irn_tpu.pipeline.stages_irn import EdgeDisplacementRunner


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--n", type=int, default=16, help="images per timing")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    assert jax.default_backend() == "tpu", "bench needs the TPU"

    dtype = "float32" if args.f32 else "bfloat16"
    model = IRNet()
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 512, 512, 3), np.float32)
    )
    variables = jax.tree.map(np.asarray, variables)
    rng = np.random.default_rng(0)
    size = (375, 500)  # VOC-typical landscape
    imgs = [
        rng.integers(0, 255, (*size, 3)).astype(np.uint8)
        for _ in range(args.n)
    ]

    def timed(batch: int) -> float:
        cfg = Config(voc12_root="x", model_dtype=dtype,
                     edge_infer_batch=batch)
        runner = EdgeDisplacementRunner(cfg, variables)

        def pass_once():
            outs = []
            for c0 in range(0, args.n, batch):
                blk = imgs[c0 : c0 + batch]
                outs.extend(runner.batch(blk, [size] * len(blk)))
            # one fetch drains the queue (axon defers until a value fetch)
            return float(np.asarray(outs[-1][0])[0, 0])

        pass_once()  # compile + warm
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            pass_once()
            best = min(best, (time.perf_counter() - t0) / args.n)
        return best

    base = None
    for batch in (1, 4, 8, 16):
        dt = timed(batch)
        base = base or dt
        print(
            f"edge_infer_batch={batch:2d}: {dt * 1000:6.1f} ms/img "
            f"({1 / dt:5.1f} img/s, {base / dt:.2f}x)",
            flush=True,
        )


if __name__ == "__main__":
    main()
