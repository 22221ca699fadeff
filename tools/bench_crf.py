"""Device CRF benchmark + A/B vs the native lattice (VERDICT r2 #2).

Times the landmark-CRF pair program (irn_tpu/ops/crf_tpu.py) on the real
chip at the production bucket (375x500 -> 384x512), sweeping the landmark
stride, and reports label agreement vs the native permutohedral CRF on the
same inputs. The native single-thread cost on this class of image is
0.37-3.2 s/img-pair (BASELINE.md round-2 table).

Methodology: distinct pre-uploaded inputs per call, outputs reduced to a
device scalar and fetched once per pass (the axon tunnel defers execution
until a value fetch and value-caches identical inputs).

Usage: python tools/bench_crf.py [--n 8] [--strides 4 6 8]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def synth_image(rng, h, w):
    """Color-region scene + noise (real photos sit between flat and noise
    for both the lattice and the landmark kernel)."""
    img = np.full((h, w, 3), 60.0)
    img[:, : w // 2] = (190, 70, 60)
    img[h // 3:, w // 2:] = (70, 170, 90)
    img[h // 6: h // 6 + 3, :] = (240, 230, 40)
    return np.clip(img + rng.normal(0, 10, (h, w, 3)), 0, 255).astype(
        np.uint8
    )


def seed_labels(rng, h, w, n_labels):
    la = np.zeros((h, w), np.int32)
    la[:, : w // 2 - 4] = 1
    la[h // 3 + 4:, w // 2:] = n_labels - 1
    la[rng.random((h, w)) < 0.05] = 2
    lb = (la > 0).astype(np.int32)
    return la, lb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8, help="distinct image pairs")
    ap.add_argument("--strides", type=int, nargs="+", default=[4, 6, 8])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--size", type=int, nargs=2, default=[375, 500])
    ap.add_argument("--stream", action="store_true",
                    help="stream_kernel=True: recompute bilateral kernel "
                         "chunks per iteration instead of re-reading the "
                         "materialized [N, S] matrix from HBM")
    ap.add_argument("--kstore", default="dense", choices=["dense", "int8"],
                    help="landmark kernel storage: int8 halves the "
                         "HBM-bound iteration matmul's bytes (the kernel "
                         "matrix quantizes to scale-127 int8; activations "
                         "per-column-quantize on the fly)")
    args = ap.parse_args()

    from irn_tpu.ops import crf, crf_tpu, native

    h, w = args.size
    rng = np.random.default_rng(0)
    # chunk 0 warms/compiles and feeds the agreement check; each timed rep
    # r uses its own chunk r+1 — the tunnel value-caches identical
    # executions, so a rep must never replay another pass's inputs
    n_total = args.n * (args.reps + 1)
    imgs = [synth_image(rng, h, w) for _ in range(n_total)]
    seeds = [seed_labels(rng, h, w, 6) for _ in range(n_total)]

    native_ok = native.load() is not None
    if native_ok:
        t0 = time.perf_counter()
        refs = [
            crf.crf_inference_label_pair(im, la, lb, t=10, n_labels=6)
            for im, (la, lb) in zip(imgs[: args.n], seeds[: args.n])
        ]
        t_native = (time.perf_counter() - t0) / args.n
        print(f"native lattice pair: {t_native*1000:7.1f} ms/img", flush=True)

    for stride in args.strides:
        dev = crf_tpu.LandmarkCRF(stride=stride, stream_kernel=args.stream,
                                  kernel_store=args.kstore)

        def pass_once(chunk):
            outs = []
            lo = chunk * args.n
            for im, (la, lb) in zip(imgs[lo:lo + args.n],
                                    seeds[lo:lo + args.n]):
                outs.append(dev.pair(im, la, lb, n_labels=6))
            return outs

        outs = pass_once(0)  # compile + warm; host round-trips included
        best = float("inf")
        for r in range(args.reps):
            t0 = time.perf_counter()
            pass_once(r + 1)
            best = min(best, (time.perf_counter() - t0) / args.n)

        # device-side steady state: pre-uploaded inputs, all programs
        # enqueued, outputs reduced on device, one tail fetch — what a
        # pipelined stage (I/O threads overlapping device steps) sees
        ph, pw = dev._bucket(h, w)
        dev_in = []
        for im, (la, lb) in zip(imgs, seeds):  # all chunks
            imgp = np.zeros((ph, pw, 3), np.uint8)
            imgp[:h, :w] = im
            lap = np.zeros((ph, pw), np.int32)
            lbp = np.zeros((ph, pw), np.int32)
            lap[:h, :w] = la
            lbp[:h, :w] = lb
            dev_in.append(tuple(jnp.asarray(x) for x in (imgp, lap, lbp)))

        def pass_dev(chunk):
            sums = []
            lo = chunk * args.n
            for im, la_, lb_ in dev_in[lo:lo + args.n]:
                out = crf_tpu.crf_pair_program(
                    im, la_, lb_, jnp.int32(h), jnp.int32(w), jnp.int32(6),
                    jnp.float32(0.7), hw=(ph, pw), stride=stride,
                    stream_kernel=args.stream, kernel_store=args.kstore,
                )
                sums.append(jnp.sum(out.astype(jnp.int32)))
            return float(sums[-1] + 0 * sums[0])

        pass_dev(0)
        best_dev = float("inf")
        for r in range(args.reps):
            t0 = time.perf_counter()
            pass_dev(r + 1)
            best_dev = min(best_dev, (time.perf_counter() - t0) / args.n)

        line = (
            f"landmark stride {stride}: {best*1000:7.1f} ms/img serial "
            f"| {best_dev*1000:7.1f} ms/img device ({1/best_dev:6.1f} img/s)"
        )
        if native_ok:
            agree = np.mean(
                [
                    ((ga == ra).mean() + (gb == rb).mean()) / 2
                    for (ga, gb), (ra, rb) in zip(outs, refs)
                ]
            )
            line += f"  agreement vs native {100*agree:6.2f}%"
            line += f"  speedup {t_native/best_dev:5.1f}x"
        print(line, flush=True)


if __name__ == "__main__":
    main()
