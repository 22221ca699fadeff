"""make_cam throughput microbench: per-image vs batched scale passes.

Measures the device compute of the multi-scale CAM inference stage
(irn_tpu.pipeline.stages_cam.make_cam) at VOC production scale: 500x375
images, scales (1.0, 0.5, 1.5, 2.0) x 2 flips, ResNet-50 forward per scale.
Compares cam_infer_batch=1 (one (orig, flip) pair per program — the round-1
path and the reference's per-image loop, step/make_cam.py:26-56) against a
batched stack (VERDICT r1 item 6).

Axon-tunnel rules (CLAUDE.md): inputs are pre-uploaded device arrays, every
image is distinct (the tunnel value-caches identical executions), and a
scalar fetch per chunk forces execution.

Usage: python tools/bench_make_cam.py [--batch 8] [--images 16] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from irn_tpu.data import transforms as T
from irn_tpu.models.cam import CAMNet
from irn_tpu.pipeline.common import round_up
from irn_tpu.pipeline.stages_cam import build_cam_scale_pass

SIZE = (375, 500)  # VOC-typical landscape
SCALES = (1.0, 0.5, 1.5, 2.0)
PAD_MULTIPLE = 64
S4_CAP, SU_CAP = 128, 512


def prepare_chunks(rng, n_images: int, k: int):
    """Distinct random images, pre-padded per scale, grouped in chunks of k.

    Returns a list of chunks; each chunk is a list over scales of
    (padded uint8 [k, ph, pw, 3], scalars...)."""
    h0, w0 = SIZE
    s4h, s4w = T.get_strided_size(SIZE, 4)
    suh, suw = T.get_strided_up_size(SIZE, 16)
    chunks = []
    for _ in range(n_images // k):
        imgs = rng.integers(0, 256, (k, h0, w0, 3)).astype(np.uint8)
        per_scale = []
        for scale in SCALES:
            if scale == 1:
                s_imgs = imgs
            else:
                s_imgs = np.stack([T.pil_rescale(im, scale, 3) for im in imgs])
            sh, sw = s_imgs.shape[1:3]
            ph, pw = round_up(sh, PAD_MULTIPLE), round_up(sw, PAD_MULTIPLE)
            padded = np.pad(s_imgs, ((0, 0), (0, ph - sh), (0, pw - sw), (0, 0)))
            per_scale.append(
                (padded, sh, sw, -(-sh // 16), -(-sw // 16),
                 s4h, s4w, suh, suw, h0, w0)
            )
        chunks.append(per_scale)
    return chunks


def run_variant(scale_pass, chunks, k: int) -> float:
    """Process every chunk; returns elapsed seconds (post-warmup inputs are
    already device-resident; one scalar fetch per chunk forces execution)."""
    t0 = time.perf_counter()
    for per_scale in chunks:
        s_acc = jnp.zeros((k, 20, S4_CAP, S4_CAP), jnp.float32)
        h_acc = jnp.zeros((k, 20, SU_CAP, SU_CAP), jnp.float32)
        for padded, *scalars in per_scale:
            ph, pw = padded.shape[1:3]
            s_acc, h_acc = scale_pass(ph, pw, k)(
                padded, *[jnp.int32(s) for s in scalars], s_acc, h_acc
            )
        float(s_acc.sum())  # force execution through the tunnel
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--images", type=int, default=16)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    model = CAMNet(dtype=jnp.dtype(args.dtype))
    variables = jax.tree.map(
        np.asarray,
        model.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32)),
    )
    scale_pass = build_cam_scale_pass(model, variables, S4_CAP, SU_CAP)

    print(f"backend={jax.default_backend()} dtype={args.dtype}", flush=True)
    results = {}
    for k in (1, args.batch):
        n = (args.images // k) * k
        chunks = prepare_chunks(rng, n, k)
        # upload everything first (uploads are tunnel-slow and not the
        # object of measurement), then warm up compilation on chunk 0
        chunks = [
            [(jax.device_put(p), *s) for p, *s in per_scale]
            for per_scale in chunks
        ]
        run_variant(scale_pass, chunks[:1], k)
        # distinct images per timed run (the tunnel value-caches repeats)
        dt = run_variant(scale_pass, chunks[1:], k)
        n_timed = (len(chunks) - 1) * k
        results[k] = n_timed / dt
        print(f"k={k}: {n_timed} imgs in {dt:.2f}s -> {results[k]:.2f} img/s",
              flush=True)
    print(f"speedup x{results[args.batch] / results[1]:.2f}")


if __name__ == "__main__":
    main()
