"""End-to-end stage throughput on the current accelerator.

Times the actual pipeline stages (make_cam, make_sem_seg_labels,
make_ins_seg_labels — the reference's per-GPU-spawn inference stages,
step/make_cam.py / make_sem_seg_labels.py / make_ins_seg_labels.py) over
a synthetic VOC tree at production image sizes with randomly initialized
weights: wall-clock including host IO, disk artifacts, and device
dispatch, not just device compute. bf16 backbone + bf16 random walk
(the TPU production flags).

Usage: python tools/bench_stages.py [--n 32] [--size 500]
"""

from __future__ import annotations

import argparse
import os
import shutil
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

from irn_tpu.data import synthetic, voc12
from irn_tpu.models.cam import CAMNet
from irn_tpu.models.irn import IRNet
from irn_tpu.pipeline import stages_cam, stages_irn
from irn_tpu.pipeline.config import Config
from irn_tpu.utils import checkpoint as ckpt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--size", type=int, default=500)
    ap.add_argument("--jitter", type=int, default=0,
                    help="side jitter; 0 = one shape bucket (VOC is "
                    "dominated by a handful of sizes; per-size programs "
                    "compile once each)")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="irn_bench_stages_")
    root = os.path.join(tmp, "voc")
    train, _ = synthetic.generate(
        root, n_images=args.n, size=args.size, max_side_jitter=args.jitter, seed=0
    )

    cam_w = os.path.join(tmp, "cam.ckpt")
    irn_w = os.path.join(tmp, "irn.ckpt")
    cam_model = CAMNet()
    ckpt.save_checkpoint(
        cam_w,
        jax.tree.map(
            np.asarray,
            cam_model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 64, 64, 3), np.float32), train=True),
        ),
    )
    irn_model = IRNet()
    ckpt.save_checkpoint(
        irn_w,
        jax.tree.map(
            np.asarray,
            irn_model.init(jax.random.PRNGKey(1),
                           np.zeros((1, 64, 64, 3), np.float32)),
        ),
    )

    cfg = Config(
        voc12_root=root, train_list=train, infer_list=train,
        cam_weights_name=cam_w, irn_weights_name=irn_w,
        cam_out_dir=os.path.join(tmp, "cam"),
        sem_seg_out_dir=os.path.join(tmp, "sem"),
        ins_seg_out_dir=os.path.join(tmp, "ins"),
        model_dtype="bfloat16", rw_matmul_dtype="bfloat16",
    ).resolve()

    import dataclasses

    cfg2 = dataclasses.replace(cfg, overwrite=True)
    stages = [
        ("make_cam", stages_cam.make_cam),
        ("make_sem_seg", stages_irn.make_sem_seg_labels),
        ("make_ins_seg", stages_irn.make_ins_seg_labels),
    ]
    names = voc12.load_img_name_list(train)
    print(f"{len(names)} images, size ~{args.size} (device: "
          f"{jax.default_backend()})")
    for name, fn in stages:
        t0 = time.perf_counter()
        fn(cfg)
        cold = time.perf_counter() - t0
        # second pass re-runs the full stage (fresh runners; XLA's
        # in-process executable cache absorbs the compiles) = steady state
        t0 = time.perf_counter()
        fn(cfg2)
        warm = time.perf_counter() - t0
        print(f"{name:14s}: cold {cold:6.1f} s ({len(names)/cold:5.2f} "
              f"img/s), warm {warm:6.1f} s ({len(names)/warm:6.2f} img/s "
              f"wall incl. IO)", flush=True)

    if args.keep:
        print("artifacts kept at", tmp)
    else:
        shutil.rmtree(tmp)


if __name__ == "__main__":
    main()
