"""Chain-level A/B of the two CRF backends (VERDICT r3 item 3).

The per-stage numbers already exist: the TPU landmark CRF
(ops/crf_tpu.py) agrees with the native permutohedral lattice on
99.97-99.98% of refined labels and is 10-33x faster than a host core
(BASELINE.md round-3). What was missing is evidence that the residual
0.02-0.03% disagreement stays harmless AFTER ir_label feeds train_irn
and the random walk — the stated reason `crf_backend` defaulted to
'native'.

This tool runs the full downstream chain on a synthetic VOC tree
(reference loop bodies: step/cam_to_ir_label.py:26-40 ->
step/train_irn.py:49-107 -> step/make_sem_seg_labels.py:34-73):

    shared prefix          train_cam + make_cam (one CAM set for all arms)
    arm 'native'           cam_to_ir_label(native) -> train_irn -> make_sem_seg
    arm 'tpu'              cam_to_ir_label(tpu)    -> train_irn -> make_sem_seg
    arm 'native_seed1'     native ir labels, train_irn under a DIFFERENT
                           loader seed -> make_sem_seg   (noise floor)

and reports, per arm pair: final sem_seg label agreement and synthetic
mIoU. Decision rule: if |mIoU(native) - mIoU(tpu)| and the native-vs-tpu
sem_seg disagreement are within the native-vs-native_seed1 noise band,
the backends are chain-equivalent and the device backend is safe as an
auto default whenever an accelerator is present.

The CAM prefix defaults to ``--cam oracle``: CAMs synthesized from the
synthetic gt (per-class Gaussian-blurred masks + correlated noise, peak
1.0 like make_cam's max-normalized output). A scratch-initialized
ResNet-50 on 12 images cannot localize (measured: thresholded-CAM IoU
0.05-0.44, ir fg accuracy ~0), which would leave every arm comparing
noise against noise; the CRF-backend question starts at cam_to_ir_label,
so a controlled high-signal CAM input makes backend-induced differences
measurable. ``--cam trained`` keeps the real train_cam+make_cam prefix.

Runs on CPU by default (deterministic, relay-free); --platform tpu to
repeat on hardware.  ~15 min on the 1-core dev box.

Usage:
    python tools/ab_crf_chain.py [--out /tmp/ab_crf] [--n 16] [--json F]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_oracle_cams(root: str, names, cam_out_dir: str,
                      sigma: float = 5.0, noise: float = 0.18,
                      seed: int = 7) -> None:
    """Synthesize make_cam-format npy dicts from the synthetic gt.

    Per present class: gt mask -> separable Gaussian blur (soft edges,
    like an upsampled stride-16 CAM) -> + correlated noise -> clip and
    max-normalize to peak 1.0 (make_cam normalizes the fused CAM the
    same way, stages_cam.py). ``cam`` (stride-4 grid, (s-1)//4+1 per
    side) is the [::4, ::4] sampling of ``high_res``."""
    import imageio.v2 as imageio
    import numpy as np

    def blur(x: np.ndarray, s: float) -> np.ndarray:
        r = int(3 * s)
        k = np.exp(-0.5 * (np.arange(-r, r + 1) / s) ** 2)
        k /= k.sum()
        pad = np.pad(x, ((r, r), (0, 0)), mode="edge")
        x = np.einsum("k,kij->ij", k, np.stack(
            [pad[i:i + x.shape[0]] for i in range(2 * r + 1)]))
        pad = np.pad(x, ((0, 0), (r, r)), mode="edge")
        return np.einsum("k,ikj->ij", k, np.stack(
            [pad[:, i:i + x.shape[1]] for i in range(2 * r + 1)], axis=1))

    rng = np.random.default_rng(seed)
    os.makedirs(cam_out_dir, exist_ok=True)
    for name in names:
        gt = np.asarray(imageio.imread(
            os.path.join(root, "SegmentationClass", name + ".png")))
        classes = sorted(int(c) for c in np.unique(gt) if 0 < c < 255)
        maps = []
        for c in classes:
            m = blur((gt == c).astype(np.float32), sigma)
            m = m + blur(rng.normal(0.0, noise, gt.shape).astype(np.float32),
                         sigma) * 3.0
            m = np.clip(m, 0.0, None)
            maps.append(m / max(m.max(), 1e-5))
        high_res = np.stack(maps) if maps else np.zeros(
            (0,) + gt.shape, np.float32)
        np.save(
            os.path.join(cam_out_dir, name + ".npy"),
            {"keys": np.asarray([c - 1 for c in classes], np.int64),
             "cam": high_res[:, ::4, ::4].copy(),
             "high_res": high_res.astype(np.float32)},
        )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="/tmp/ab_crf_chain")
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--size", type=int, default=112)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--cam", default="oracle", choices=["oracle", "trained"])
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    if args.platform == "cpu":
        # must precede backend init; env vars alone lose to the axon plugin
        import jax

        jax.config.update("jax_platforms", "cpu")

    import imageio.v2 as imageio
    import numpy as np

    from irn_tpu.data import loader as loader_mod
    from irn_tpu.data import synthetic, voc12
    from irn_tpu.eval import semseg
    from irn_tpu.pipeline import stages_cam, stages_irn
    from irn_tpu.pipeline.config import Config

    root = os.path.join(args.out, "voc")
    workdir = os.path.join(args.out, "work")
    os.makedirs(workdir, exist_ok=True)
    train_list, _val_list = synthetic.generate(
        root, n_images=args.n, size=args.size, max_side_jitter=24, seed=4
    )
    os.chdir(workdir)

    base = Config(
        voc12_root=root,
        train_list=train_list, val_list=_val_list, infer_list=train_list,
        cls_labels_path=os.path.join(root, "cls_labels.npy"),
        cam_crop_size=96, cam_batch_size=4, cam_num_epoches=8,
        cam_learning_rate=0.01, cam_scales=(1.0,),
        irn_crop_size=96, irn_batch_size=4, irn_num_epoches=4,
        path_radius=4, exp_times=4, rw_grid_cap=48, ins_seed_cap=8,
        pad_multiple=32, crf_iters=10, num_workers=2,
    ).resolve()

    names = voc12.load_img_name_list(train_list)

    # ---- shared prefix: one CAM set feeds every arm -------------------
    if args.cam == "trained":
        if not os.path.exists(base.cam_weights_name):
            stages_cam.train_cam(base)
        stages_cam.make_cam(base)
    else:
        write_oracle_cams(root, names, base.cam_out_dir)

    def arm_cfg(tag: str, backend: str, ir_dir: str, **kw) -> Config:
        return dataclasses.replace(
            base,
            crf_backend=backend,
            ir_label_out_dir=ir_dir,
            irn_weights_name=f"sess/res50_irn_{tag}.ckpt",
            sem_seg_out_dir=f"result/sem_seg_{tag}",
            **kw,
        )

    def run_chain(cfg: Config, make_ir: bool) -> None:
        if make_ir:
            stages_cam.cam_to_ir_label(cfg)
        stages_irn.train_irn(cfg)
        stages_irn.make_sem_seg_labels(cfg)

    arms = {}
    arms["native"] = arm_cfg("native", "native", "result/ir_label_native")
    arms["tpu"] = arm_cfg("tpu", "tpu", "result/ir_label_tpu")
    # stride-8 landmark subgrid: per-image agreement matches stride 4
    # (99.98% both, BASELINE.md round-3) at 3x the speed (44 vs 130
    # ms/img) — this arm decides whether 8 is chain-safe as the device
    # default
    arms["tpu_s8"] = arm_cfg(
        "tpu_s8", "tpu", "result/ir_label_tpu_s8", crf_landmark_stride=8
    )
    # int8 landmark-kernel storage: per-image agreement matches the
    # dense store (99.98% both vs native, BASELINE.md round-5) at 1.3x
    # the speed (102 vs 131.5 ms/img — the iteration matmul is
    # HBM-bound on the kernel bytes) — this arm decides whether int8 is
    # chain-safe as the device default
    arms["tpu_i8"] = arm_cfg(
        "tpu_i8", "tpu", "result/ir_label_tpu_i8", crf_kernel_store="int8"
    )
    # noise floor: SAME native ir labels, different train stochasticity
    # (BatchLoader seed drives both the shuffle order and the per-sample
    # augmentation streams, data/loader.py:100-121)
    arms["native_seed1"] = arm_cfg(
        "native_seed1", "native", "result/ir_label_native"
    )

    run_chain(arms["native"], make_ir=True)
    run_chain(arms["tpu"], make_ir=True)
    run_chain(arms["tpu_s8"], make_ir=True)
    run_chain(arms["tpu_i8"], make_ir=True)

    orig_loader = loader_mod.BatchLoader

    class SeededLoader(orig_loader):
        def __init__(self, *a, **kw):
            kw["seed"] = 1
            super().__init__(*a, **kw)

    loader_mod.BatchLoader = SeededLoader
    try:
        run_chain(arms["native_seed1"], make_ir=False)
    finally:
        loader_mod.BatchLoader = orig_loader

    # ---- metrics -------------------------------------------------------
    def read_maps(d: str) -> list:
        return [
            np.asarray(imageio.imread(os.path.join(d, n + ".png")))
            for n in names
        ]

    gts = [
        np.asarray(imageio.imread(
            os.path.join(root, "SegmentationClass", n + ".png")))
        for n in names
    ]

    def agreement(a: list, b: list) -> float:
        same = sum(int((x == y).sum()) for x, y in zip(a, b))
        tot = sum(x.size for x in a)
        return same / tot

    def miou(preds: list) -> float:
        return semseg.scores_from_confusion(
            semseg.confusion_matrix(preds, gts))["miou"]

    device_arms = ("tpu", "tpu_s8", "tpu_i8")
    ir = {t: read_maps(arms[t].ir_label_out_dir)
          for t in ("native",) + device_arms}
    sem = {t: read_maps(arms[t].sem_seg_out_dir) for t in arms}

    out = {
        "n_images": len(names),
        "platform": args.platform,
        "sem_seg_agreement_noise_floor": agreement(
            sem["native"], sem["native_seed1"]),
        "miou": {t: miou(sem[t]) for t in arms},
    }
    out["miou_delta_noise_floor"] = abs(
        out["miou"]["native"] - out["miou"]["native_seed1"])
    noise_dis = 1 - out["sem_seg_agreement_noise_floor"]
    for t in device_arms:
        out[f"ir_label_agreement_native_vs_{t}"] = agreement(
            ir["native"], ir[t])
        out[f"sem_seg_agreement_native_vs_{t}"] = agreement(
            sem["native"], sem[t])
        out[f"miou_delta_native_vs_{t}"] = abs(
            out["miou"]["native"] - out["miou"][t])
        out[f"chain_equivalent_{t}"] = bool(
            out[f"miou_delta_native_vs_{t}"]
            <= out["miou_delta_noise_floor"] * 1.5 + 1e-3
            and (1 - out[f"sem_seg_agreement_native_vs_{t}"])
            <= noise_dis * 1.5 + 1e-4
        )

    print(json.dumps(out, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
