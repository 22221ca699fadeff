"""Typed pipeline configuration.

Mirrors the reference's flat argparse namespace (run_sample.py:8-74) with
real types and per-stage booleans. Divergences from the reference
(documented bugs not replicated): step flags are genuine booleans — passing
``--train_cam_pass true`` enables the stage instead of silently disabling it
(the reference's untyped flags + ``is True`` checks, run_sample.py:64-72,
85); numeric flags are typed so ``--beta 10`` doesn't arrive as a string.

TPU-specific additions: ``rw_matmul_dtype`` (random-walk MXU operand
precision), ``rw_grid_cap`` (fixed stride-4 grid for one-compilation
propagation), ``model_dtype``, ``pretrained_backbone`` (path to a torch
resnet50 checkpoint or a converted ``.npz``), ``pad_multiple`` (inference
shape bucketing), and ``compile_cache_dir``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass
class Config:
    # environment
    voc12_root: str = ""
    num_workers: int = 4

    # dataset
    train_list: str = "voc12/train_aug.txt"
    val_list: str = "voc12/val.txt"
    infer_list: str = "voc12/train.txt"
    cls_labels_path: str = ""  # default: <voc12_root>/cls_labels.npy
    eval_set: str = "train"

    # CAM
    cam_crop_size: int = 512
    cam_batch_size: int = 16
    cam_num_epoches: int = 5
    cam_learning_rate: float = 0.1
    cam_weight_decay: float = 1e-4
    cam_eval_thres: float = 0.15
    cam_scales: Tuple[float, ...] = (1.0, 0.5, 1.5, 2.0)

    # IR seeds
    conf_fg_thres: float = 0.30
    conf_bg_thres: float = 0.05
    crf_iters: int = 10
    crf_gt_prob: float = 0.7
    crf_backend: str = "auto"             # 'auto': 'tpu' when an
                                          # accelerator is present, else
                                          # 'native' — the chain A/B
                                          # (tools/ab_crf_chain.py,
                                          # BASELINE.md round-4) showed the
                                          # backends are equivalent through
                                          # train_irn + the walk, and the
                                          # device path is 10-33x a host
                                          # core. 'native': host
                                          # permutohedral lattice (threaded,
                                          # pydensecrf parity); 'tpu':
                                          # landmark-kernel mean field on
                                          # device (exact separable Gaussian
                                          # + stride-4 landmark bilateral as
                                          # one MXU matmul/iter; 99.97-99.98%
                                          # label agreement, ops/crf_tpu.py)
    crf_landmark_stride: int = 4          # tpu backend: landmark subgrid
                                          # stride (spatial sigma is 50 px,
                                          # so 4 is already conservative)
    crf_kernel_store: str = "int8"        # tpu backend: landmark kernel
                                          # storage. 'int8' (default)
                                          # quantizes the [N, S] matrix
                                          # (the HBM-bound object each
                                          # mean-field iteration re-reads)
                                          # to symmetric int8: 130.5 ->
                                          # 101.8 ms/img at stride 4,
                                          # agreement vs native 99.98%
                                          # EQUAL to the dense store's,
                                          # and the chain A/B
                                          # (tools/ab_crf_chain.py round-5
                                          # tpu_i8 arm) puts it inside
                                          # the train-seed noise band
                                          # end-of-chain, matching the
                                          # dense arm to 4 decimals
                                          # (BASELINE.md round-5b).
                                          # 'dense' keeps the bf16 matrix

    # IRNet
    irn_crop_size: int = 512
    irn_batch_size: int = 32
    irn_num_epoches: int = 3
    irn_learning_rate: float = 0.1
    irn_weight_decay: float = 1e-4
    path_radius: int = 10

    # random walk
    beta: int = 10
    exp_times: int = 8
    sem_seg_bg_thres: float = 0.25
    ins_seg_bg_thres: float = 0.25
    rw_radius: int = 5

    # output paths
    log_name: str = "sample_train_eval"
    session_dir: str = "sess"
    cam_weights_name: str = "sess/res50_cam.ckpt"
    irn_weights_name: str = "sess/res50_irn.ckpt"
    cam_out_dir: str = "result/cam"
    ir_label_out_dir: str = "result/ir_label"
    sem_seg_out_dir: str = "result/sem_seg"
    ins_seg_out_dir: str = "result/ins_seg"
    coco_ann_path: str = "result/voc2012_train_custom.json"
    coco_seg_format: str = "polygon"      # 'polygon' (reference parity,
                                          # make_cocoann.py:38-46) | 'rle'

    # TPU-native knobs
    pretrained_backbone: str = ""
    cam_stop_grad: str = "c3"             # "" trains the full backbone
    calibrate_bn: bool = True             # calibrate BN stats when training
                                          # without pretrained weights
    model_dtype: str = "float32"          # backbone compute dtype
    rw_matmul_dtype: str = "float32"      # 'float32' | 'bfloat16'
    rw_banded: bool = True                # exploit the transition matrix's
                                          # band structure with Pallas
                                          # kernels (TPU, single-device;
                                          # 2.4x over dense at VOC sizes)
    rw_square_times: int = -1             # squarings before switching to
                                          # thin seed applications:
                                          # x@T^(2^E) via 2^(E-e) HBM-bound
                                          # applications of T^(2^e). -1 =
                                          # cost-model auto (2.2x on v5e);
                                          # exp_times = pure squaring (the
                                          # reference's evaluation order)
    rw_grid_cap: int = 128                # stride-4 cells (=512px images)
    ins_seed_cap: int = 128               # (instance x class) seed rows per
                                          # random-walk chunk — NOT a cap:
                                          # images with more seeds stream
                                          # extra chunks through the same
                                          # program (T is seed-independent)
    sem_monolith: bool = False            # make_sem_seg per-image blocks:
                                          # fuse forward + walk + decode +
                                          # u8 pack into ONE program fed
                                          # by one packed blob (2
                                          # transport calls/img vs 5).
                                          # Wins on relay-attached hosts
                                          # (~10-30 ms per call there);
                                          # co-located hosts LOSE ~5 ms
                                          # device time per image to the
                                          # joint conv+stencil schedule
                                          # (probe: 10.7 -> 16.0 ms/img
                                          # v5e), so the split flow is
                                          # the default. Bit-identical
                                          # labels either way (parity
                                          # test).
    ins_device_ccl: bool = True           # make_ins_seg: cluster basins ON
                                          # device (ops/ccl_tpu min-label
                                          # propagation) instead of fetching
                                          # the advection pack for host
                                          # union-find — removes one fetch +
                                          # one upload round trip per image.
                                          # Single-device only (mesh mode
                                          # keeps the host path); images
                                          # whose distinct-cluster count
                                          # overflows ins_cluster_cap fall
                                          # back to the exact host path.
    ins_cluster_cap: int = 8              # static device mask rows for the
                                          # CCL path: walk rows are
                                          # classes x THIS, so keep it at
                                          # the instance count VOC images
                                          # actually carry (1-7 + escape
                                          # bucket); overflow is detected
                                          # in-band and handled exactly
    ins_comp_cap: int = 128               # monolith split flow: static
                                          # capacity of the DEVICE
                                          # component split of the walked
                                          # label map (instances plus
                                          # argmax speckle fragments —
                                          # the reference keeps every
                                          # fragment as a detection,
                                          # make_ins_seg_labels.py:95-101);
                                          # overflow detected in-band,
                                          # image redone via the host
                                          # split. 0 disables the device
                                          # split (labels fetch + host
                                          # components, the round-5a flow)
    pad_multiple: int = 64                # inference shape bucketing
    cam_infer_batch: int = 32             # make_cam: stack this many
                                          # same-size images per scale pass
                                          # (feeds the MXU; 1 = per-image;
                                          # v5e r3 sweep after the
                                          # matmul-resize fix: 96.7 img/s
                                          # at k=16, 110 at k=32 — round-2's
                                          # flat knee at 16 was the gather
                                          # resize's fixed cost)
    edge_infer_batch: int = 1             # make_sem_seg/make_ins_seg:
                                          # images per EdgeDisplacement
                                          # forward (any size mix batches —
                                          # all share the padded buffer).
                                          # Default 1: unlike make_cam's 8
                                          # small passes, this is already
                                          # ONE well-fed [2,512,512] pass;
                                          # v5e sweep 17.9/17.6/21.1 ms at
                                          # B=1/4/8 (tools/bench_edge.py)
    compile_cache_dir: str = ""
    overwrite: bool = False               # rerun stages over existing outputs
    mesh_data: int = 0                    # 0 = all devices
    infer_devices: int = 0                # round-robin the per-image make_*
                                          # programs over this many local
                                          # devices (0 = all; the reference
                                          # spawns one process per GPU,
                                          # step/make_cam.py:71-74)
    rw_mesh_model: int = 1                # row-shard the random-walk
                                          # transition matrix over this many
                                          # devices (1 = single-device);
                                          # lifts the HBM ceiling on grids
                                          # beyond rw_grid_cap. Mutually
                                          # exclusive with infer_devices
                                          # fan-out (one image uses the
                                          # whole mesh).
    profile_dir: str = ""                 # capture jax.profiler traces
    resume: bool = True                   # resume training from epoch ckpts

    # multi-host (DCN) process group — SURVEY 2.7 TPU-equivalents. On TPU
    # pods `--dist_initialize` alone auto-detects everything from the
    # runtime; elsewhere set the coordinator/count/id triple explicitly
    # (every process runs the same CLI). Training then data-parallels over
    # the GLOBAL device mesh: each process loads its contiguous rows of
    # every global batch (parallel/mesh.local_batch_slice) and XLA lowers
    # the gradient all-reduce onto ICI + DCN.
    dist_initialize: bool = False         # call jax.distributed.initialize
    dist_coordinator: str = ""            # "host:port" of process 0
    dist_num_processes: int = 0           # total processes (0 = auto)
    dist_process_id: int = -1             # this process (-1 = auto)

    # stage switches
    train_cam_pass: bool = False
    make_cam_pass: bool = False
    eval_cam_pass: bool = False
    cam_to_ir_label_pass: bool = False
    train_irn_pass: bool = False
    make_sem_seg_pass: bool = False
    eval_sem_seg_pass: bool = False
    make_ins_seg_pass: bool = False
    eval_ins_seg_pass: bool = False
    make_cocoann_pass: bool = False

    def resolve(self) -> "Config":
        import os

        def in_repo(rel: str) -> str:
            """Fall back to the repo checkout for the shipped voc12/ split
            lists (voc12/README.md) when ``rel`` doesn't exist relative to
            the working directory — a fresh checkout + --voc12_root runs
            with no hand-authored lists."""
            if rel and not os.path.exists(rel) and not os.path.isabs(rel):
                cand = os.path.join(
                    os.path.dirname(os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__)))), rel)
                if os.path.exists(cand):
                    return cand
            return rel

        self.train_list = in_repo(self.train_list)
        self.val_list = in_repo(self.val_list)
        self.infer_list = in_repo(self.infer_list)
        if not self.cls_labels_path:
            at_root = os.path.join(self.voc12_root, "cls_labels.npy")
            self.cls_labels_path = (
                at_root if os.path.exists(at_root)
                else in_repo(os.path.join("voc12", "cls_labels.npy"))
            )
        return self

    def resolved_crf_backend(self) -> str:
        """'auto' -> 'tpu' iff an accelerator backend is live.

        Resolved lazily (NOT in :meth:`resolve`): touching
        ``jax.default_backend()`` initializes the backend, which must not
        happen before ``run.maybe_init_distributed``."""
        if self.crf_backend != "auto":
            return self.crf_backend
        import jax

        return "tpu" if jax.default_backend() != "cpu" else "native"

    def rw_matmul_jnp_dtype(self):
        import jax.numpy as jnp

        return {"float32": None, "bfloat16": jnp.bfloat16}[self.rw_matmul_dtype]
