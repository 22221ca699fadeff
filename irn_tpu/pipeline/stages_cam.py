"""CAM stages: train_cam, make_cam, eval_cam, cam_to_ir_label.

Stage contracts follow step/train_cam.py, step/make_cam.py,
step/eval_cam.py, step/cam_to_ir_label.py: same hyper-parameters, same
on-disk artifacts (per-image ``result/cam/<id>.npy`` dicts with
{keys, cam, high_res}; ``result/ir_label/<id>.png`` seed maps), so either
framework's downstream stages can consume them.

TPU redesign: multi-scale inference pads each scaled image to a
``pad_multiple`` bucket so a handful of XLA programs serve the whole
dataset (vs exact-shape per-image graphs); flip pairs ride the batch dim;
training is batch-sharded over the mesh.
"""

from __future__ import annotations

import functools
import os
from typing import Dict

import imageio.v2 as imageio
import jax
import jax.numpy as jnp
import numpy as np

from irn_tpu.data import loader as loader_mod
from irn_tpu.data import transforms as T
from irn_tpu.data import voc12
from irn_tpu.models.cam import CAMNet
from irn_tpu.ops import crf
from irn_tpu.parallel import mesh as mesh_mod
from irn_tpu.pipeline import common
from irn_tpu.pipeline.config import Config
from irn_tpu.train import cam_train, optim
from irn_tpu.train.state import create_train_state
from irn_tpu.utils import checkpoint as ckpt
from irn_tpu.utils.logging import AverageMeter, DeviceMeter, Timer


def _label_dict(cfg: Config) -> Dict[str, np.ndarray]:
    if os.path.exists(cfg.cls_labels_path):
        return voc12.load_label_dict(cfg.cls_labels_path)
    names = set(voc12.load_img_name_list(cfg.train_list))
    names |= set(voc12.load_img_name_list(cfg.val_list))
    names |= set(voc12.load_img_name_list(cfg.infer_list))
    print("building cls labels from VOC XML annotations ...")
    return voc12.make_label_dict(sorted(names), cfg.voc12_root)


def train_cam(cfg: Config) -> None:
    labels = _label_dict(cfg)
    train_ds = voc12.ClassificationDataset(
        cfg.train_list, cfg.voc12_root, labels,
        resize_long=(320, 640), hor_flip=True,
        crop_size=cfg.cam_crop_size, crop_method="random",
    )
    val_ds = voc12.ClassificationDataset(
        cfg.val_list, cfg.voc12_root, labels, crop_size=cfg.cam_crop_size
    )
    # mesh first: in multi-host mode (pipeline/run.maybe_init_distributed)
    # it spans the GLOBAL devices and each process's loader decodes only
    # its contiguous rows of every global batch
    mesh = mesh_mod.mesh_for_batch(cfg.cam_batch_size, cfg.mesh_data or None)
    local_rows = mesh_mod.local_batch_slice(mesh, cfg.cam_batch_size)
    is_main = jax.process_index() == 0
    train_dl = loader_mod.BatchLoader(
        train_ds, cfg.cam_batch_size, shuffle=True, drop_last=True,
        num_workers=cfg.num_workers,
        local_rows=local_rows if jax.process_count() > 1 else None,
    )
    # drop_last=False: the reference's validate loader keeps the tail batch
    # (step/train_cam.py:24-27); the eval step re-jits once for it
    val_dl = loader_mod.BatchLoader(
        val_ds, cfg.cam_batch_size, shuffle=False, drop_last=False,
        num_workers=cfg.num_workers,
    )
    max_step = (len(train_ds) // cfg.cam_batch_size) * cfg.cam_num_epoches

    model = CAMNet(dtype=jnp.dtype(cfg.model_dtype),
                   stop_grad_at=cfg.cam_stop_grad or None)
    example = np.zeros((1, cfg.cam_crop_size, cfg.cam_crop_size, 3), np.float32)
    variables = common.init_model_variables(model, cfg, example, train=True)

    if cfg.calibrate_bn and not cfg.pretrained_backbone:
        # no ImageNet running statistics exist: calibrate the frozen BN
        # stats from one real batch so a from-scratch backbone is trainable.
        # Multi-host: every process must calibrate from the SAME full batch
        # (seeded shuffle => identical stream), or stats diverge across the
        # replicated state
        cal_dl = train_dl if jax.process_count() == 1 else (
            loader_mod.BatchLoader(
                train_ds, cfg.cam_batch_size, shuffle=True, drop_last=True,
                num_workers=cfg.num_workers,
            )
        )
        batch = next(iter(cal_dl))
        _, mutated = model.apply(
            variables, batch["img"], method=model.calibrate_stats,
            mutable=["stats"],
        )
        variables["stats"] = mutated["stats"]
        print("calibrated frozen-BN statistics from one batch")

    # the reference's effective hypers: real weight decay (the per-group
    # dicts override PolyOptimizer's swallowed constructor default,
    # train_cam.py:57-59) + stray momentum = the same value (it lands in
    # torch SGD's momentum slot, torchutils.py:10); float64 step parity in
    # tests/test_train_step_parity.py
    tx = optim.poly_sgd(
        cfg.cam_learning_rate, max_step=max_step, power=0.9,
        weight_decay=cfg.cam_weight_decay, momentum=cfg.cam_weight_decay,
        mult_fn=optim.cam_lr_mult if cfg.cam_stop_grad else optim.cam_lr_mult_full,
    )
    state = create_train_state(variables, tx)

    # mid-training resume (upgrade over the reference's end-only save)
    train_ckpt_path = cfg.cam_weights_name + ".train"
    start_epoch = 0
    if cfg.resume and os.path.exists(train_ckpt_path):
        saved = ckpt.load_checkpoint(train_ckpt_path)
        state = state.replace(
            params=saved["params"], stats=saved["stats"],
            opt_state=saved["opt_state"], step=jnp.asarray(saved["step"]),
        )
        start_epoch = int(saved["epoch"])
        print(f"resumed {train_ckpt_path} at epoch {start_epoch}")

    state = mesh_mod.replicate(state, mesh)
    step_fn = cam_train.make_train_step(model, tx)
    eval_fn = cam_train.make_eval_step(model)

    from irn_tpu.utils.profiling import StageProfiler

    prof = StageProfiler(cfg.profile_dir, "train_cam")
    meter = DeviceMeter()
    timer = Timer()
    steps_per_epoch = len(train_dl)
    step_c = None  # resolved at the first batch (multi-host: AOT+barrier)
    for ep in range(start_epoch, cfg.cam_num_epoches):
        print(f"Epoch {ep + 1}/{cfg.cam_num_epoches}")
        # pin the loader's RNG stream to the true epoch: resumed runs
        # continue the shuffle/augmentation sequence instead of
        # replaying epoch 0 (found by review)
        train_dl.set_epoch(ep)
        for it, batch in enumerate(train_dl):
            sb = mesh_mod.shard_batch(
                {"img": batch["img"], "label": np.stack(batch["label"])},
                mesh, global_batch=cfg.cam_batch_size,
            )
            if step_c is None:
                if jax.process_count() > 1:
                    # compile first (minutes), THEN sync: every process
                    # must reach the first gradient all-reduce within
                    # gloo/ICI's connect window (mesh.process_barrier)
                    step_c = mesh_mod.compile_step(
                        step_fn, state, sb["img"], sb["label"]
                    )
                    mesh_mod.process_barrier("train_cam_compiled")
                    mesh_mod.warm_collectives(mesh)
                else:
                    step_c = step_fn
            state, metrics = step_c(state, sb["img"], sb["label"])
            prof.tick()
            meter.add({"loss1": metrics["loss"]})
            # host-side step counter: int(state.step) is a device value
            # fetch that forces execution every iteration (DeviceMeter
            # exists to defer exactly that to the log interval)
            gstep = ep * steps_per_epoch + it + 1
            if (gstep - 1) % 100 == 0:
                # every process fetches (a dispatch error on a non-main
                # process must fail its run, not vanish — it never
                # fetches otherwise); only process 0 prints
                loss1 = meter.pop("loss1")
                if is_main:
                    timer.update_progress(gstep / max_step)
                    print(
                        f"step:{gstep - 1:5d}/{max_step:5d}",
                        f"loss:{loss1:.4f}",
                        f"imps:{(it + 1) * cfg.cam_batch_size / timer.get_stage_elapsed():.1f}",
                        f"etc:{timer.str_estimated_complete()}",
                        flush=True,
                    )
        # validation (train_cam.py:14-36); multi-host: process 0 only,
        # over a host copy of the replicated state under a local jit (the
        # global state can't enter a single-process computation)
        if is_main:
            vstate = state if jax.process_count() == 1 else state.replace(
                params=mesh_mod.fetch_replicated(state.params),
                stats=mesh_mod.fetch_replicated(state.stats),
                opt_state=None,
            )
            val_meter = AverageMeter()
            for batch in val_dl:
                loss = eval_fn(vstate, batch["img"], np.stack(batch["label"]))
                val_meter.add({"loss": float(loss)})
            print(f"validate loss: {val_meter.get('loss'):.4f}")
        timer.reset_stage()
        if is_main:
            ckpt.save_checkpoint(
                train_ckpt_path,
                {"params": mesh_mod.fetch_replicated(state.params),
                 "stats": mesh_mod.fetch_replicated(state.stats),
                 "opt_state": mesh_mod.fetch_replicated(state.opt_state),
                 "step": int(state.step), "epoch": ep + 1},
            )

    prof.close()
    if is_main:
        ckpt.save_checkpoint(
            cfg.cam_weights_name,
            {"params": mesh_mod.fetch_replicated(state.params),
             "stats": mesh_mod.fetch_replicated(state.stats)},
        )
        print(f"saved {cfg.cam_weights_name}")


def _chunk_sizes(m: int, cap: int):
    """Decompose ``m`` into chunk sizes <= cap: full ``cap`` chunks, then a
    power-of-two tail so the number of distinct compiled batch shapes stays
    O(log cap) instead of O(cap)."""
    out = []
    while m >= cap:
        out.append(cap)
        m -= cap
    while m:
        k = 1 << (m.bit_length() - 1)
        out.append(k)
        m -= k
    return out


def build_cam_scale_pass(model: CAMNet, variables, s4_cap: int, su_cap: int):
    """One-scale CAM pass builder, cached per (padded shape, batch size).

    The returned ``scale_pass(ph, pw, k)`` jits: uint8 normalize + pad-mask,
    flip-pair stacking, the [2k] CAM forward, flip fusion (dynamic roll),
    dynamic-extent resizes to the stride-4 / strided-up grids, and
    accumulation into the cross-scale sums. Shared by make_cam and the
    throughput bench (tools/bench_make_cam.py)."""
    from irn_tpu.ops.resize import resize_bilinear_dynamic

    mean = jnp.asarray(T.IMAGENET_MEAN)
    std = jnp.asarray(T.IMAGENET_STD)

    @functools.lru_cache(maxsize=None)
    def scale_pass(ph: int, pw: int, k: int):
        # donate the cross-scale accumulators: XLA aliases them in-place
        # instead of copying the 420 MB h_acc buffer every scale pass
        @functools.partial(jax.jit, donate_argnums=(11, 12))
        def run(img_u8, sh, sw, vh, vw, s4h, s4w, suh, suw, oh, ow,
                s_acc, h_acc):
            # uint8 upload; normalize + pad-mask + flip pairs on device
            x = (img_u8.astype(jnp.float32) / 255.0 - mean) / std
            pr = jax.lax.broadcasted_iota(jnp.int32, (ph, pw), 0)
            pc = jax.lax.broadcasted_iota(jnp.int32, (ph, pw), 1)
            x = jnp.where(((pr < sh) & (pc < sw))[None, ..., None], x, 0.0)
            flip = jnp.roll(x[:, :, ::-1, :], -(pw - sw), axis=2)
            stack = jnp.concatenate([x, flip], axis=0)  # [2k, ph, pw, 3]
            maps = model.apply(
                variables, stack, extent=(sh, sw), method=model.cam
            )
            m = jnp.transpose(maps, (0, 3, 1, 2))  # [2k, 20, ph16, pw16]
            w16 = m.shape[-1]
            flipped = jnp.roll(m[k:][..., ::-1], -(w16 - vw), axis=-1)
            fused = m[:k] + flipped  # [k, 20, .]; valid in [0,vh)x[0,vw)
            s = resize_bilinear_dynamic(
                fused, (vh, vw), (s4h, s4w), (s4_cap, s4_cap)
            )
            hr = resize_bilinear_dynamic(
                fused, (vh, vw), (suh, suw), (su_cap, su_cap)
            )
            # reference crops high_res to the original size BEFORE
            # normalization (make_cam.py:43): zero beyond (oh, ow)
            oy = jax.lax.broadcasted_iota(jnp.int32, (su_cap, su_cap), 0)
            ox = jax.lax.broadcasted_iota(jnp.int32, (su_cap, su_cap), 1)
            hr = jnp.where((oy < oh) & (ox < ow), hr, 0.0)
            return s_acc + s, h_acc + hr

        return run

    return scale_pass


def make_cam(cfg: Config) -> None:
    """Multi-scale flipped CAM inference (step/make_cam.py).

    Fully device-resident: flip fusion (dynamic roll), the resizes to the
    stride-4 and strided-up grids (dynamic-extent bilinear), the cross-scale
    sums, and per-class max-normalization all happen on device; only the K
    present classes' final maps cross device->host.

    MXU feeding: images are grouped by *exact original size* (VOC is
    dominated by a handful of sizes) and up to ``cam_infer_batch`` of them
    ride one ``[2K, ph, pw, 3]`` stack per scale — identical extents, so the
    dynamic-shape machinery stays scalar and results match the per-image
    path exactly. The reference instead loops one image per forward
    (step/make_cam.py:26-56) and buys parallelism with one process per GPU."""
    labels = _label_dict(cfg)
    ds = voc12.ClassificationDataset(
        cfg.infer_list, cfg.voc12_root, labels, img_normal=False
    )
    model = CAMNet(dtype=jnp.dtype(cfg.model_dtype))
    variables = ckpt.load_checkpoint(cfg.cam_weights_name)
    os.makedirs(cfg.cam_out_dir, exist_ok=True)

    s4_cap = cfg.rw_grid_cap                      # stride-4 grid cap
    su_cap = cfg.rw_grid_cap * 4                  # strided-up (<= orig) cap
    n_cls = 20
    batch_cap = max(1, cfg.cam_infer_batch)

    scale_pass = build_cam_scale_pass(model, variables, s4_cap, su_cap)

    @jax.jit
    def finalize(s_acc, h_acc, vc):
        s = jnp.take(s_acc, vc, axis=0)
        s = s / (s.max(axis=(1, 2), keepdims=True) + 1e-5)
        h = jnp.take(h_acc, vc, axis=0)
        h = h / (h.max(axis=(1, 2), keepdims=True) + 1e-5)
        return s, h

    from collections import deque

    from PIL import Image

    spread = common.DeviceSpreader(cfg.infer_devices)
    n = len(ds)
    pending = deque()  # (i, out_path, size, s4, valid_cat, s_sel, h_sel)

    def finish(item):
        i, out_path, size, (s4h, s4w), valid_cat, s_sel, h_sel = item
        # slice on device so only the true extents cross device->host
        strided_cam = np.asarray(s_sel[:, :s4h, :s4w])
        highres_cam = np.asarray(h_sel[:, : size[0], : size[1]])
        np.save(
            out_path,
            {"keys": valid_cat, "cam": strided_cam, "high_res": highres_cam},
        )
        if i % max(n // 20, 1) == 0:
            print(f"make_cam {i}/{n}", flush=True)

    # group pending work by exact image size (header-only PIL reads) so
    # same-shape stacks share one compiled program per scale
    groups: Dict[tuple, list] = {}
    for i in common.host_shard_range(n):
        name = ds.img_name_list[i]
        out_path = os.path.join(cfg.cam_out_dir, name + ".npy")
        if not cfg.overwrite and os.path.exists(out_path):
            continue
        with Image.open(voc12.get_img_path(name, cfg.voc12_root)) as im:
            w, h = im.size
        groups.setdefault((h, w), []).append((i, out_path))

    n_chunks = 0
    for size, items in groups.items():
        s4h, s4w = T.get_strided_size(size, 4)
        suh, suw = T.get_strided_up_size(size, 16)
        if s4h > s4_cap or s4w > s4_cap:
            raise ValueError(
                f"{len(items)} image(s) of size {size} exceed the "
                f"rw_grid_cap={cfg.rw_grid_cap} stride-4 grid "
                f"({s4_cap * 4}px); raise --rw_grid_cap"
            )
        pos = 0
        for k in _chunk_sizes(len(items), batch_cap):
            chunk = items[pos:pos + k]
            pos += k
            dev = spread(n_chunks)
            n_chunks += 1
            samples = [ds[i] for i, _ in chunk]
            imgs = np.stack([s["img"] for s in samples]).astype(np.uint8)

            s_acc = jax.device_put(
                jnp.zeros((k, n_cls, s4_cap, s4_cap), jnp.float32), dev
            )
            h_acc = jax.device_put(
                jnp.zeros((k, n_cls, su_cap, su_cap), jnp.float32), dev
            )
            for scale in cfg.cam_scales:
                if scale == 1:
                    s_imgs = imgs
                else:
                    s_imgs = np.stack(
                        [T.pil_rescale(im, scale, 3) for im in imgs]
                    )
                sh, sw = s_imgs.shape[1:3]
                ph = common.round_up(sh, cfg.pad_multiple)
                pw = common.round_up(sw, cfg.pad_multiple)
                vh = -(-sh // 16)
                vw = -(-sw // 16)
                padded = np.pad(
                    s_imgs, ((0, 0), (0, ph - sh), (0, pw - sw), (0, 0))
                )
                s_acc, h_acc = scale_pass(ph, pw, k)(
                    jax.device_put(padded, dev),
                    jnp.int32(sh), jnp.int32(sw),
                    jnp.int32(vh), jnp.int32(vw),
                    jnp.int32(s4h), jnp.int32(s4w),
                    jnp.int32(suh), jnp.int32(suw),
                    jnp.int32(size[0]), jnp.int32(size[1]),
                    s_acc, h_acc,
                )

            for j, ((i, out_path), sample) in enumerate(zip(chunk, samples)):
                valid_cat = np.nonzero(np.asarray(sample["label"]))[0]
                s_sel, h_sel = finalize(
                    s_acc[j], h_acc[j], jnp.asarray(valid_cat)
                )
                pending.append(
                    (i, out_path, size, (s4h, s4w), valid_cat, s_sel, h_sel)
                )
            while len(pending) > len(spread):
                finish(pending.popleft())
    while pending:
        finish(pending.popleft())


def eval_cam(cfg: Config, sweep: bool = False):
    """CAM seed quality at ``cam_eval_thres`` (step/eval_cam.py). With
    ``sweep=True`` also reports mIoU over a background-threshold grid —
    the standard way reference users pick cam_eval_thres."""
    from irn_tpu.eval import semseg

    names = voc12.load_img_name_list(cfg.infer_list)
    thresholds = [cfg.cam_eval_thres]
    grid = [round(0.05 * k, 2) for k in range(1, 10)] if sweep else []
    thresholds += [t for t in grid if t not in thresholds]
    # streaming: one cam dict + gt resident at a time; every threshold's
    # confusion accumulates in the same pass over the (large) split
    confs = {t: np.zeros((21, 21), np.int64) for t in thresholds}
    for name in names:
        d = np.load(
            os.path.join(cfg.cam_out_dir, name + ".npy"), allow_pickle=True
        ).item()
        gt = voc12.read_label_png(
            os.path.join(cfg.voc12_root, "SegmentationClass", name + ".png")
        )
        keys = np.asarray(d["keys"])
        for t in thresholds:
            pred = semseg.decode_cam_to_labels(d["high_res"], keys, t)
            semseg.accumulate_confusion(confs[t], pred, gt)

    scores = semseg.scores_from_confusion(confs[cfg.cam_eval_thres])
    print({"iou": scores["iou"], "miou": scores["miou"]})
    if sweep:
        sweep_scores = {
            t: semseg.scores_from_confusion(confs[t])["miou"] for t in grid
        }
        best = max(sweep_scores, key=sweep_scores.get)
        print("threshold sweep:", sweep_scores)
        print(f"best cam_eval_thres: {best} (miou {sweep_scores[best]:.4f})")
        scores["sweep"] = sweep_scores
    return scores


def cam_to_ir_label(cfg: Config) -> None:
    """CAM -> confident inter-pixel relation seeds via dense CRF
    (step/cam_to_ir_label.py).

    ``crf_backend='native'``: CPU-bound; the native lattice releases the
    GIL, so a thread pool gives real parallelism (the reference fans out
    one process per CPU worker, cam_to_ir_label.py:51-54). ``'tpu'``: the
    landmark-kernel mean field (ops/crf_tpu.py) refines each fg/bg pair
    on device — host threads are then only overlapping I/O with device
    steps. The default ``'auto'`` picks 'tpu' whenever an accelerator is
    present: the round-4 chain A/B (tools/ab_crf_chain.py) measured the
    backends' end-of-chain sem_seg disagreement and mIoU delta inside
    the train-seed noise band, so the residual 0.02-0.03% per-image CRF
    disagreement is chain-harmless and the 10-33x device speedup wins."""
    from concurrent.futures import ThreadPoolExecutor

    from irn_tpu.ops import native as native_mod

    ds = voc12.ImageDataset(
        cfg.infer_list, cfg.voc12_root, img_normal=False
    )
    os.makedirs(cfg.ir_label_out_dir, exist_ok=True)
    n = len(ds)
    if cfg.resolved_crf_backend() == "tpu":
        from irn_tpu.ops import crf_tpu

        device_crf = crf_tpu.LandmarkCRF(
            stride=cfg.crf_landmark_stride, t=cfg.crf_iters,
            pad_multiple=cfg.pad_multiple,
            kernel_store=cfg.crf_kernel_store,
        )
        refine = device_crf.pair  # t is already bound via LandmarkCRF(t=)
    else:
        device_crf = None
        refine = functools.partial(
            crf.crf_inference_label_pair, t=cfg.crf_iters
        )
        # split cores between image-level fan-out and the native filter's
        # OpenMP threads (they multiply)
        n_pool = max(1, cfg.num_workers)
        native_mod.set_num_threads(max(1, (os.cpu_count() or 1) // n_pool))

    def work(i: int):
        # idempotent skip BEFORE decoding: resuming a partial run must
        # not pay a JPEG decode per already-finished image
        name = ds.img_name_list[i]
        out_path = os.path.join(cfg.ir_label_out_dir, name + ".png")
        if not cfg.overwrite and os.path.exists(out_path):
            return
        sample = ds[i]
        img = sample["img"].astype(np.uint8)
        cam_dict = np.load(
            os.path.join(cfg.cam_out_dir, name + ".npy"), allow_pickle=True
        ).item()
        cams = cam_dict["high_res"]
        keys = np.pad(np.asarray(cam_dict["keys"]) + 1, (1, 0), mode="constant")

        # fg/bg confident maps (cam_to_ir_label.py:26-34)
        fg_map = np.argmax(
            np.pad(cams, ((1, 0), (0, 0), (0, 0)), constant_values=cfg.conf_fg_thres),
            axis=0,
        ).astype(np.int32)
        bg_map = np.argmax(
            np.pad(cams, ((1, 0), (0, 0), (0, 0)), constant_values=cfg.conf_bg_thres),
            axis=0,
        ).astype(np.int32)
        fg_pred, bg_pred = refine(
            img, fg_map, bg_map, n_labels=keys.shape[0],
            gt_prob=cfg.crf_gt_prob,
        )
        fg_conf = keys[fg_pred]
        bg_conf = keys[bg_pred]

        conf_map = fg_conf.copy()
        conf_map[fg_conf == 0] = 255
        conf_map[bg_conf + fg_conf == 0] = 0
        imageio.imwrite(out_path, conf_map.astype(np.uint8))
        if i % max(n // 20, 1) == 0:
            print(f"cam_to_ir_label {i}/{n}", flush=True)

    with ThreadPoolExecutor(max_workers=max(1, cfg.num_workers)) as pool:
        list(pool.map(work, common.host_shard_range(n)))
