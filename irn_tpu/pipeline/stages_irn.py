"""IRN stages: train_irn, make_sem_seg_labels, make_ins_seg_labels.

Stage contracts follow step/train_irn.py, step/make_sem_seg_labels.py,
step/make_ins_seg_labels.py (artifacts: ``result/sem_seg/<id>.png``,
``result/ins_seg/<id>.npy`` dicts {score, mask, class}).

TPU redesign highlights:

- EdgeDisplacement inference, the dense random-walk (transition build + 8
  MXU squarings), seed propagation, and label decode are each ONE fixed-
  shape XLA program reused for every image; true extents flow in as dynamic
  scalars (vs the reference rebuilding PathIndex and a fresh (HW)^2 matrix
  per image size and round-tripping through CPU sparse tensors).
- Flip fusion over the padded buffer uses a dynamic roll, so the padded
  (orig, flip) pair shares the program too.
- Instance seeds are padded to a fixed row cap so the (instances x classes)
  random walk is also one program.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Tuple

import imageio.v2 as imageio
import jax
import jax.numpy as jnp
import numpy as np

from irn_tpu.data import loader as loader_mod
from irn_tpu.data import voc12
from irn_tpu.models.irn import IRNet
from irn_tpu.ops import cc
from irn_tpu.ops import ccl_tpu
from irn_tpu.ops import centroids as cent_mod
from irn_tpu.ops import random_walk as rw_mod
from irn_tpu.parallel import mesh as mesh_mod
from irn_tpu.pipeline import common
from irn_tpu.pipeline.config import Config
from irn_tpu.train import irn_train, optim
from irn_tpu.train.state import create_train_state
from irn_tpu.utils import checkpoint as ckpt
from irn_tpu.utils.logging import DeviceMeter, Timer


def train_irn(cfg: Config) -> None:
    ds = voc12.AffinityDataset(
        cfg.train_list, label_dir=cfg.ir_label_out_dir,
        crop_size=cfg.irn_crop_size, voc12_root=cfg.voc12_root,
        rescale=(0.5, 1.5), hor_flip=True, crop_method="random",
    )
    # mesh first: in multi-host mode (pipeline/run.maybe_init_distributed)
    # it spans the GLOBAL devices and each process's loader decodes only
    # its contiguous rows of every global batch
    mesh = mesh_mod.mesh_for_batch(cfg.irn_batch_size, cfg.mesh_data or None)
    local_rows = mesh_mod.local_batch_slice(mesh, cfg.irn_batch_size)
    is_main = jax.process_index() == 0
    dl = loader_mod.BatchLoader(
        ds, cfg.irn_batch_size, shuffle=True, drop_last=True,
        num_workers=cfg.num_workers,
        local_rows=local_rows if jax.process_count() > 1 else None,
    )
    max_step = (len(ds) // cfg.irn_batch_size) * cfg.irn_num_epoches

    model = IRNet(dtype=jnp.dtype(cfg.model_dtype))
    example = np.zeros((1, cfg.irn_crop_size, cfg.irn_crop_size, 3), np.float32)
    variables = common.init_model_variables(model, cfg, example)
    grid = irn_train.build_train_geometry(cfg.irn_crop_size, cfg.path_radius)
    tx = optim.poly_sgd(
        cfg.irn_learning_rate, max_step=max_step, power=0.9,
        weight_decay=cfg.irn_weight_decay, momentum=cfg.irn_weight_decay,
        mult_fn=optim.irn_lr_mult,
    )
    state = create_train_state(variables, tx)

    train_ckpt_path = cfg.irn_weights_name + ".train"
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
    step_fn = irn_train.make_train_step(model, tx, grid)

    from irn_tpu.utils.profiling import StageProfiler

    prof = StageProfiler(cfg.profile_dir, "train_irn")
    meter = DeviceMeter()
    timer = Timer()
    steps_per_epoch = len(dl)
    step_c = None  # resolved at the first batch (multi-host: AOT+barrier)
    for ep in range(start_epoch, cfg.irn_num_epoches):
        print(f"Epoch {ep + 1}/{cfg.irn_num_epoches}")
        # pin the loader's RNG stream to the true epoch so a resumed run
        # continues the shuffle/augmentation sequence (found by review)
        dl.set_epoch(ep)
        for it, batch in enumerate(dl):
            sb = mesh_mod.shard_batch(
                {"img": batch["img"], "red": batch["reduced_label"]},
                mesh, global_batch=cfg.irn_batch_size,
            )
            if step_c is None:
                if jax.process_count() > 1:
                    # compile first (minutes), THEN sync: every process
                    # must reach the first gradient all-reduce within
                    # gloo/ICI's connect window (mesh.process_barrier)
                    step_c = mesh_mod.compile_step(
                        step_fn, state, sb["img"], sb["red"]
                    )
                    mesh_mod.process_barrier("train_irn_compiled")
                    mesh_mod.warm_collectives(mesh)
                else:
                    step_c = step_fn
            state, metrics = step_c(state, sb["img"], sb["red"])
            prof.tick()
            meter.add(metrics)
            # host-side counter: int(state.step) would fetch a device
            # value (forcing execution) every iteration
            gstep = ep * steps_per_epoch + it + 1
            if (gstep - 1) % 50 == 0:
                # every process fetches (surfacing non-main dispatch
                # errors); only process 0 prints
                losses = (
                    meter.pop("loss_pos_aff"), meter.pop("loss_neg_aff"),
                    meter.pop("loss_dp_fg"), meter.pop("loss_dp_bg"),
                )
                if is_main:
                    timer.update_progress(gstep / max_step)
                    print(
                        f"step:{gstep - 1:5d}/{max_step:5d}",
                        "loss:%.4f %.4f %.4f %.4f" % losses,
                        f"imps:{(it + 1) * cfg.irn_batch_size / timer.get_stage_elapsed():.1f}",
                        f"etc:{timer.str_estimated_complete()}",
                        flush=True,
                    )
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

    # displacement mean calibration (train_irn.py:87-107); multi-host:
    # the calibrated mean only travels in the saved checkpoint, so
    # process 0 computes it over a host copy of the replicated state
    # under a local jit and the other processes are done
    if not is_main:
        return
    if jax.process_count() > 1:
        state = state.replace(
            params=mesh_mod.fetch_replicated(state.params),
            stats=mesh_mod.fetch_replicated(state.stats),
            opt_state=None,
        )
    infer_ds = voc12.ImageDataset(
        cfg.infer_list, cfg.voc12_root, crop_size=cfg.irn_crop_size,
        crop_method="top_left",
    )
    infer_dl = loader_mod.BatchLoader(
        infer_ds, cfg.irn_batch_size, shuffle=False, drop_last=False,
        num_workers=cfg.num_workers,
    )
    dp_step = irn_train.make_dp_mean_step(model)
    print("Analyzing displacements mean ... ", end="", flush=True)
    means = [dp_step(state, b["img"]) for b in infer_dl]
    state = irn_train.calibrate_mean_shift(state, means)
    print("done.")

    ckpt.save_checkpoint(
        cfg.irn_weights_name,
        {"params": mesh_mod.fetch_replicated(state.params),
         "stats": mesh_mod.fetch_replicated(state.stats)},
    )
    print(f"saved {cfg.irn_weights_name}")


# ---------------------------------------------------------------------------
# Shared fixed-shape inference programs
# ---------------------------------------------------------------------------

class EdgeDisplacementRunner:
    """One-compilation EdgeDisplacement over the padded crop buffer.

    forward(pair, h4, w4) -> (edge [cap, cap] with 1.0 beyond extent,
    dp [2, cap, cap] (dy, dx) with 0 beyond extent). Matches
    resnet50_irn.py:223-234: sigmoid of the flip-averaged logit, unflipped
    displacement, mean-shift applied.
    """

    def __init__(self, cfg: Config, variables: Dict):
        self.model = IRNet(dtype=jnp.dtype(cfg.model_dtype))
        self.variables = variables
        self.cap = cfg.rw_grid_cap
        self.batch_size = max(1, cfg.edge_infer_batch)

        from irn_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

        mean = jnp.asarray(IMAGENET_MEAN)
        std = jnp.asarray(IMAGENET_STD)
        cap = self.cap

        def prep(img_u8, h_px, w_px):
            # normalize + build the flip pair on device: the host uploads
            # one uint8 image (8x less host->device traffic than an fp32
            # (orig, flip) pair). Padding must be zero in NORMALIZED space
            # (the reference pads the normalized tensor,
            # resnet50_irn.py:226), so mask after normalizing.
            x = (img_u8.astype(jnp.float32) / 255.0 - mean) / std
            pr = jax.lax.broadcasted_iota(jnp.int32, x.shape[:2], 0)
            pc = jax.lax.broadcasted_iota(jnp.int32, x.shape[:2], 1)
            x = jnp.where(((pr < h_px) & (pc < w_px))[..., None], x, 0.0)
            flip = jnp.roll(x[:, ::-1, :], -(x.shape[1] - w_px), axis=1)
            return jnp.stack([x, flip], axis=0)  # [2, cap_px, cap_px, 3]

        def fuse(e, d, h4, w4):
            # e [2, cap, cap] edge logits, d [2, cap, cap, 2] displacements
            flipped = e[1][:, ::-1]
            # align the flipped valid region to columns [0, w4)
            flipped = jnp.roll(flipped, -(cap - w4), axis=1)
            edge = jax.nn.sigmoid(e[0] / 2.0 + flipped / 2.0)
            rows = jax.lax.broadcasted_iota(jnp.int32, (cap, cap), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (cap, cap), 1)
            valid = (rows < h4) & (cols < w4)
            edge = jnp.where(valid, edge, 1.0)  # hard boundary beyond extent
            dp = jnp.where(valid[None], jnp.transpose(d[0], (2, 0, 1)), 0.0)
            return edge, dp

        def edge_dp_core(img_u8, h_px, w_px, h4, w4):
            # the traceable forward body every fused program shares:
            # prep -> model -> flip-fuse. Reads self.model/variables at
            # trace time (bench model wrappers install before first call).
            pair = prep(img_u8, h_px, w_px)
            edge_logit, dp = self.model.apply(
                self.variables, pair, apply_mean_shift=True
            )
            return fuse(edge_logit[..., 0], dp, h4, w4)

        self.edge_dp_core = edge_dp_core
        run = jax.jit(edge_dp_core)

        @jax.jit
        def run_batch(imgs_u8: jax.Array, h_px: jax.Array, w_px: jax.Array,
                      h4: jax.Array, w4: jax.Array):
            # one [2B, cap_px, cap_px, 3] backbone pass for B images (every
            # image shares the padded crop buffer, so any size mix batches
            # — the fan-out the reference gets from per-GPU spawn,
            # make_sem_seg_labels.py:67-70, plus MXU-feeding batching)
            pairs = jax.vmap(prep)(imgs_u8, h_px, w_px)
            b = pairs.shape[0]
            flat = pairs.reshape((2 * b,) + pairs.shape[2:])
            edge_logit, dp = self.model.apply(
                self.variables, flat, apply_mean_shift=True
            )
            e = edge_logit[..., 0].reshape(b, 2, cap, cap)
            d = dp.reshape(b, 2, cap, cap, 2)
            return jax.vmap(fuse)(e, d, h4, w4)

        # the make_ins_seg advection pack: one shared tail owns the basin
        # predicate (see _advect_pack_core)
        advect_pack_tail = _advect_pack_core

        @jax.jit
        def run_advect(img_u8: jax.Array, h_px: jax.Array, w_px: jax.Array,
                       h4: jax.Array, w4: jax.Array):
            # forward + advection in ONE program: the dp field never
            # leaves the device and the stage pays one dispatch instead
            # of two (through a relay-style transport each program
            # boundary costs ~10-30 ms — round-4 breakdown)
            edge, dp = edge_dp_core(img_u8, h_px, w_px, h4, w4)
            return edge, advect_pack_tail(dp, h4, w4)

        self.cluster_cap = cfg.ins_cluster_cap

        @jax.jit
        def run_cluster(img_u8: jax.Array, h_px: jax.Array,
                        w_px: jax.Array, h4: jax.Array, w4: jax.Array):
            # forward + advection + device CCL in ONE program: neither
            # the dp field, the centroids, nor the basin plane ever
            # leaves the device — the round-4 flow's pack fetch + host
            # union-find + mask re-upload collapse into the device chain
            # (VERDICT r4 #2; the instance masks stay resident for
            # _seed_build_cropped)
            edge, dp = edge_dp_core(img_u8, h_px, w_px, h4, w4)
            masks, n_found = _cluster_pack_core(dp, h4, w4, self.cluster_cap)
            return edge, masks, n_found

        self._run = run
        self._run_batch = run_batch
        self._run_advect = run_advect
        self._run_cluster = run_cluster

    def with_advect(self, img_u8: np.ndarray, size: Tuple[int, int],
                    device=None):
        """:meth:`__call__` fused with the instance stage's advection
        pack: returns (edge, pack, (h4, w4)) with ``pack`` the device
        [3, cap, cap] uint8 (cy, cx, basin) array (f32 layout beyond
        255-cell grids)."""
        cap_px = self.cap * 4
        h, w, _ = img_u8.shape
        assert h <= cap_px and w <= cap_px, (h, w, cap_px)
        padded = np.pad(img_u8, ((0, cap_px - h), (0, cap_px - w), (0, 0)))
        if device is not None:
            padded = jax.device_put(padded, device)
        h4 = (size[0] - 1) // 4 + 1
        w4 = (size[1] - 1) // 4 + 1
        edge, pack = self._run_advect(
            padded, jnp.int32(h), jnp.int32(w), jnp.int32(h4), jnp.int32(w4)
        )
        return edge, pack, (h4, w4)

    def with_cluster(self, img_u8: np.ndarray, size: Tuple[int, int],
                     device=None):
        """:meth:`__call__` fused with the instance stage's advection AND
        device clustering: returns (edge, masks, n_found, (h4, w4)) with
        ``masks`` the device [ins_cluster_cap, cap, cap] uint8 one-hot
        instance stack and ``n_found`` the device cluster count scalar
        (k_cap + 1 = overflow)."""
        cap_px = self.cap * 4
        h, w, _ = img_u8.shape
        assert h <= cap_px and w <= cap_px, (h, w, cap_px)
        padded = np.pad(img_u8, ((0, cap_px - h), (0, cap_px - w), (0, 0)))
        if device is not None:
            padded = jax.device_put(padded, device)
        h4 = (size[0] - 1) // 4 + 1
        w4 = (size[1] - 1) // 4 + 1
        edge, masks, n_found = self._run_cluster(
            padded, jnp.int32(h), jnp.int32(w), jnp.int32(h4), jnp.int32(w4)
        )
        return edge, masks, n_found, (h4, w4)

    def __call__(self, img_u8: np.ndarray, size: Tuple[int, int],
                 device=None):
        """img_u8: [H, W, 3] uint8 original image; size: true (H, W).

        ``device``: commit the input (and thus the program) to a specific
        local device for round-robin fan-out."""
        cap_px = self.cap * 4
        h, w, _ = img_u8.shape
        assert h <= cap_px and w <= cap_px, (h, w, cap_px)
        padded = np.pad(img_u8, ((0, cap_px - h), (0, cap_px - w), (0, 0)))
        if device is not None:
            padded = jax.device_put(padded, device)
        h4 = (size[0] - 1) // 4 + 1
        w4 = (size[1] - 1) // 4 + 1
        edge, dp = self._run(
            padded, jnp.int32(h), jnp.int32(w), jnp.int32(h4), jnp.int32(w4)
        )
        return edge, dp, (h4, w4)

    def batch(self, imgs, sizes, device=None):
        """One EdgeDisplacement forward for up to ``batch_size`` images.

        imgs: list of [H, W, 3] uint8 arrays; sizes: their true (H, W).
        Returns a list of (edge, dp, (h4, w4)) matching :meth:`__call__`
        exactly (the batch is padded to the fixed program size with empty
        slots — h4 = 0 masks them completely). One image falls through to
        the per-image program."""
        assert len(imgs) <= self.batch_size, (len(imgs), self.batch_size)
        if self.batch_size == 1 or len(imgs) == 1:
            return [
                self(im, sz, device=device) for im, sz in zip(imgs, sizes)
            ]
        b = self.batch_size
        cap_px = self.cap * 4
        buf = np.zeros((b, cap_px, cap_px, 3), np.uint8)
        hw = np.zeros((4, b), np.int32)  # h_px, w_px, h4, w4
        for j, (im, size) in enumerate(zip(imgs, sizes)):
            h, w, _ = im.shape
            assert h <= cap_px and w <= cap_px, (h, w, cap_px)
            buf[j, :h, :w] = im
            hw[:, j] = (h, w, (size[0] - 1) // 4 + 1, (size[1] - 1) // 4 + 1)
        if device is not None:
            buf = jax.device_put(buf, device)
        edges, dps = self._run_batch(
            buf, jnp.asarray(hw[0]), jnp.asarray(hw[1]),
            jnp.asarray(hw[2]), jnp.asarray(hw[3]),
        )
        return [
            (edges[j], dps[j], (int(hw[2, j]), int(hw[3, j])))
            for j in range(len(imgs))
        ]


class RandomWalkRunner:
    """Bucketed fixed-shape transition build + seed propagation + decode.

    The transition-power cost is cubic in the grid's vertex count, so
    instead of one worst-case cap the runner keeps a small family of
    bucketed geometries (grid dims rounded up to ``bucket`` cells) and
    lazily compiles one program per bucket actually seen. A typical
    landscape VOC image (stride-4 grid 94x125) runs on the (96, 128)
    bucket at ~47% of the worst-case FLOPs."""

    BUCKET = 32
    # Seed rows pad to a power-of-two bucket family starting here (see
    # _row_bucket): the e=0 diagonal stencil's cost is linear in seed
    # rows above the 8-sublane f32 tile — measured 9.8 vs 17.1 ms/chain
    # at the production bucket (C=8 vs C=20, v5e-1). A VOC image carries
    # 1-3 classes (make_sem_seg) but make_ins_seg walks
    # (instances x classes) rows anywhere in [1, 128].
    ROW_BUCKET = 8

    def __init__(self, cfg: Config, n_seed_rows: int):
        import threading

        self.cap = cfg.rw_grid_cap
        self.radius = cfg.rw_radius
        self.beta = cfg.beta
        self.exp_times = cfg.exp_times
        self.n_rows = n_seed_rows
        self.mm_dtype = cfg.rw_matmul_jnp_dtype()
        self.square_times_cfg = cfg.rw_square_times
        self.banded_cfg = cfg.rw_banded
        self.comp_cap = cfg.ins_comp_cap
        # long-context mode: row-shard the transition matrix over a model
        # mesh, so one image's (HW)^2 matrix splits across the slice
        self.mesh = (
            mesh_mod.make_mesh(n_data=1, n_model=cfg.rw_mesh_model)
            if cfg.rw_mesh_model > 1 else None
        )
        self._programs = {}
        self._lock = threading.Lock()

    def _square_times(self, geom) -> int:
        """Resolved squarings-vs-applications split for this geometry.

        Always evaluated for n_chunks=1 so the fused and chunked paths pick
        the same exponent — with the same T^(2^e) and the same per-chunk
        application count, chunked labels stay bit-equal to fused ones."""
        if self.square_times_cfg >= 0:
            return min(self.square_times_cfg, self.exp_times)
        return rw_mod.pick_square_times(
            geom.n_pad, self.exp_times, n_chunks=1,
            matmul_dtype=self.mm_dtype,
        )

    def _use_banded(self, geom, sq: int) -> bool:
        """Banded Pallas kernels: single-device TPU only (the mesh path
        shards dense matrices; other backends lack the kernels)."""
        return (
            self.banded_cfg
            and self.mesh is None
            and jax.default_backend() == "tpu"
            and rw_mod.banded_fits(geom, self.exp_times, sq)
        )

    def _mesh_banded(self, geom, sq: int) -> bool:
        """Halo-exchange sharded path (rw_sharded): mesh mode with the
        band under the gate."""
        return (
            self.mesh is not None
            and self.banded_cfg
            and rw_mod.banded_sharded_fits(
                geom, self.exp_times, sq, self.mesh.shape.get("model", 1)
            )
        )

    def _mesh_diag(self, geom, sq: int) -> bool:
        """Column-sharded diagonal stencil (mesh analogue of the e=0
        production default). The stencil applies T itself, so it is only
        valid at sq == 0 — the guard lives here so no call site can
        forget it."""
        return (
            sq == 0
            and self.mesh is not None
            and self.banded_cfg
            and rw_mod.diag_selected()
            and rw_mod.diag_sharded_fits(
                geom, self.mesh.shape.get("model", 1)
            )
        )

    def _resolve(self, geom):
        """(square_times, banded) for this geometry. Banded engages at the
        banded-measured split (pick_square_times_banded — e=0 under the
        VMEM-resident windowed chain; the dense model's e=2 choice at
        18432 loses >60% to it, BASELINE.md round-3) whenever THAT
        split's band fits; checking fit at the dense pick first would
        miss geometries where only the smaller banded exponent stays
        under the matrix. Falls back to the dense cost model (with
        banded still possible at its pick when rw_square_times pins the
        exponent)."""
        if self.square_times_cfg < 0:
            sqb = rw_mod.pick_square_times_banded(self.exp_times)
            if self._use_banded(geom, sqb):
                return sqb, True
            if self._mesh_banded(geom, sqb) or self._mesh_diag(geom, sqb):
                # sharded path engages at the banded split: the
                # column-sharded diagonal stencil when it fits (e=0
                # default), else halo-exchange banded matmuls
                return sqb, False
        sq = self._square_times(geom)
        return sq, self._use_banded(geom, sq)

    def resolve_mode(self, cap_h: int, cap_w: int) -> str:
        """Name of the kernel family this geometry's programs will actually
        execute: ``diag`` (e=0 diagonal stencil, the production default) |
        ``banded`` (packed band-tile matmul chain) | ``mesh_diag``
        (column-sharded stencil) | ``mesh_banded`` (halo-exchange sharded
        band) | ``dense`` (full-matrix XLA, single-device or partitioner-
        sharded). Mirrors :meth:`_resolve` plus the internal dispatch of
        ``propagate``/``propagate_banded``; the fused and chunked programs
        resolve identically by construction (same ``sq``, same gates).
        Pinned by tests/test_walk_dispatch.py so a future kernel cannot
        silently reroute production."""
        geom = rw_mod.build_geometry(cap_h, cap_w, radius=self.radius)
        sq, banded = self._resolve(geom)
        if banded:
            # propagate_banded's own dispatch: the e=0 stencil needs no
            # band-fit gate (the diagonal operator IS the matrix)
            return ("diag" if sq == 0 and rw_mod.diag_selected()
                    else "banded")
        if self._mesh_diag(geom, sq):
            return "mesh_diag"
        if self._mesh_banded(geom, sq):
            return "mesh_banded"
        return "dense"

    def _core(self, cap_h: int, cap_w: int):
        """The traceable walk body at a (cap_h, cap_w) bucket:
        core(cam, edge, h4, w4, h0, w0, bg_thres) -> (labels, best).
        Shared by every :meth:`_program` variant and by callers that
        fuse the walk into a larger program (the make_ins_seg monolith).
        Cached: geometry construction is host work worth doing once."""
        key = ("core", cap_h, cap_w)
        with self._lock:
            if key in self._programs:
                return self._programs[key]
            geom = rw_mod.build_geometry(cap_h, cap_w, radius=self.radius)
            mesh = self.mesh
            sq, banded = self._resolve(geom)

            def core(cam: jax.Array, edge: jax.Array, h4, w4, h0, w0,
                     bg_thres):
                if banded:
                    rw = rw_mod.propagate_banded(
                        geom, cam, edge, beta=self.beta,
                        exp_times=self.exp_times,
                        matmul_dtype=self.mm_dtype, square_times=sq,
                    )
                else:
                    rw = rw_mod.propagate(
                        geom, cam, edge, beta=self.beta,
                        exp_times=self.exp_times,
                        matmul_dtype=self.mm_dtype, mesh=mesh,
                        square_times=sq, mesh_banded=self.banded_cfg,
                    )
                labels, rw_up, _ = rw_mod.upsample_and_decode(
                    rw, h4, w4, h0, w0, bg_thres
                )
                # best: the per-pixel winning score (= rw_up[argmax row]),
                # all any consumer needs for per-component scores — see
                # propagate_all
                return labels, jnp.max(rw_up, axis=0)

            self._programs[key] = core
            return core

    def _program(self, cap_h: int, cap_w: int, packed=False):
        # packed: False | True | "meta" (True + a metadata-row scalar)
        key = (cap_h, cap_w, "packed", packed) if packed else (cap_h, cap_w)
        core = self._core(cap_h, cap_w)
        with self._lock:
            if key in self._programs:
                return self._programs[key]

            if packed == "meta":
                # packed variant with a trailing metadata row: the extra
                # scalar argument (the CCL cluster count) rides the same
                # single fetch (see _walk_pack_meta)
                run = jax.jit(
                    lambda *a: _walk_pack_meta(*core(*a[:-1]), a[-1])
                )
            elif packed == "fusedmeta":
                # make_ins_seg device-CCL fast path: the (C x K) seed
                # rows multiply out INSIDE the walk program from the cam
                # upload and the resident cluster masks, and the edge
                # crop + row pad move inside too. The unfused flow paid
                # seed-build + row-pad + edge-slice dispatches per image
                # before the walk; relay transports price call COUNT,
                # not bytes (round-4 breakdown), so those hops dominate.
                # One jit serves every (c_pad, k_cap) pair -- retraces
                # key on shape, and both factors are power-of-two
                # buckets, so the compile family stays bounded.
                def run_fused(camp, masks, edge_full, h4, w4, h0, w0,
                              bg, meta):
                    seeds = camp[:, None] * masks[
                        None, :, :cap_h, :cap_w
                    ].astype(camp.dtype)
                    cam = seeds.reshape(-1, cap_h, cap_w)
                    pad = self._row_bucket(cam.shape[0]) - cam.shape[0]
                    if pad:
                        cam = jnp.pad(cam, ((0, pad), (0, 0), (0, 0)))
                    return _walk_pack_meta(
                        *core(cam, edge_full[:cap_h, :cap_w], h4, w4,
                              h0, w0, bg),
                        meta,
                    )

                run = jax.jit(run_fused)
            elif packed == "u8":
                # labels-only uint8 fetch (VERDICT r4 #3): make_sem_seg
                # consumes ONLY the label plane (step/make_sem_seg_labels
                # .py:44-51 keys-indexes the argmax) and label values are
                # bounded by the seed-row count, so the per-image fetch
                # shrinks from the [4ch, 4cw] int32 + f32 pair to one
                # uint8 plane — 1/8 the bytes on relay-style transports
                assert self.n_rows <= 255, self.n_rows
                run = jax.jit(lambda *a: core(*a)[0].astype(jnp.uint8))
            elif packed:
                # decode ends in the uint16 (labels, best-bitcast) pack
                # INSIDE the walk program: one dispatch + one fetch for
                # the whole per-image walk (make_ins_seg; through a
                # relay-style transport every program boundary costs
                # ~10-30 ms of dispatch/fetch overhead — the round-4
                # breakdown found call COUNT, not bytes, dominating)
                run = jax.jit(lambda *a: _walk_pack(*core(*a)))
            else:
                run = jax.jit(core)
            self._programs[key] = run
            return run

    def _chunk_programs(self, cap_h: int, cap_w: int):
        """Programs for the uncapped (chunked) seed path: T built once from
        the edge map, then fixed-size row chunks propagate/upsample with an
        incremental per-pixel (max value, argmax row) combine — memory and
        compile shapes stay bounded for any seed-row count."""
        key = ("chunk", cap_h, cap_w)
        with self._lock:
            if key in self._programs:
                return self._programs[key]
            geom = rw_mod.build_geometry(cap_h, cap_w, radius=self.radius)
            mesh = self.mesh
            sq, banded = self._resolve(geom)
            n_apply = 1 << (self.exp_times - sq)
            band = rw_mod.band_halfwidth(geom) << sq
            # e=0 + default impl: T stays in diagonal form (w, inv) — the
            # same f32-exact stencil the fused program uses, so chunked
            # labels remain bit-equal to fused ones (single-device and
            # mesh variants share the formulation)
            mesh_diag = (not banded) and self._mesh_diag(geom, sq)
            mesh_banded = (
                (not banded)
                and (not mesh_diag)
                and self._mesh_banded(geom, sq)
            )
            diag = banded and sq == 0 and rw_mod.diag_selected()

            @jax.jit
            def build_t(edge: jax.Array):
                if diag or mesh_diag:
                    return rw_mod.build_diag_operator(
                        geom, edge, beta=self.beta
                    )
                if banded:
                    t, _ = rw_mod.build_transition_banded(
                        geom, edge, beta=self.beta, square_times=sq,
                        matmul_dtype=self.mm_dtype,
                    )
                    return t
                if mesh_banded:
                    # halo-exchange sharded build; T stays row-sharded
                    # across every chunk (it is seed-independent)
                    return rw_mod.build_transition_mesh_banded(
                        geom, edge, self.beta, sq, mesh, self.mm_dtype
                    )
                return rw_mod.build_transition(
                    geom, edge, beta=self.beta, exp_times=sq,
                    matmul_dtype=self.mm_dtype, mesh=mesh,
                )

            @jax.jit
            def chunk(cam, edge, t, h4, w4, h0, w0, row0, best_val, best_row):
                if diag:
                    rw = rw_mod.apply_transition_diag(
                        geom, cam, edge, t, n_apply
                    )
                elif mesh_diag:
                    rw = rw_mod.apply_transition_mesh_diag(
                        geom, cam, edge, t, n_apply, mesh
                    )
                elif banded:
                    rw = rw_mod.apply_transition_banded(
                        geom, cam, edge, t, band, n_apply,
                        matmul_dtype=self.mm_dtype,
                    )
                elif mesh_banded:
                    rw = rw_mod.apply_transition_mesh_banded(
                        geom, cam, edge, t, n_apply, mesh, self.mm_dtype
                    )
                else:
                    rw = rw_mod.propagate_with_transition(
                        geom, cam, edge, t, matmul_dtype=self.mm_dtype,
                        n_apply=n_apply,
                    )
                rw_up = rw_mod.upsample_scores(rw, h4, w4, h0, w0)
                v = jnp.max(rw_up, axis=0)
                r = jnp.argmax(rw_up, axis=0).astype(jnp.int32) + row0
                # strict >: earlier chunks (lower rows) win ties, matching
                # the fused path's single argmax tie-breaking. (The fused
                # decode argmaxes scores AFTER the monotone /max_score
                # normalization; equal in exact arithmetic, so agreement
                # holds except at f32 rounding-induced near-ties.)
                take = v > best_val
                return (
                    jnp.where(take, v, best_val),
                    jnp.where(take, r, best_row),
                    jnp.max(rw_up),
                )

            def decode_core(best_val, best_row, gmax, bg_thres):
                # same division the fused decode performs (rw_up/max_score
                # then argmax vs the bg_thres plane), so marginal pixels
                # decode identically
                norm = best_val / jnp.maximum(gmax, 1e-12)
                labels = jnp.where(
                    norm > bg_thres, best_row + 1, 0
                ).astype(jnp.int32)
                return labels, norm

            decode = jax.jit(decode_core)
            # packed twins: decode + uint16 pack in ONE program (see
            # _program's packed variants)
            decode_packed = jax.jit(lambda *a: _walk_pack(*decode_core(*a)))
            decode_packed_meta = jax.jit(
                lambda *a: _walk_pack_meta(*decode_core(*a[:-1]), a[-1])
            )

            progs = (build_t, chunk, decode, decode_packed,
                     decode_packed_meta)
            self._programs[key] = progs
            return progs

    def propagate_all(self, cam_rows: np.ndarray, edge: jax.Array,
                      h4: int, w4: int, size: Tuple[int, int],
                      bg_thres: float, device=None, packed=False,
                      meta: jax.Array | None = None):
        """Uncapped variant of ``__call__``: any number of seed rows.

        K <= n_rows runs the fused single program; larger K builds T once
        and streams ceil(K / n_rows) seed chunks through it (T is
        seed-independent, misc/indexing.py:132-139, so the chunked labels
        equal the unchunked ones exactly). Returns (labels [4ch, 4cw]
        int32, best [4ch, 4cw] winning score / global max).

        ``meta``: device int32 scalar to ride the packed fetch's metadata
        row (packed becomes the "meta" layout, see _walk_pack_meta)."""
        if meta is not None:
            assert packed, "meta rides the packed fetch"
            packed = "meta"
        k = cam_rows.shape[0]
        if k <= self.n_rows:
            return self(cam_rows, edge, h4, w4, size, bg_thres,
                        device=device, packed=packed, meta=meta)

        ch = self._bucket(h4)
        cw = self._bucket(w4)
        (build_t, chunk, decode, decode_packed,
         decode_packed_meta) = self._chunk_programs(ch, cw)
        edge_b = jnp.asarray(edge)[:ch, :cw]
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            edge_b = jax.device_put(
                edge_b, NamedSharding(self.mesh, PartitionSpec())
            )
        elif device is not None:
            edge_b = jax.device_put(edge_b, device)
        t = build_t(edge_b)

        best_val = jnp.zeros((4 * ch, 4 * cw), jnp.float32)
        best_row = jnp.zeros((4 * ch, 4 * cw), jnp.int32)
        if device is not None and self.mesh is None:
            best_val = jax.device_put(best_val, device)
            best_row = jax.device_put(best_row, device)
        gmax = jnp.float32(0.0)
        on_device = isinstance(cam_rows, jax.Array)
        if on_device:
            assert self.mesh is None, "device seeds unsupported in mesh mode"
            assert cam_rows.shape[1:] == (ch, cw), (cam_rows.shape, ch, cw)
        for row0 in range(0, k, self.n_rows):
            if on_device:
                rows = cam_rows[row0 : row0 + self.n_rows]
                short = self.n_rows - rows.shape[0]
                cam_in = (
                    jnp.pad(rows, ((0, short), (0, 0), (0, 0)))
                    if short else rows
                )
            else:
                cam = np.zeros((self.n_rows, ch, cw), np.float32)
                rows = cam_rows[row0 : row0 + self.n_rows]
                cam[: rows.shape[0], :h4, :w4] = rows
                cam_in = jnp.asarray(cam)
                if device is not None and self.mesh is None:
                    cam_in = jax.device_put(cam_in, device)
            best_val, best_row, cmax = chunk(
                cam_in, edge_b, t, jnp.int32(h4), jnp.int32(w4),
                jnp.int32(size[0]), jnp.int32(size[1]), jnp.int32(row0),
                best_val, best_row,
            )
            gmax = jnp.maximum(gmax, cmax)
        if packed == "meta":
            return decode_packed_meta(
                best_val, best_row, gmax, jnp.float32(bg_thres), meta
            )
        return (decode_packed if packed else decode)(
            best_val, best_row, gmax, jnp.float32(bg_thres)
        )

    def _bucket(self, x: int) -> int:
        b = ((x + self.BUCKET - 1) // self.BUCKET) * self.BUCKET
        return min(b, self.cap)

    def __call__(self, cam_rows: np.ndarray, edge: jax.Array,
                 h4: int, w4: int, size: Tuple[int, int], bg_thres: float,
                 device=None, packed=False, meta: jax.Array | None = None):
        """cam_rows: [K, h4, w4] seeds (K <= n_rows); edge [cap, cap] with
        1.0 beyond extent. Returns (labels [4ch, 4cw] in 0..K,
        best [4ch, 4cw] per-pixel winning upsampled score — the row a
        pixel's label names is its argmax, so this carries every
        per-component max) at the selected bucket size.

        ``device``: commit inputs to a specific device (round-robin
        fan-out); ignored in mesh (rw_mesh_model > 1) mode, where one
        image's inputs replicate over the whole model mesh."""
        if meta is not None and packed is True:
            packed = "meta"
        ch = self._bucket(h4)
        cw = self._bucket(w4)
        k = cam_rows.shape[0]
        assert k <= self.n_rows, (k, self.n_rows)
        assert h4 <= ch and w4 <= cw, (h4, w4, ch, cw)
        if isinstance(cam_rows, jax.Array):
            # device-built seeds (make_ins_seg: cams x instance masks
            # multiply out ON device, already at bucket dims — the dense
            # K*C rows never cross the transport). Mesh mode keeps the
            # host path (seeds would need explicit replication).
            assert self.mesh is None, "device seeds unsupported in mesh mode"
            assert cam_rows.shape[1:] == (ch, cw), (cam_rows.shape, ch, cw)
            cam_in = cam_rows
            edge_b = jnp.asarray(edge)[:ch, :cw]
            if device is not None:
                edge_b = jax.device_put(edge_b, device)
            cam_in = self._row_pad(k, ch, cw)(cam_in)
            args = (cam_in, edge_b, jnp.int32(h4), jnp.int32(w4),
                    jnp.int32(size[0]), jnp.int32(size[1]),
                    jnp.float32(bg_thres))
            if packed == "meta":
                args += (meta,)
            return self._program(ch, cw, packed)(*args)
        # upload only the true K seed rows (K = classes present, typically
        # 1-3): through the relay transport ~1 MB/image of zero padding
        # cost more than the walk's decode; the row pad to the row bucket
        # (ROW_BUCKET or n_rows) happens on device (a trivial per-K
        # program)
        cam = np.zeros((k, ch, cw), np.float32)
        cam[:, :h4, :w4] = cam_rows
        cam_in = jnp.asarray(cam)
        edge_b = jnp.asarray(edge)[:ch, :cw]
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(self.mesh, PartitionSpec())
            cam_in = jax.device_put(cam_in, rep)
            edge_b = jax.device_put(edge_b, rep)
        elif device is not None:
            cam_in = jax.device_put(cam_in, device)
        cam_in = self._row_pad(k, ch, cw)(cam_in)
        args = (cam_in, edge_b, jnp.int32(h4), jnp.int32(w4),
                jnp.int32(size[0]), jnp.int32(size[1]),
                jnp.float32(bg_thres))
        if packed == "meta":
            args += (meta,)
        return self._program(ch, cw, packed)(*args)

    def propagate_fused(self, camp: np.ndarray, masks: jax.Array,
                        edge: jax.Array, h4: int, w4: int,
                        size: Tuple[int, int], bg_thres: float,
                        meta: jax.Array, device=None):
        """Device-CCL instance walk, fully fused: ``camp`` [c_pad, ch, cw]
        f32 host cam rows (the only upload), ``masks`` [k_cap, cap, cap]
        uint8 device-resident cluster stack
        (EdgeDisplacementRunner.run_cluster output), ``edge`` [cap, cap]
        device-resident. Seed build (camp x masks), edge crop, row pad,
        walk, decode, and the uint16 meta pack all run as ONE program --
        after the forward, 1 dispatch + 1 fetch covers the whole image
        (the unfused flow's seed-build / row-pad / edge-slice hops are
        gone). Labels index rows c * k_cap + k like _seed_build_cropped's.
        Single-device only; rows = c_pad * k_cap must fit n_rows (callers
        fall back to propagate_all past that)."""
        assert self.mesh is None, "fused seeds unsupported in mesh mode"
        ch, cw = self._bucket(h4), self._bucket(w4)
        rows = camp.shape[0] * masks.shape[0]
        assert rows <= self.n_rows, (rows, self.n_rows)
        assert camp.shape[1:] == (ch, cw), (camp.shape, ch, cw)
        cam_in = jnp.asarray(camp)
        if device is not None:
            cam_in = jax.device_put(cam_in, device)
        return self._program(ch, cw, "fusedmeta")(
            cam_in, masks, edge, jnp.int32(h4), jnp.int32(w4),
            jnp.int32(size[0]), jnp.int32(size[1]),
            jnp.float32(bg_thres), meta,
        )

    def propagate_monolith(self, runner, img_u8: np.ndarray,
                           camp: np.ndarray, size: Tuple[int, int],
                           bg_thres: float, device=None,
                           split: bool | None = None):
        """The whole make_ins_seg image as ONE device program: forward +
        advection + basin CCL + seed build + walk + decode + (``split``,
        the default when ins_comp_cap > 0) component split + score
        reduction + the packed fetch. The ONLY per-image transport is
        the dispatch (uint8 image + [c_pad, ch, cw] f32 cam rows riding
        it) and the packed fetch — 1 dispatch + 1 fetch, vs run_cluster
        + fused walk's 2 + 1 (call count prices relay transports,
        round-4 breakdown). With ``split`` the fetch is the ~6x-smaller
        :func:`_split_pack` uint8 plane and the host decode tail
        disappears (``_finish_monosplit`` slices tables); split=False
        keeps the (labels, best) :func:`_walk_pack_meta` fetch for the
        host tail.

        ``runner``: the EdgeDisplacementRunner whose traceable forward
        body (``edge_dp_core``) and cluster cap the program inlines. One
        compile per (ch, cw, c_pad) — each repeats the forward, so the
        batch (edge_infer_batch > 1) path keeps the split programs whose
        forward compiles once. Single-device only; rows = c_pad * k_cap
        must fit n_rows (callers fall back past that)."""
        blob = monolith_pack(runner, img_u8, camp)
        blob_in = jnp.asarray(blob)
        if device is not None:
            blob_in = jax.device_put(blob_in, device)
        h, w, _ = img_u8.shape
        return self.propagate_monolith_packed(
            runner, blob_in, h, w, size, bg_thres, split=split
        )

    def propagate_monolith_packed(self, runner, blob_in: jax.Array,
                                  h: int, w: int, size: Tuple[int, int],
                                  bg_thres: float,
                                  split: bool | None = None):
        """:meth:`propagate_monolith` on an already-staged blob (see
        :func:`monolith_pack`): ONE dispatch + ONE fetch, nothing else —
        callers that pre-stage blobs (bench.py per the repo's
        pre-uploaded-inputs tunnel methodology) or batch-upload them skip
        the per-image transfer call entirely."""
        assert self.mesh is None, "monolith unsupported in mesh mode"
        if split is None:
            split = self.comp_cap > 0
        # component ids ride a uint8 plane (_split_pack)
        assert self.comp_cap <= 255, self.comp_cap
        cap_px = runner.cap * 4
        h4 = (size[0] - 1) // 4 + 1
        w4 = (size[1] - 1) // 4 + 1
        ch, cw = self._bucket(h4), self._bucket(w4)
        k_cap = runner.cluster_cap
        n_cam = blob_in.shape[0] - cap_px * cap_px * 3
        rows = (n_cam // (ch * cw * 4)) * k_cap
        assert rows <= self.n_rows, (rows, self.n_rows)

        key = ("monosplit" if split else "mono", ch, cw, k_cap, id(runner))
        with self._lock:
            prog = self._programs.get(key)
        if prog is None:
            prog = jax.jit(self._monolith_body(runner, ch, cw, split))
            with self._lock:
                self._programs[key] = prog

        return prog(
            blob_in, jnp.int32(h), jnp.int32(w), jnp.int32(h4),
            jnp.int32(w4), jnp.int32(size[0]), jnp.int32(size[1]),
            jnp.float32(bg_thres),
        )

    def _monolith_body(self, runner, ch: int, cw: int, split: bool):
        """The make_ins_seg monolith's traceable per-image body:
        body(blob, h_px, w_px, h4, w4, h0, w0, bg) -> packed fetch.
        :meth:`propagate_monolith_packed` jits one instance;
        :meth:`propagate_monolith_pair_packed` traces it twice into one
        program (call count prices relay transports)."""
        core = self._core(ch, cw)
        fwd = runner.edge_dp_core
        cap_px = runner.cap * 4
        k_cap = runner.cluster_cap
        n_img = cap_px * cap_px * 3

        def run_all(blob, h_px, w_px, h4_, w4_, h0, w0, bg):
            # the image and the f32 cam rows ride ONE uint8 upload
            # (each device_put through a relay transport is its own
            # round trip); the cam bytes bitcast back here. u8[..., 4]
            # -> f32 follows the platform byte order — little-endian
            # on both TPU and the numpy host that packed them
            # (parity-pinned in tests/test_fanout.py).
            img = blob[:n_img].reshape(cap_px, cap_px, 3)
            cam_rows_in = jax.lax.bitcast_convert_type(
                blob[n_img:].reshape(-1, ch, cw, 4), jnp.float32
            )
            edge, dp = fwd(img, h_px, w_px, h4_, w4_)
            masks, n_found = _cluster_pack_core(dp, h4_, w4_, k_cap)
            seeds = cam_rows_in[:, None] * masks[
                None, :, :ch, :cw
            ].astype(cam_rows_in.dtype)
            cam = seeds.reshape(-1, ch, cw)
            pad = self._row_bucket(cam.shape[0]) - cam.shape[0]
            if pad:
                cam = jnp.pad(cam, ((0, pad), (0, 0), (0, 0)))
            labels, best = core(
                cam, edge[:ch, :cw], h4_, w4_, h0, w0, bg
            )
            if split:
                # device component split + per-component score
                # reduction (ops/ccl_tpu.component_tables): what the
                # host did per image with split_components +
                # np.maximum.at (the reference's skimage.measure
                # .label loop, make_ins_seg_labels.py:92-99) runs
                # INSIDE the walk program, and the fetch shrinks to
                # a uint8 id plane + tiny tables (_split_pack)
                cmap, crows, csizes, cscores, n_comp = (
                    ccl_tpu.component_tables(
                        labels, best, self.comp_cap
                    )
                )
                return _split_pack(
                    cmap, crows, csizes, cscores, n_comp, n_found
                )
            return _walk_pack_meta(labels, best, n_found)

        return run_all

    def propagate_monolith_pair_packed(self, runner, blob2: jax.Array,
                                       hw_a: Tuple[int, int],
                                       hw_b: Tuple[int, int],
                                       bg_thres: float,
                                       split: bool | None = None):
        """TWO same-bucket images through ONE device program: the
        :meth:`propagate_monolith_packed` body traced twice over a
        stacked [2, L] blob, both packed results riding one stacked
        fetch — 1 dispatch + 1 fetch per PAIR, halving the per-image
        relay call count (call COUNT dominates bytes on relay-style
        transports, round-4 breakdown; device time is unchanged — the
        two bodies run back to back). True sizes are traced scalars, so
        the pair only needs matching (bucket, cam-row count) — the
        compile family stays the monolith's. Returns [2, ...] packed;
        callers unpack each row exactly as the single fetch."""
        assert self.mesh is None, "monolith unsupported in mesh mode"
        if split is None:
            split = self.comp_cap > 0
        assert self.comp_cap <= 255, self.comp_cap
        cap_px = runner.cap * 4
        scalars = []
        buckets = []
        for h0, w0 in (hw_a, hw_b):
            h4 = (h0 - 1) // 4 + 1
            w4 = (w0 - 1) // 4 + 1
            buckets.append((self._bucket(h4), self._bucket(w4)))
            scalars.append(tuple(jnp.int32(s) for s in (
                h0, w0, h4, w4, h0, w0
            )))
        assert buckets[0] == buckets[1], buckets  # same program shape
        ch, cw = buckets[0]
        n_cam = blob2.shape[1] - cap_px * cap_px * 3
        rows = (n_cam // (ch * cw * 4)) * runner.cluster_cap
        assert rows <= self.n_rows, (rows, self.n_rows)

        key = ("monopairsplit" if split else "monopair",
               ch, cw, runner.cluster_cap, id(runner))
        with self._lock:
            prog = self._programs.get(key)
        if prog is None:
            body = self._monolith_body(runner, ch, cw, split)

            def run_pair(b2, *s):
                return jnp.stack(
                    [body(b2[0], *s[:6], s[12]),
                     body(b2[1], *s[6:12], s[12])]
                )

            prog = jax.jit(run_pair)
            with self._lock:
                self._programs[key] = prog

        return prog(
            blob2, *scalars[0], *scalars[1], jnp.float32(bg_thres)
        )

    def propagate_sem_monolith_packed(self, runner, blob_in: jax.Array,
                                      h: int, w: int,
                                      size: Tuple[int, int],
                                      bg_thres: float) -> jax.Array:
        """The whole make_sem_seg image as ONE device program: forward +
        walk + decode + uint8 label pack, fed by a :func:`monolith_pack`
        blob (padded uint8 image + the K f32 class-cam rows bitcast
        through it) — 1 dispatch + 1 u8-plane fetch per image, vs the
        split flow's forward dispatch + cam upload + walk dispatch +
        fetch (call count prices relay transports, round-4 breakdown).
        The instance stage's monolith (propagate_monolith_packed), minus
        advection/CCL/scoring: make_sem_seg consumes only the label
        plane (step/make_sem_seg_labels.py:44-51). One compile per
        (geometry bucket, pow2 cam-row count); batch callers
        (edge_infer_batch > 1) keep the split programs whose forward
        compiles once."""
        assert self.mesh is None, "monolith unsupported in mesh mode"
        assert self.n_rows <= 255, self.n_rows
        cap_px = runner.cap * 4
        h4 = (size[0] - 1) // 4 + 1
        w4 = (size[1] - 1) // 4 + 1
        ch, cw = self._bucket(h4), self._bucket(w4)

        key = ("monosem", ch, cw, id(runner))
        with self._lock:
            prog = self._programs.get(key)
        if prog is None:
            core = self._core(ch, cw)
            fwd = runner.edge_dp_core
            n_img = cap_px * cap_px * 3

            def run_all(blob, h_px, w_px, h4_, w4_, h0, w0, bg):
                img = blob[:n_img].reshape(cap_px, cap_px, 3)
                cam = jax.lax.bitcast_convert_type(
                    blob[n_img:].reshape(-1, ch, cw, 4), jnp.float32
                )
                edge, _ = fwd(img, h_px, w_px, h4_, w4_)
                pad = self._row_bucket(cam.shape[0]) - cam.shape[0]
                if pad:
                    cam = jnp.pad(cam, ((0, pad), (0, 0), (0, 0)))
                labels, _ = core(
                    cam, edge[:ch, :cw], h4_, w4_, h0, w0, bg
                )
                return labels.astype(jnp.uint8)

            prog = jax.jit(run_all)
            with self._lock:
                self._programs[key] = prog

        return prog(
            blob_in, jnp.int32(h), jnp.int32(w), jnp.int32(h4),
            jnp.int32(w4), jnp.int32(size[0]), jnp.int32(size[1]),
            jnp.float32(bg_thres),
        )

    def _row_bucket(self, k: int) -> int:
        """Smallest power-of-two bucket (from ROW_BUCKET, capped at
        n_rows) covering k seed rows. The stencil chain is linear in rows
        (ROW_BUCKET docstring), so padding k to the next power of two
        instead of straight to n_rows matters most for make_ins_seg,
        whose (instances x classes) row counts land anywhere in
        [1, n_rows=128]: a 20-row image walks a 32-row program (~2x the
        8-row chain), not a 128-row one (~10x). Bounds the per-geometry
        compile count at log2(n_rows / ROW_BUCKET) + 2 shapes."""
        b = self.ROW_BUCKET
        while b < min(k, self.n_rows):
            b *= 2
        return min(b, self.n_rows)

    def _row_pad(self, k: int, ch: int, cw: int):
        key = ("row_pad", k, ch, cw)
        with self._lock:
            prog = self._programs.get(key)
            if prog is None:
                pad = self._row_bucket(k) - k
                prog = jax.jit(
                    lambda c: jnp.pad(c, ((0, pad), (0, 0), (0, 0)))
                )
                self._programs[key] = prog
            return prog


def _load_irn(cfg: Config):
    variables = ckpt.load_checkpoint(cfg.irn_weights_name)
    return EdgeDisplacementRunner(cfg, variables)


def _raw_infer_dataset(cfg: Config):
    """Raw uint8 images + sizes (normalization and flip happen on device)."""
    return voc12.ImageDataset(cfg.infer_list, cfg.voc12_root, img_normal=False)


def _pending_indices(ds, out_dir: str, ext: str, overwrite: bool):
    """Host-shard indices whose output artifact doesn't exist yet
    (idempotent-stage skip, checked by name without decoding images)."""
    return [
        i
        for i in common.host_shard_range(len(ds))
        if overwrite
        or not os.path.exists(
            os.path.join(out_dir, ds.img_name_list[i] + ext)
        )
    ]


def make_sem_seg_labels(cfg: Config) -> None:
    """Random-walk pseudo semantic masks (step/make_sem_seg_labels.py),
    batched, software-pipelined AND device-fanned-out: EdgeDisplacement
    runs edge_infer_batch images per forward (all images share the padded
    crop buffer), blocks commit to local devices round-robin (the
    reference's per-GPU spawn, make_sem_seg_labels.py:67-70, inside one
    process), and the blocking label fetch trails the dispatch front —
    every chip computes while the host reads/writes."""
    from collections import deque

    runner = _load_irn(cfg)
    walker = RandomWalkRunner(cfg, n_seed_rows=20)
    # one image occupies the whole mesh in rw_mesh_model mode
    spread = common.DeviceSpreader(
        1 if cfg.rw_mesh_model > 1 else cfg.infer_devices
    )
    ds = _raw_infer_dataset(cfg)
    os.makedirs(cfg.sem_seg_out_dir, exist_ok=True)

    n = len(ds)
    pending = deque()  # (i, out_path, size, keys, labels_device)

    def finish(item):
        i, out_path, size, keys, labels = item
        pred = np.asarray(labels)[: size[0], : size[1]]
        imageio.imwrite(out_path, keys[pred].astype(np.uint8))
        if i % max(n // 20, 1) == 0:
            print(f"make_sem_seg {i}/{n}", flush=True)

    def _load_sem_cam(name):
        cam_dict = np.load(
            os.path.join(cfg.cam_out_dir, name + ".npy"),
            allow_pickle=True,
        ).item()
        cams = np.asarray(cam_dict["cam"], np.float32)  # [K, h4, w4]
        keys = np.pad(
            np.asarray(cam_dict["keys"]) + 1, (1, 0), mode="constant"
        )
        return cams, keys

    todo = _pending_indices(ds, cfg.sem_seg_out_dir, ".png", cfg.overwrite)
    bsz = runner.batch_size
    if cfg.sem_monolith and bsz == 1 and walker.mesh is None:
        # per-image blocks: the whole image as ONE program (forward +
        # walk + decode + u8 pack, walker.propagate_sem_monolith_packed)
        # fed by one packed blob — 2 transport calls per image instead
        # of the split flow's 5. Opt-in: right for relay-attached hosts
        # where calls cost ~10-30 ms each; the joint conv+stencil
        # schedule costs ~5 ms/img device time vs the split programs
        # (see Config.sem_monolith), so co-located hosts keep the split
        for c, i in enumerate(todo):
            dev = spread(c)
            sample = ds[i]
            img_u8 = sample["img"].astype(np.uint8)
            size = img_u8.shape[:2]
            h4 = (size[0] - 1) // 4 + 1
            w4 = (size[1] - 1) // 4 + 1
            cams, keys = _load_sem_cam(sample["name"])
            ch, cw = walker._bucket(h4), walker._bucket(w4)
            camp = np.zeros((_pow2_ge(cams.shape[0]), ch, cw), np.float32)
            camp[: cams.shape[0], :h4, :w4] = cams
            blob = jnp.asarray(monolith_pack(runner, img_u8, camp))
            if dev is not None:
                blob = jax.device_put(blob, dev)
            labels = walker.propagate_sem_monolith_packed(
                runner, blob, size[0], size[1], size, cfg.sem_seg_bg_thres
            )
            out_path = os.path.join(
                cfg.sem_seg_out_dir, sample["name"] + ".png"
            )
            pending.append((i, out_path, size, keys, labels))
            while len(pending) > len(spread):
                finish(pending.popleft())
        while pending:
            finish(pending.popleft())
        return
    for c, c0 in enumerate(range(0, len(todo), bsz)):
        block = todo[c0 : c0 + bsz]
        dev = spread(c)
        samples = [ds[i] for i in block]
        imgs = [s["img"].astype(np.uint8) for s in samples]
        sizes = [im.shape[:2] for im in imgs]
        fw = runner.batch(imgs, sizes, device=dev)

        for i, sample, size, (edge, _, (h4, w4)) in zip(
            block, samples, sizes, fw
        ):
            name = sample["name"]
            out_path = os.path.join(cfg.sem_seg_out_dir, name + ".png")
            cams, keys = _load_sem_cam(name)

            labels = walker(
                cams, edge, h4, w4, size, cfg.sem_seg_bg_thres, device=dev,
                packed="u8",  # labels fit uint8 (<= 20 seed rows): the
                # fetch drops from int32+f32 planes to one u8 plane
            )
            pending.append((i, out_path, size, keys, labels))
            while len(pending) > len(spread):
                finish(pending.popleft())
    while pending:
        finish(pending.popleft())


def _advect_pack_core(dp: jax.Array, h4: jax.Array, w4: jax.Array,
                      thres: float = 2.5) -> jax.Array:
    """Advection + pack tail shared by the fused forward program
    (EdgeDisplacementRunner.run_advect) and the standalone
    :func:`_advect_pack_program` — ONE place owns the ``|dp| < thres``
    basin predicate (ADVICE r4: the host cluster_centroids exposes thres
    while two duplicated device bodies hardcoded it). uint8 (cy, cx,
    basin) layout when grid coordinates fit uint8; f32 (cy, cx, dy, dx)
    beyond 255-cell grids — callers distinguish by dtype."""
    cent = cent_mod.find_centroids_bounded(dp, h4, w4, iterations=300)
    if max(dp.shape[1], dp.shape[2]) <= 255:
        basin = jnp.sqrt(dp[0] ** 2 + dp[1] ** 2) < jnp.float32(thres)
        return jnp.concatenate(
            [cent.astype(jnp.uint8), basin[None].astype(jnp.uint8)], axis=0
        )
    return jnp.concatenate([cent.astype(jnp.float32), dp], axis=0)


def _advect_pack_program(thres: float = 2.5):
    """One-fetch advection: centroids + the basin mask, packed uint8.

    The host clustering (cluster_centroids_from_basin) needs only the
    rounded converged coordinates and the ``|dp| < 2.5`` basin predicate —
    not the displacement field itself — and grid coordinates fit uint8 at
    every bucket <= 255 cells, so the fetch is [3, H, W] uint8 (49 KB at
    the 128^2 cap) instead of the round-3 [4, H, W] f32 (262 KB; through
    the serial ~44 MB/s relay the bytes ARE the stage's critical path).
    Grids beyond 255 cells (rw_grid_cap > 255 with a matching mesh walk)
    keep the f32 layout — callers distinguish by dtype. The basin
    predicate uses the same f32 sqrt the host computed (IEEE
    correctly-rounded on both sides), so the mask is bit-equal."""

    return jax.jit(functools.partial(_advect_pack_core, thres=thres))


def _cluster_pack_core(dp: jax.Array, h4: jax.Array, w4: jax.Array,
                       k_cap: int, thres: float = 2.5):
    """Advection + device clustering tail (the CCL path's analogue of
    :func:`_advect_pack_core`): converge centroids, evaluate the basin
    predicate, and group pixels by landing component entirely on device
    (ops/ccl_tpu). Returns (masks [k_cap, cap, cap] uint8 — the one-hot
    instance stack cluster_centroids_from_basin would build on host,
    zero beyond the true extent — and n_found int32, where a value of
    k_cap + 1 flags overflow). Nothing crosses device->host: the masks
    feed :func:`_seed_build_cropped` and n_found rides the walk pack's
    meta row."""
    cent = cent_mod.find_centroids_bounded(dp, h4, w4, iterations=300)
    basin = jnp.sqrt(dp[0] ** 2 + dp[1] ** 2) < jnp.float32(thres)
    masks, n_found = ccl_tpu.cluster_from_basin(basin, cent, h4, w4, k_cap)
    return masks.astype(jnp.uint8), n_found


def _cluster_pack_program(k_cap: int, thres: float = 2.5):
    """Standalone jit of :func:`_cluster_pack_core` for the batched
    forward path (dp comes out of EdgeDisplacementRunner.batch)."""
    return jax.jit(
        functools.partial(_cluster_pack_core, k_cap=k_cap, thres=thres)
    )


@jax.jit
def _walk_pack(labels: jax.Array, best: jax.Array) -> jax.Array:
    """[3, 4ch, 4cw] uint16 stack of (labels, best) — one fetch, lossless.

    Row ids fit uint16 (seed rows are bounded well under 2^16); the f32
    winning-score plane travels bitcast as two uint16 planes. 1.18 MB at
    the 512^2 bucket vs 1.57 MB for the round-3 f32 pair — the relay pays
    per byte. :func:`_walk_unpack_np` restores (labels i32, best f32)."""
    b16 = jax.lax.bitcast_convert_type(best, jnp.uint16)  # [H, W, 2]
    return jnp.concatenate(
        [labels.astype(jnp.uint16)[None], jnp.moveaxis(b16, -1, 0)], axis=0
    )


def _walk_unpack_np(wpack: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Host inverse of :func:`_walk_pack`: (labels int32, best f32)."""
    labels = wpack[0].astype(np.int32)
    best = (
        np.ascontiguousarray(np.stack([wpack[1], wpack[2]], axis=-1))
        .view(np.float32)[..., 0]
    )
    return labels, best


def _walk_pack_meta(labels: jax.Array, best: jax.Array,
                    meta: jax.Array) -> jax.Array:
    """:func:`_walk_pack` plus one metadata row appended below the image:
    [3, 4ch + 1, 4cw] uint16 with ``meta`` at [0, -1, 0]. The device-CCL
    instance flow rides its cluster count through the ONE walk fetch this
    way — a separate scalar fetch would cost a full relay round trip
    (round-4 breakdown: call count dominates bytes)."""
    base = _walk_pack(labels, best)
    tail = jnp.zeros((3, 1, base.shape[2]), jnp.uint16)
    tail = tail.at[0, 0, 0].set(meta.astype(jnp.uint16))
    return jnp.concatenate([base, tail], axis=1)


def _walk_unpack_meta_np(
    wpack: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Host inverse of :func:`_walk_pack_meta`:
    (labels int32, best f32, meta int)."""
    labels, best = _walk_unpack_np(wpack[:, :-1])
    return labels, best, int(wpack[0, -1, 0])


def _split_pack(comp_map: jax.Array, rows: jax.Array, sizes: jax.Array,
                scores: jax.Array, n_comp: jax.Array,
                meta: jax.Array) -> jax.Array:
    """[4ch + m, 4cw] uint8: the device component split's whole result in
    ONE fetch — component-id plane (ids <= comp_cap <= 255 fit uint8) with
    the per-component tables bitcast into m trailing byte rows:
    (n_comp i32, meta i32, rows i32[cap], sizes i32[cap], scores f32[cap]).
    ~6x fewer bytes than :func:`_walk_pack_meta`'s (labels, best-bitcast)
    uint16 stack AND the host loses its per-image component-split +
    score-reduction work — on a 1-core relay host both sat on the
    critical path. :func:`_split_unpack_np` inverts."""
    w = comp_map.shape[1]
    tbl = jnp.concatenate([
        jnp.stack([n_comp, meta]).astype(jnp.int32),
        rows.astype(jnp.int32),
        sizes.astype(jnp.int32),
        jax.lax.bitcast_convert_type(scores.astype(jnp.float32),
                                     jnp.int32),
    ])
    tbl_u8 = jax.lax.bitcast_convert_type(tbl, jnp.uint8).reshape(-1)
    m = -(-tbl_u8.shape[0] // w)
    tail = jnp.zeros((m * w,), jnp.uint8)
    tail = tail.at[: tbl_u8.shape[0]].set(tbl_u8).reshape(m, w)
    return jnp.concatenate([comp_map.astype(jnp.uint8), tail], axis=0)


def _split_unpack_np(pack: np.ndarray, comp_cap: int):
    """Host inverse of :func:`_split_pack`: (comp_map int32, rows int32
    [cap], sizes int64 [cap], scores f32 [cap], n_comp int, meta int)."""
    nbytes = 4 * (2 + 3 * comp_cap)
    w = pack.shape[1]
    m = -(-nbytes // w)
    comp_map = pack[:-m].astype(np.int32)
    tbl = np.ascontiguousarray(
        pack[-m:].reshape(-1)[:nbytes]
    ).view(np.int32)
    rows = tbl[2 : 2 + comp_cap]
    sizes = tbl[2 + comp_cap : 2 + 2 * comp_cap].astype(np.int64)
    scores = tbl[2 + 2 * comp_cap :].view(np.float32)
    return comp_map, rows, sizes, scores, int(tbl[0]), int(tbl[1])


def _pow2_ge(x: int) -> int:
    """Smallest power of two >= max(x, 1) — the seed-build shape bucket."""
    return 1 << (max(int(x), 1) - 1).bit_length()


def monolith_pack(runner, img_u8: np.ndarray, camp: np.ndarray) -> np.ndarray:
    """Host half of the monolith transport: the cap-padded uint8 image
    and the f32 cam rows as ONE flat uint8 buffer (the f32 bytes are
    bitcast back on device — little-endian on both sides)."""
    cap_px = runner.cap * 4
    h, w, _ = img_u8.shape
    assert h <= cap_px and w <= cap_px, (h, w, cap_px)
    padded = np.pad(img_u8, ((0, cap_px - h), (0, cap_px - w), (0, 0)))
    return np.concatenate([
        padded.reshape(-1),
        np.ascontiguousarray(camp, np.float32).view(np.uint8).reshape(-1),
    ])


@jax.jit
def _seed_build(cams: jax.Array, masks: jax.Array) -> jax.Array:
    """Device (instance x class) seed rows: cams [C, ch, cw] f32 times
    instance masks [K, ch, cw] uint8 -> [C*K, ch, cw] f32, the reference's
    class-major interleaving (cent_mod.mask_scores_by_instance /
    make_ins_seg_labels.py:135). Uploading C cam rows + K uint8 masks and
    multiplying on device replaces the round-3 dense K*C f32 seed upload
    (~590 KB -> ~250 KB at typical K, C through the byte-priced relay)."""
    seeds = cams[:, None] * masks[None].astype(cams.dtype)
    return seeds.reshape(-1, cams.shape[1], cams.shape[2])


@jax.jit
def _seed_build_cropped(cams: jax.Array, masks: jax.Array) -> jax.Array:
    """:func:`_seed_build` for the device-CCL flow: masks arrive at the
    runner's full [k_cap, cap, cap] grid (they never left the device) and
    crop to the walker's [ch, cw] bucket inside the same program — the
    crop costs nothing fused, and a standalone slice would be one more
    relay dispatch."""
    ch, cw = cams.shape[1], cams.shape[2]
    seeds = cams[:, None] * masks[None, :, :ch, :cw].astype(cams.dtype)
    return seeds.reshape(-1, ch, cw)


def make_ins_seg_labels(cfg: Config) -> None:
    """Instance pseudo masks (step/make_ins_seg_labels.py).

    Default (ins_device_ccl) flow: forward + advection + basin CCL run as
    ONE device program (EdgeDisplacementRunner.run_cluster, ops/ccl_tpu),
    seeds multiply out on device from one cam upload, and the whole walk
    is one dispatch whose packed fetch carries the cluster count — the
    reference's host ``skimage.measure.label`` hop
    (make_ins_seg_labels.py:66) and its fetch + re-upload round trip
    vanish. Images whose cluster count overflows ins_cluster_cap redo
    through the exact host-union-find path (ins_device_ccl=False flow).

    The device fan-out runs TWO worker threads per local device: blocks
    commit to devices round-robin (EdgeDisplacement batched per block)
    and one thread's host post-processing (walked-component scoring)
    overlaps the other's device programs on the same chip (the reference
    spawns one process per GPU and leaves its CPU hot loop serial with
    the GPU, make_ins_seg_labels.py:168-171)."""
    from concurrent.futures import ThreadPoolExecutor

    runner = _load_irn(cfg)
    walker = RandomWalkRunner(cfg, n_seed_rows=cfg.ins_seed_cap)
    spread = common.DeviceSpreader(
        1 if cfg.rw_mesh_model > 1 else cfg.infer_devices
    )
    ds = _raw_infer_dataset(cfg)
    os.makedirs(cfg.ins_seg_out_dir, exist_ok=True)

    n = len(ds)

    use_ccl = cfg.ins_device_ccl and walker.mesh is None
    k_cap = cfg.ins_cluster_cap
    comp_cap = walker.comp_cap

    def _load_cam(name: str):
        cam_dict = np.load(
            os.path.join(cfg.cam_out_dir, name + ".npy"), allow_pickle=True
        ).item()
        return (
            np.asarray(cam_dict["cam"], np.float32),
            np.asarray(cam_dict["keys"]),
        )

    def detect_and_save(i, sample, labels_full, best_np,
                        instance_class_id) -> None:
        # host decode tail: component split + per-component score
        # reduction on host (the exact path; the monolith split flow
        # runs the same math on device, _finish_monosplit)
        n_rows = instance_class_id.shape[0]
        comp_map, comp_rows, comp_sizes = cent_mod.split_components(
            labels_full, n_rows
        )
        k_comps = comp_rows.shape[0]
        scores_all = np.zeros(k_comps + 1, np.float32)
        np.maximum.at(scores_all, comp_map.reshape(-1), best_np.reshape(-1))
        _save_detected(i, sample, comp_map, comp_rows, comp_sizes,
                       scores_all, instance_class_id)

    def _save_detected(i, sample, comp_map, comp_rows, comp_sizes,
                       scores_all, instance_class_id) -> None:
        # the shared save tail: drop small fragments, save the detection
        # dict (make_ins_seg_labels.py reference semantics — see
        # test_component_scores.py)
        name = sample["name"]
        out_path = os.path.join(cfg.ins_seg_out_dir, name + ".npy")
        size = sample["img"].shape[:2]
        k_comps = comp_rows.shape[0]
        max_fragment = size[0] * size[1] * 0.01
        pred_score, pred_mask, pred_class = [], [], []
        for k in range(1, k_comps + 1):
            seg = comp_map[: size[0], : size[1]] == k
            score = 0.0 if comp_sizes[k - 1] < max_fragment else float(
                scores_all[k]
            )
            pred_score.append(score)
            pred_mask.append(seg)
            pred_class.append(int(instance_class_id[comp_rows[k - 1]]))
        if pred_mask:
            detected = {
                "score": np.asarray(pred_score, np.float32),
                "mask": np.stack(pred_mask, 0),
                "class": np.asarray(pred_class, np.int32),
            }
        else:
            detected = {
                "score": np.zeros((0,), np.float32),
                "mask": np.zeros((0, int(size[0]), int(size[1])), bool),
                "class": np.zeros((0,), np.int32),
            }
        detected["size"] = (int(size[0]), int(size[1]))
        np.save(out_path, detected)
        if i % max(n // 20, 1) == 0:
            print(f"make_ins_seg {i}/{n}", flush=True)

    def work_one(i, sample, edge, pack_dev, h4, w4, dev) -> None:
        img_u8 = sample["img"].astype(np.uint8)
        size = img_u8.shape[:2]
        cams, keys = _load_cam(sample["name"])

        pack = np.asarray(pack_dev)[:, :h4, :w4]
        cent = pack[:2].astype(np.int32)
        if pack.dtype == np.uint8:
            instance_map = cent_mod.cluster_centroids_from_basin(
                cent, pack[2]
            )
        else:  # legacy f32 pack (grids beyond uint8 coordinates)
            instance_map = cent_mod.cluster_centroids(cent, pack[2:])
        num_instances = instance_map.shape[0]

        # no seed cap: propagate_all streams any (instances x classes) row
        # count through a fixed-shape chunk program (T is seed-independent)
        if walker.mesh is None:
            # build the dense K*C seed rows ON device from C cam rows +
            # K uint8 masks (_seed_build) — the transport never carries
            # the product. (C, K) bucket to powers of two with zero rows
            # (ADVICE r4: unbucketed, every distinct (classes, instances)
            # pair compiles + relay-warms a new executable, seconds each;
            # zero cam/mask rows produce zero seed rows, which cannot win
            # the decode — bench.py's fixed mask cap, generalized)
            ch, cw = walker._bucket(h4), walker._bucket(w4)
            c_pad = _pow2_ge(cams.shape[0])
            k_pad = _pow2_ge(num_instances)
            camp = np.zeros((c_pad, ch, cw), np.float32)
            camp[: cams.shape[0], :h4, :w4] = cams
            maskp = np.zeros((k_pad, ch, cw), np.uint8)
            maskp[:num_instances, :h4, :w4] = instance_map
            cam_dev = jnp.asarray(camp)
            mask_dev = jnp.asarray(maskp)
            if dev is not None:
                cam_dev = jax.device_put(cam_dev, dev)
                mask_dev = jax.device_put(mask_dev, dev)
            seeds = _seed_build(cam_dev, mask_dev)
            # rows interleave class-major with the PADDED K: row ids are
            # c * k_pad + k, so the class lookup repeats over k_pad (the
            # padded rows never appear in comp_rows — zero seeds lose)
            keys_pad = np.zeros(c_pad, keys.dtype)
            keys_pad[: keys.shape[0]] = keys
            instance_class_id = np.repeat(keys_pad, k_pad)
        else:
            seeds = cent_mod.mask_scores_by_instance(cams, instance_map)
            instance_class_id = np.repeat(keys, num_instances)
        # Only the label map + the [4ch, 4cw] winning-score map cross
        # device->host (one lossless uint16 fetch, vs the [n_rows, 4ch,
        # 4cw] score volume — and the pack rides INSIDE the walk program,
        # packed=True, so the whole walk is one dispatch + one fetch). At
        # any pixel a component owns, its row IS the per-pixel argmax, so
        # the winning-score map carries every per-component max.
        wpack = np.asarray(walker.propagate_all(
            seeds, edge, h4, w4, size, cfg.ins_seg_bg_thres, device=dev,
            packed=True,
        ))
        labels_full, best_np = _walk_unpack_np(wpack)  # 0 beyond extent
        detect_and_save(i, sample, labels_full, best_np, instance_class_id)

    def _camp_pad(cams, h4, w4):
        # cam rows at the walk bucket, class count padded to a power of
        # two (ADVICE r4 bucketing — padded rows are zero seeds and
        # cannot win the decode)
        ch, cw = walker._bucket(h4), walker._bucket(w4)
        c_pad = _pow2_ge(cams.shape[0])
        camp = np.zeros((c_pad, ch, cw), np.float32)
        camp[: cams.shape[0], :h4, :w4] = cams
        return camp, c_pad

    def _finish_ccl(i, sample, wpack, keys, c_pad, dev) -> bool:
        # shared decode tail of both device-CCL flows; returns False on
        # cluster overflow (> k_cap distinct basins receiving a
        # centroid: the device mask stack is incomplete, so the caller
        # redoes the image through the exact host path — rare on VOC,
        # the cap covers 1-7 instances + the escape bucket, and
        # exactness beats the one wasted walk)
        labels_full, best_np, n_found = _walk_unpack_meta_np(wpack)
        if n_found > k_cap:
            return False
        # row ids are c * k_cap + k over the PADDED class count; padded
        # cam rows and empty mask ranks produce zero seeds, which cannot
        # win the decode and so never appear in comp_rows
        keys_pad = np.zeros(c_pad, keys.dtype)
        keys_pad[: keys.shape[0]] = keys
        detect_and_save(
            i, sample, labels_full, best_np, np.repeat(keys_pad, k_cap)
        )
        return True

    def _finish_monosplit(i, sample, pack_np, keys, c_pad) -> bool:
        # decode tail of the monolith SPLIT flow: components + scores
        # were already computed on device (_split_pack carries the id
        # plane + tables); overflow of either cap (cluster masks or
        # components) falls back to the exact host path, same contract
        # as _finish_ccl
        comp_map, rows, sizes, scores, n_comp, n_found = _split_unpack_np(
            pack_np, comp_cap
        )
        if n_found > k_cap or n_comp > comp_cap:
            return False
        keys_pad = np.zeros(c_pad, keys.dtype)
        keys_pad[: keys.shape[0]] = keys
        scores_all = np.concatenate(
            [np.zeros(1, np.float32), scores[:n_comp]]
        )
        _save_detected(i, sample, comp_map, rows[:n_comp],
                       sizes[:n_comp], scores_all,
                       np.repeat(keys_pad, k_cap))
        return True

    def _host_redo(i, sample, img_u8, size, dev) -> None:
        edge2, pack_dev, (h4b, w4b) = runner.with_advect(
            img_u8, size, device=dev
        )
        work_one(i, sample, edge2, pack_dev, h4b, w4b, dev)

    def work_one_ccl(i, sample, edge, masks_dev, n_found_dev, h4, w4,
                     dev) -> None:
        # device-CCL split flow (VERDICT r4 #2), used when the forward
        # batches: the basin partition never visits the host — masks_dev
        # [k_cap, cap, cap] uint8 and the cluster count came out of the
        # SAME program as the forward, seeds multiply out INSIDE the
        # walk program from one cam upload (walker.propagate_fused), and
        # the count rides the walk fetch's metadata row.
        img_u8 = sample["img"].astype(np.uint8)
        size = img_u8.shape[:2]
        cams, keys = _load_cam(sample["name"])
        camp, c_pad = _camp_pad(cams, h4, w4)
        if c_pad * k_cap <= walker.n_rows:
            wpack = np.asarray(walker.propagate_fused(
                camp, masks_dev, edge, h4, w4, size,
                cfg.ins_seg_bg_thres, meta=n_found_dev, device=dev,
            ))
        else:
            # oversized (C x K) row product: build seeds standalone and
            # let propagate_all chunk them through the fixed-row program
            cam_dev = jnp.asarray(camp)
            if dev is not None:
                cam_dev = jax.device_put(cam_dev, dev)
            seeds = _seed_build_cropped(cam_dev, masks_dev)
            wpack = np.asarray(walker.propagate_all(
                seeds, edge, h4, w4, size, cfg.ins_seg_bg_thres,
                device=dev, packed=True, meta=n_found_dev,
            ))
        if not _finish_ccl(i, sample, wpack, keys, c_pad, dev):
            _host_redo(i, sample, img_u8, size, dev)

    def work_one_mono(i, sample, img_u8, size, dev) -> None:
        # device-CCL monolith flow (per-image blocks): forward +
        # advection + CCL + seed build + walk + decode + pack as ONE
        # program — 1 dispatch + 1 fetch per image
        # (walker.propagate_monolith)
        cams, keys = _load_cam(sample["name"])
        h4 = (size[0] - 1) // 4 + 1
        w4 = (size[1] - 1) // 4 + 1
        camp, c_pad = _camp_pad(cams, h4, w4)
        if c_pad * k_cap > walker.n_rows:
            # oversized row product: the split flow chunks the walk
            edge, masks_dev, n_found_dev, (h4, w4) = runner.with_cluster(
                img_u8, size, device=dev
            )
            work_one_ccl(
                i, sample, edge, masks_dev, n_found_dev, h4, w4, dev
            )
            return
        wpack = np.asarray(walker.propagate_monolith(
            runner, img_u8, camp, size, cfg.ins_seg_bg_thres, device=dev,
        ))
        ok = (
            _finish_monosplit(i, sample, wpack, keys, c_pad)
            if comp_cap > 0
            else _finish_ccl(i, sample, wpack, keys, c_pad, dev)
        )
        if not ok:
            _host_redo(i, sample, img_u8, size, dev)

    advect_pack = _advect_pack_program()
    cluster_pack = _cluster_pack_program(k_cap) if use_ccl else None
    todo = _pending_indices(ds, cfg.ins_seg_out_dir, ".npy", cfg.overwrite)
    bsz = runner.batch_size
    blocks = [todo[c0 : c0 + bsz] for c0 in range(0, len(todo), bsz)]

    def work(args) -> None:
        c, block = args
        dev = spread(c // 2)  # two consecutive blocks share one device
        samples = [ds[i] for i in block]
        imgs = [s["img"].astype(np.uint8) for s in samples]
        sizes = [im.shape[:2] for im in imgs]
        if use_ccl:
            if runner.batch_size == 1 or len(imgs) == 1:
                # the whole image in ONE program (monolith flow)
                for i, sample, im, sz in zip(block, samples, imgs, sizes):
                    work_one_mono(i, sample, im, sz, dev)
            else:
                fw = runner.batch(imgs, sizes, device=dev)
                for i, sample, (edge, dp, (h4, w4)) in zip(
                    block, samples, fw
                ):
                    masks_dev, n_found_dev = cluster_pack(
                        dp, jnp.int32(h4), jnp.int32(w4)
                    )
                    work_one_ccl(
                        i, sample, edge, masks_dev, n_found_dev, h4, w4,
                        dev,
                    )
            return
        if runner.batch_size == 1 or len(imgs) == 1:
            # host-clustering path: forward + advection fused, pack
            # fetched for the host union-find
            for i, sample, im, sz in zip(block, samples, imgs, sizes):
                edge, pack_dev, (h4, w4) = runner.with_advect(
                    im, sz, device=dev
                )
                work_one(i, sample, edge, pack_dev, h4, w4, dev)
        else:
            fw = runner.batch(imgs, sizes, device=dev)
            for i, sample, (edge, dp, (h4, w4)) in zip(block, samples, fw):
                pack_dev = advect_pack(dp, jnp.int32(h4), jnp.int32(w4))
                work_one(i, sample, edge, pack_dev, h4, w4, dev)

    with ThreadPoolExecutor(max_workers=max(2, 2 * len(spread))) as pool:
        list(pool.map(work, enumerate(blocks)))
