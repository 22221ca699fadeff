"""Benchmark: the pipeline's hot path on the current accelerator.

Measures steady-state throughput of the full random-walk label-propagation
program at production scale — the dominant cost of the reference's
label-making stages (SURVEY 2.5): boundary map -> dense 18k^2 affinity ->
A^10 -> column normalize -> 8 MXU squarings (T^256, ~100 TFLOP) -> seed
propagation -> x4 decode, one fused XLA program per image.

Prints a json line
  {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N}
IMMEDIATELY (flushed) after the headline measurement, then re-prints the
line with each composed-stage field appended as it lands — a harness
timeout anywhere later still leaves the newest printed line parseable
(round 4 lost its number to exactly that: rc 124 with nothing printed).
Composed benches are wall-clock budgeted (IRN_TPU_BENCH_BUDGET_S, default
400 s): any bench whose worst-case cold-compile estimate no longer fits
is skipped with a marker instead of risking the harness timeout.

Baseline: the torch reference executes the same math as ~5 s/image on a
V100-class GPU (8 dense fp32 16k^3 matmuls at ~14 TFLOPS effective, plus a
GPU->CPU sparse densify round trip and a per-size PathIndex rebuild,
misc/indexing.py:112-139); vs_baseline = value / 0.2 img/s. No numbers are
published in the reference repo (BASELINE.md), so this is a documented
engineering estimate, deliberately generous to the reference.
"""

import json
import os
import time

import numpy as np

_T0 = time.time()
# the harness window is ~1800 s (round 4's rc-124 run was cut ~30 min
# after its first stderr line); 1200 leaves a full worst-case composed
# bench of headroom on top of the gate's own cold estimates
_BUDGET_S = float(os.environ.get("IRN_TPU_BENCH_BUDGET_S", "1200"))


def _emit(line):
    """Print the (growing) result line now; never buffer it."""
    print(json.dumps(line), flush=True)


def _elapsed():
    return time.time() - _T0


def _stage_device(arrs):
    """Upload same-shape host arrays as ONE transfer + ONE split program
    returning device-resident views. Call COUNT, not bytes, prices relay
    transports, and under tunnel contention every call also waits behind
    other tenants' work — a contended run spread ~850 s of queue wait
    over the ~40 per-array staging calls this replaces with 2, while the
    measured values themselves stayed stable."""
    import jax
    import jax.numpy as jnp

    n = len(arrs)
    blob = jnp.asarray(np.stack(arrs))
    out = list(jax.jit(lambda b: tuple(b[i] for i in range(n)))(blob))
    float(jnp.sum(out[-1], dtype=jnp.float32))  # force staging NOW
    return out


def main():
    import jax
    import jax.numpy as jnp

    from irn_tpu.ops import random_walk as rw_mod

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        # persistent compile cache (BEFORE the first jax op): the
        # stencil's Mosaic compile is minutes per (geometry, row-bucket)
        # and fully cache-served
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # VOC-typical landscape image: 375x500 px -> stride-4 grid 94x125,
    # bucketed to the (96, 128) geometry (~14k^2 transition matrix)
    cap_h, cap_w = 96, 128
    geom = rw_mod.build_geometry(cap_h, cap_w, radius=5)
    rng = np.random.default_rng(0)

    n_images = 8
    n_passes = 2
    edges = _stage_device([
        rng.random((cap_h, cap_w)).astype(np.float32) * 0.9
        for _ in range(n_images * n_passes + 1)  # +1: dedicated warmup
    ])
    cams = _stage_device([
        rng.random((20, cap_h, cap_w)).astype(np.float32)
        for _ in range(n_images * n_passes + 1)
    ])
    mm_dtype = jnp.bfloat16 if on_tpu else None
    exp_times = 8 if on_tpu else 2  # CPU smoke mode

    # production defaults: cost-model split between squarings and thin
    # seed applications (rw_square_times=-1) + banded Pallas kernels on TPU
    # (rw_banded=True) — both as RandomWalkRunner._resolve does
    sqb = rw_mod.pick_square_times_banded(exp_times)
    banded = on_tpu and rw_mod.banded_fits(geom, exp_times, sqb)
    sq = sqb if banded else rw_mod.pick_square_times(
        geom.n_pad, exp_times, matmul_dtype=mm_dtype
    )

    @jax.jit
    def run(cam, edge):
        prop = rw_mod.propagate_banded if banded else rw_mod.propagate
        rw = prop(
            geom, cam, edge, beta=10, exp_times=exp_times,
            matmul_dtype=mm_dtype, square_times=sq,
        )
        labels, _, _ = rw_mod.upsample_and_decode(
            rw, 94, 125, 375, 500, 0.25
        )
        return labels.sum()

    # warm up / compile on the dedicated extra input (a timed pass must
    # never re-execute it: the tunnel value-caches identical executions)
    float(run(cams[-1], edges[-1]))

    # best of 2 passes — a single pass through the shared relay can catch
    # a transient backlog — over DISTINCT inputs per pass (the tunnel
    # value-caches identical executions; CLAUDE.md methodology)
    dt = float("inf")
    for p in range(n_passes):
        t0 = time.time()
        for i in range(p * n_images, (p + 1) * n_images):
            out = run(cams[i], edges[i])
        float(out)  # fetch forces completion through the device queue
        dt = min(dt, (time.time() - t0) / n_images)

    value = 1.0 / dt
    baseline_img_s = 0.2  # reference GPU estimate; see module docstring
    line = {
        "metric": "random-walk label propagation, VOC-typical 375x500 image (T^256, fused)",
        "value": round(value, 3),
        "unit": "img/s",
        "vs_baseline": round(value / baseline_img_s, 2),
        # the reference publishes no numbers (SURVEY 6); the denominator is
        # a documented engineering estimate — see module docstring
        "baseline": {"img_s": baseline_img_s, "kind": "estimated"},
        # wall clock to this point (imports + compile warmup + passes):
        # diagnoses budget skips — on a contended host the relay client
        # inflates several-fold (CLAUDE.md), eating the composed budget
        "headline_s": round(_elapsed(), 1),
    }
    _emit(line)  # the headline survives any later timeout

    if not on_tpu:
        return
    # composed stage benches, each gated on remaining budget. Estimates
    # are the measured round-5 envelope (warm persistent compile cache;
    # the driver box keeps /tmp/jaxcache across runs): per-program FIRST
    # executions through the relay cost seconds each regardless of the
    # cache, and tunnel contention can inflate any phase several-fold.
    # The gate only protects LATER benches -- fields measured before a
    # harness cut already survive via the incremental flush, so err on
    # the permissive side.
    composed = [
        ("make_sem_seg_e2e_img_s", bench_make_sem_seg, 220.0),
        ("make_ins_seg_e2e_img_s", bench_make_ins_seg, 300.0),
        ("cam_to_ir_label_img_s", bench_cam_to_ir_label, 60.0),
        ("make_cam_img_s", bench_make_cam, 300.0),
    ]
    for key, fn, est in composed:
        if _elapsed() + est > _BUDGET_S:
            line.setdefault("skipped", {})[key] = "budget"
        else:
            t1 = time.time()
            try:
                line[key] = round(fn(rng), 3)
            except Exception as e:  # never lose already-measured fields
                line.setdefault("skipped", {})[key] = repr(e)[:160]
            line.setdefault("t_s", {})[key] = round(time.time() - t1, 1)
        _emit(line)  # re-print with the new field appended


def bench_make_sem_seg(rng):
    """Composed make_sem_seg device figure (VERDICT r2 #8): the REAL
    per-image device cost of the label stage — EdgeDisplacement forward
    (512px padded crop) + bucketed random walk + x4 decode + u8 label
    pack — through the stage's own runners, software-pipelined exactly
    as pipeline/stages_irn.make_sem_seg_labels dispatches them (fetch
    trails the dispatch front), with the default split programs: the
    opt-in sem_monolith fusion (one program/img, 2 transport calls vs 5
    for relay-attached hosts) measured 74.1 here — the joint
    conv+stencil schedule costs ~5 ms/img device time (probe 10.7 ->
    16.0), so the split flow is the default AND the bench path.
    Matches step/make_sem_seg_labels.py:17-54. Random-initialized IRNet
    weights (none ship in this env); weights don't change the op
    schedule. K=3 seed rows = the classes present on a typical VOC
    image; the device program pads to the walker's 8-row bucket (the
    stencil's cost is linear in seed rows)."""
    import jax
    import jax.numpy as jnp

    from irn_tpu.models.irn import IRNet
    from irn_tpu.pipeline.config import Config
    from irn_tpu.pipeline.stages_irn import (
        EdgeDisplacementRunner,
        RandomWalkRunner,
    )

    cfg = Config(model_dtype="bfloat16", rw_matmul_dtype="bfloat16")
    model = IRNet(dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, cfg.rw_grid_cap * 4, cfg.rw_grid_cap * 4, 3)),
    )
    runner = EdgeDisplacementRunner(cfg, variables)
    walker = RandomWalkRunner(cfg, n_seed_rows=20)

    n_images = 8
    # pre-uploaded inputs, per the repo's tunnel benchmarking rules
    # (CLAUDE.md): the relay transport serializes with execution and runs
    # ~44 MB/s, so per-image H2D (786 KB padded uint8 + the K seed rows)
    # adds ~20 ms/img HERE that is ~50 us on a co-located host. Measured
    # relay-inclusive figure for the record: 24.5 img/s (prefetch threads
    # don't help — the tunnel is one stream).
    n_passes = 2
    imgs_host = []
    for _ in range(n_images * n_passes + 1):  # +1: dedicated warmup
        p = np.zeros((512, 512, 3), np.uint8)
        p[:375, :500] = (rng.random((375, 500, 3)) * 255).astype(np.uint8)
        imgs_host.append(p)
    imgs = _stage_device(imgs_host)
    cam_rows = _stage_device([
        rng.random((3, 96, 128)).astype(np.float32)
        for _ in range(n_images * n_passes + 1)
    ])

    eargs = (jnp.int32(375), jnp.int32(500), jnp.int32(94), jnp.int32(125))
    wargs = (jnp.int32(94), jnp.int32(125), jnp.int32(375), jnp.int32(500),
             jnp.float32(0.25))
    wprog = walker._program(96, 128, packed="u8")
    rpad = walker._row_pad(3, 96, 128)

    def one(i):
        edge, _ = runner._run(imgs[i], *eargs)
        return wprog(rpad(cam_rows[i]), edge[:96, :128], *wargs)

    # compile both programs on the dedicated warmup input (tunnel: fetch,
    # not block; timed passes never re-execute it)
    float(jnp.sum(one(len(imgs) - 1), dtype=jnp.float32))
    best = 0.0
    # best of 2 passes over DISTINCT inputs (transient relay backlog;
    # the tunnel value-caches identical executions)
    for p in range(n_passes):
        t0 = time.time()
        outs = [one(i) for i in range(p * n_images, (p + 1) * n_images)]
        float(jnp.sum(outs[-1], dtype=jnp.float32))  # force the queue
        best = max(best, n_images / (time.time() - t0))
    return best


def bench_make_ins_seg(rng):
    """Composed make_ins_seg figure (VERDICT r3 #2, r4 #2): the per-image
    cost of the instance stage through the production monolith SPLIT
    flow — EdgeDisplacement forward + 300-iteration advection + device
    basin CCL + seed build + the (instances x classes) random walk +
    decode + device component split + per-component score reduction,
    ONE program per image (walker.propagate_monolith) fed by a single
    uint8 blob carrying the image and the f32 cam rows, whose ~0.2 MB
    uint8 fetch carries the component-id plane + per-component tables
    (rows/sizes/scores) + both counts; the host tail is a table slice —
    pipelined TWO images deep exactly as make_ins_seg_labels's
    2-threads-per-device pool does. One dispatch + one fetch per image
    in the timed region (blobs pre-staged per the repo's tunnel
    methodology; round-4's host-union-find flow paid 3 dispatches + 2
    fetches at matched staging, and the round-5a pre-split flow fetched
    1.18 MB and ran the component split on the 1-core host). Matches
    step/make_ins_seg_labels.py:108-152.

    Seeds are smooth Gaussian-bump cams (2 classes — uniform-noise cams
    decode to hundreds of speckle components and benchmark the host
    component split instead of the stage).

    Basin realism: a random-initialized IRNet's displacement field has
    |dp| >= 2.5 almost everywhere, so basins degenerate to K=1 (the
    round-3 figure measured that). Production images carry 2-8 instances,
    so a constant 4-attractor field is blended into the net's dp INSIDE
    the fused program (model-apply wrapper: dp*0.01 + field — the real
    forward still runs in full; XLA cannot dead-code it) exactly where
    trained-weight structure would enter. Unlike the round-4 host
    injection this leaves the production dispatch/fetch pattern
    untouched. The walk is shape-static at classes x ins_cluster_cap
    rows either way, so the figure no longer depends on the decoded K."""
    from concurrent.futures import ThreadPoolExecutor

    import jax
    import jax.numpy as jnp

    from irn_tpu.models.irn import IRNet
    from irn_tpu.pipeline.config import Config
    from irn_tpu.pipeline.stages_irn import (
        EdgeDisplacementRunner,
        RandomWalkRunner,
        _pow2_ge,
        _split_unpack_np,
        monolith_pack,
    )

    cfg = Config(model_dtype="bfloat16", rw_matmul_dtype="bfloat16")
    model = IRNet(dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, cfg.rw_grid_cap * 4, cfg.rw_grid_cap * 4, 3)),
    )
    runner = EdgeDisplacementRunner(cfg, variables)
    walker = RandomWalkRunner(cfg, n_seed_rows=cfg.ins_seed_cap)
    k_cap = cfg.ins_cluster_cap

    # 4-attractor displacement field on the [cap, cap] grid: dp points at
    # the nearest attractor with gain 0.25, so |dp| < 2.5 within ~10
    # cells of each (four disjoint basins) and the 300-step advection
    # contracts into them
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
        """model-apply wrapper: the net's displacement output blends with
        the constant attractor field (see docstring). Wrapping happens
        BEFORE the runner's fused program first traces, so the blend
        compiles into run_cluster itself — no extra dispatch."""

        def apply(self, vs, pair, apply_mean_shift=True):
            e, d = model.apply(vs, pair, apply_mean_shift=apply_mean_shift)
            return e, d.astype(jnp.float32) * 0.01 + field_dev[None]

    runner.model = _BasinBlend()

    n_images, n_passes = 8, 2
    imgs_np = [
        (rng.random((375, 500, 3)) * 255).astype(np.uint8)
        for _ in range(n_images * n_passes + 1)
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

    cam_sets = [blob_cams() for _ in range(n_images * n_passes + 1)]

    def pack(i):
        c_pad = _pow2_ge(cam_sets[i].shape[0])
        camp = np.zeros((c_pad, 96, 128), np.float32)
        camp[: cam_sets[i].shape[0], :94, :125] = cam_sets[i]
        return monolith_pack(runner, imgs_np[i], camp)

    # pre-staged inputs per the repo's tunnel methodology (the blob IS
    # the per-image transport; co-located hosts pay ~60 us for it)
    blobs = _stage_device([pack(i) for i in range(len(imgs_np))])

    def one(i):
        # the production monolith SPLIT flow exactly as work_one_mono
        # runs it: forward + advect + basin CCL + seed build + walk +
        # decode + component split + per-component score reduction, ONE
        # program per image -- one dispatch + one ~0.2 MB fetch (uint8
        # component-id plane + tables) covers the whole image, and the
        # host tail is a table slice (the pre-split flow fetched a
        # 1.18 MB (labels, best) pack and ran split_components +
        # np.maximum.at per image on the 1-core host)
        wpack = np.asarray(walker.propagate_monolith_packed(
            runner, blobs[i], 375, 500, (375, 500), 0.25
        ))
        comp_map, rows, sizes, scores, n_comp, n_found = _split_unpack_np(
            wpack, walker.comp_cap
        )
        assert 0 < n_found <= k_cap, n_found  # overflow would fall back
        assert 0 < n_comp <= walker.comp_cap, n_comp
        return scores[:n_comp]

    one(len(imgs_np) - 1)  # compile warmup on the dedicated input
    best = 0.0
    for p in range(n_passes):  # distinct inputs per pass (tunnel caching)
        t0 = time.time()
        with ThreadPoolExecutor(2) as pool:  # the stage's pipeline depth
            list(pool.map(one, range(p * n_images, (p + 1) * n_images)))
        best = max(best, n_images / (time.time() - t0))
    return best


def bench_make_cam(rng):
    """Composed make_cam device figure: the per-image device compute of
    the multi-scale CAM inference stage — uint8 normalize + flip-pair
    stack + the [2k] ResNet-50 CAM forward + flip fusion +
    dynamic-extent resizes + cross-scale accumulation, through the
    stage's own cached scale-pass programs
    (pipeline/stages_cam.build_cam_scale_pass, exactly what make_cam
    dispatches per scale) at the VOC-typical 375x500 size, 4 scales x 2
    flips (run_sample.py:31). Matches step/make_cam.py:26-56. Batch k=8
    here (the stage default cam_infer_batch=32 measured 110 img/s,
    BASELINE.md round-3 — k=8 trades a little MXU utilization for 4x
    less pre-staged upload through the relay). Random weights/pixels:
    content does not change the conv schedules. Inputs pre-staged per
    scale per the repo's tunnel methodology; distinct images per chunk
    (the tunnel value-caches identical executions)."""
    import jax
    import jax.numpy as jnp

    from irn_tpu.data import transforms as T
    from irn_tpu.models.cam import CAMNet
    from irn_tpu.pipeline.common import round_up
    from irn_tpu.pipeline.stages_cam import build_cam_scale_pass

    size = (375, 500)
    scales = (1.0, 0.5, 1.5, 2.0)
    s4_cap, su_cap = 128, 512
    k, n_chunks = 8, 3  # chunk 0 warms/compiles; 1..2 are timed

    model = CAMNet(dtype=jnp.bfloat16)
    variables = jax.tree.map(
        np.asarray,
        model.init(jax.random.PRNGKey(0),
                   np.zeros((1, 64, 64, 3), np.float32)),
    )
    scale_pass = build_cam_scale_pass(model, variables, s4_cap, su_cap)

    s4h, s4w = T.get_strided_size(size, 4)
    suh, suw = T.get_strided_up_size(size, 16)
    per_scale_dev, per_scale_scalars = [], []
    for scale in scales:
        sh = int(np.round(size[0] * scale))
        sw = int(np.round(size[1] * scale))
        ph, pw = round_up(sh, 64), round_up(sw, 64)
        # one blob upload + one split program per scale (not per image)
        imgs = _stage_device([
            rng.integers(0, 256, (k, ph, pw, 3)).astype(np.uint8)
            for _ in range(n_chunks)
        ])
        per_scale_dev.append(imgs)
        per_scale_scalars.append(tuple(jnp.int32(s) for s in (
            sh, sw, -(-sh // 16), -(-sw // 16),
            s4h, s4w, suh, suw, size[0], size[1],
        )))

    def run_chunk(c):
        s_acc = jnp.zeros((k, 20, s4_cap, s4_cap), jnp.float32)
        h_acc = jnp.zeros((k, 20, su_cap, su_cap), jnp.float32)
        for imgs, scalars in zip(per_scale_dev, per_scale_scalars):
            ph, pw = imgs[c].shape[1:3]
            s_acc, h_acc = scale_pass(ph, pw, k)(
                imgs[c], *scalars, s_acc, h_acc
            )
        float(jnp.sum(s_acc, dtype=jnp.float32))  # force the queue

    run_chunk(0)  # compile all four scale programs on the warm chunk
    best = 0.0
    for c in range(1, n_chunks):  # distinct inputs per chunk
        t0 = time.time()
        run_chunk(c)
        best = max(best, k / (time.time() - t0))
    return best


def bench_cam_to_ir_label(rng):
    """Composed cam_to_ir_label device-CRF figure (VERDICT r4 #4): the
    per-image device cost of the ir-label stage's refine step — ONE
    landmark-kernel mean-field program refining the fg/bg confident-map
    pair of a VOC-typical 375x500 image at the (384, 512) bucket, exactly
    the program pipeline/stages_cam.cam_to_ir_label dispatches through
    LandmarkCRF.pair when crf_backend resolves to 'tpu' (the default on
    accelerator hosts since round 4). Matches the reference stage's CRF
    hot spot, step/cam_to_ir_label.py:26-43 / misc/imutils.py:156-170.

    Device-resident inputs + scalar fetch per the repo's tunnel
    methodology; distinct inputs per image (the tunnel value-caches
    identical executions). Content (blob label maps) does not change the
    op schedule — the program is shape-static with a fixed 21-label cap."""
    import jax.numpy as jnp

    from irn_tpu.ops.crf_tpu import crf_pair_packed_program
    from irn_tpu.pipeline.config import Config

    cfg = Config()
    h, w = 375, 500
    ph, pw = 384, 512  # pad_multiple=64 bucket, as LandmarkCRF._bucket
    n_images, n_passes = 4, 2
    yy, xx = np.mgrid[:h, :w].astype(np.float32)

    def packed_one():
        # the stage's single packed uint8 upload: RGB + fg/bg label maps
        p = np.zeros((5, ph, pw), np.uint8)
        p[0, :h, :w] = (rng.random((h, w)) * 255).astype(np.uint8)
        p[1:3, :h, :w] = p[0, :h, :w]  # correlated channels, like a photo
        for plane in (3, 4):
            m = np.zeros((h, w), np.uint8)
            for lab in (1, 2):  # two confident fg classes on bg, VOC-typical
                cy, cx = rng.uniform(50, h - 50), rng.uniform(50, w - 50)
                r2 = rng.uniform(30, 80) ** 2
                m[(yy - cy) ** 2 + (xx - cx) ** 2 < r2] = lab
            p[plane, :h, :w] = m
        return p

    packs = _stage_device(
        [packed_one() for _ in range(n_images * n_passes + 1)]
    )
    args = (jnp.int32(h), jnp.int32(w), jnp.int32(3),
            jnp.float32(cfg.crf_gt_prob))

    def one(i):
        return crf_pair_packed_program(
            packs[i], *args, hw=(ph, pw), stride=cfg.crf_landmark_stride,
            t=cfg.crf_iters, kernel_store=cfg.crf_kernel_store,
        )

    # compile warmup on the dedicated extra input (never re-timed)
    float(jnp.sum(one(len(packs) - 1), dtype=jnp.float32))
    best = 0.0
    for p in range(n_passes):  # best of 2: transient relay backlog
        t0 = time.time()
        outs = [one(i) for i in range(p * n_images, (p + 1) * n_images)]
        float(jnp.sum(outs[-1], dtype=jnp.float32))  # fetch forces the queue
        best = max(best, n_images / (time.time() - t0))
    return best


if __name__ == "__main__":
    main()
