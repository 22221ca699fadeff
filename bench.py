"""Benchmark: the pipeline's hot path on the current accelerator.

Measures steady-state throughput of the full random-walk label-propagation
program at production scale — the dominant cost of the reference's
label-making stages (SURVEY 2.5): boundary map -> dense 18k^2 affinity ->
A^10 -> column normalize -> 8 MXU squarings (T^256, ~100 TFLOP) -> seed
propagation -> x4 decode, one fused XLA program per image.

Prints ONE json line:
  {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N}

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


def main():
    import jax
    import jax.numpy as jnp

    from irn_tpu.ops import random_walk as rw_mod

    # VOC-typical landscape image: 375x500 px -> stride-4 grid 94x125,
    # bucketed to the (96, 128) geometry (~14k^2 transition matrix)
    cap_h, cap_w = 96, 128
    geom = rw_mod.build_geometry(cap_h, cap_w, radius=5)
    rng = np.random.default_rng(0)

    n_images = 8
    n_passes = 2
    edges = [
        jnp.asarray(rng.random((cap_h, cap_w)).astype(np.float32) * 0.9)
        for _ in range(n_images * n_passes + 1)  # +1: dedicated warmup
    ]
    cams = [
        jnp.asarray(rng.random((20, cap_h, cap_w)).astype(np.float32))
        for _ in range(n_images * n_passes + 1)
    ]

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        # persistent compile cache: the stencil's Mosaic compile is
        # minutes per (geometry, row-bucket) and fully cache-served
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
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
    composed = bench_make_sem_seg(rng) if on_tpu else None
    ins = bench_make_ins_seg(rng) if on_tpu else None
    line = {
        "metric": "random-walk label propagation, VOC-typical 375x500 image (T^256, fused)",
        "value": round(value, 3),
        "unit": "img/s",
        "vs_baseline": round(value / baseline_img_s, 2),
        # the reference publishes no numbers (SURVEY 6); the denominator is
        # a documented engineering estimate — see module docstring
        "baseline": {"img_s": baseline_img_s, "kind": "estimated"},
    }
    if composed is not None:
        line["make_sem_seg_e2e_img_s"] = round(composed, 3)
    if ins is not None:
        line["make_ins_seg_e2e_img_s"] = round(ins, 3)
    print(json.dumps(line))


def bench_make_sem_seg(rng):
    """Composed make_sem_seg device figure (VERDICT r2 #8): the REAL
    per-image device cost of the label stage — EdgeDisplacement forward
    (512px padded crop) + bucketed random walk + x4 decode — through the
    stage's own runners, software-pipelined exactly as
    pipeline/stages_irn.make_sem_seg_labels dispatches them (fetch trails
    the dispatch front). Matches step/make_sem_seg_labels.py:17-54.
    Random-initialized IRNet weights (none ship in this env); weights
    don't change the op schedule."""
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
    # don't help — the tunnel is one stream). K=3 seed rows = the classes
    # present on a typical VOC image; the device program pads to the
    # walker's 8-row bucket (the stencil's cost is linear in seed rows —
    # 9.8 vs 17.1 ms/chain at 20 rows).
    n_passes = 2
    imgs = []
    for _ in range(n_images * n_passes + 1):  # +1: dedicated warmup
        p = np.zeros((512, 512, 3), np.uint8)
        p[:375, :500] = (rng.random((375, 500, 3)) * 255).astype(np.uint8)
        imgs.append(jnp.asarray(p))
    cam_rows = [
        jnp.asarray(rng.random((3, 96, 128)).astype(np.float32))
        for _ in range(n_images * n_passes + 1)
    ]
    float(imgs[-1][0, 0, 0])
    float(cam_rows[-1][0, 0, 0])

    eargs = (jnp.int32(375), jnp.int32(500), jnp.int32(94), jnp.int32(125))
    wargs = (jnp.int32(94), jnp.int32(125), jnp.int32(375), jnp.int32(500),
             jnp.float32(0.25))
    wprog = walker._program(96, 128)
    rpad = walker._row_pad(3, 96, 128)

    def one(i):
        edge, _ = runner._run(imgs[i], *eargs)
        labels, _ = wprog(rpad(cam_rows[i]), edge[:96, :128], *wargs)
        return labels

    # compile both programs on the dedicated warmup input (tunnel: fetch,
    # not block; timed passes never re-execute it)
    float(one(len(imgs) - 1).sum())
    best = 0.0
    # best of 2 passes over DISTINCT inputs (transient relay backlog;
    # the tunnel value-caches identical executions)
    for p in range(n_passes):
        t0 = time.time()
        outs = [one(i) for i in range(p * n_images, (p + 1) * n_images)]
        float(outs[-1].sum())  # fetch forces the queued chain
        best = max(best, n_images / (time.time() - t0))
    return best


def bench_make_ins_seg(rng):
    """Composed make_ins_seg figure (VERDICT r3 #2): the per-image cost of
    the instance stage through its real programs and host hops —
    EdgeDisplacement forward, 300-iteration advection (+ the packed
    centroid/displacement fetch), host basin clustering (connected
    components), the (instances x classes) random walk + packed
    label/score fetch, host component split + per-component score
    reduction — pipelined TWO images deep exactly as
    pipeline/stages_irn.make_ins_seg_labels's 2-threads-per-device pool
    does. Matches step/make_ins_seg_labels.py:108-152.

    Unlike the sem-seg figure this one is NOT device-resident-only: the
    stage's host CC sits on the critical path, so the figure includes the
    per-image device->host round trips (co-located hosts pay ~60 us).
    Seeds are smooth Gaussian-bump cams (2 classes — uniform-noise cams
    decode to hundreds of speckle components and benchmark the host CC
    instead of the stage).

    Basin realism: a random-initialized IRNet's displacement field has
    |dp| >= 2.5 almost everywhere, so the fetched basin plane is empty and
    clustering degenerates to K=1 (2 seed rows — the round-3 figure
    measured that). Production images carry 2-8 instances and the
    stencil walk is linear in seed rows, so the fetched basin plane is
    replaced host-side with 4 synthetic basin disks (the device flow —
    forward, advection, pack, seed build, walk — is untouched; only the
    host clustering input changes, exactly where trained-weight structure
    would enter)."""
    from concurrent.futures import ThreadPoolExecutor

    import jax
    import jax.numpy as jnp

    from irn_tpu.models.irn import IRNet
    from irn_tpu.ops import centroids as cent_mod
    from irn_tpu.pipeline.config import Config
    from irn_tpu.pipeline.stages_irn import (
        EdgeDisplacementRunner,
        RandomWalkRunner,
        _seed_build,
        _walk_unpack_np,
    )

    cfg = Config(model_dtype="bfloat16", rw_matmul_dtype="bfloat16")
    model = IRNet(dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, cfg.rw_grid_cap * 4, cfg.rw_grid_cap * 4, 3)),
    )
    runner = EdgeDisplacementRunner(cfg, variables)
    walker = RandomWalkRunner(cfg, n_seed_rows=cfg.ins_seed_cap)

    n_images, n_passes = 8, 2
    imgs = []
    for _ in range(n_images * n_passes + 1):
        p = np.zeros((512, 512, 3), np.uint8)
        p[:375, :500] = (rng.random((375, 500, 3)) * 255).astype(np.uint8)
        imgs.append(jnp.asarray(p))

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

    def blob_basins(k=4):
        m = np.zeros((94, 125), np.uint8)
        for _ in range(k):
            cy, cx = rng.uniform(10, 84), rng.uniform(10, 115)
            m[(yy[:94, :125] - cy) ** 2 + (xx[:94, :125] - cx) ** 2
              < rng.uniform(3, 7) ** 2] = 1
        return m

    basin_sets = [blob_basins() for _ in range(n_images * n_passes + 1)]
    float(imgs[-1][0, 0, 0])
    eargs = (jnp.int32(375), jnp.int32(500), jnp.int32(94), jnp.int32(125))

    def one(i):
        # the round-4 3-dispatch flow exactly as work_one runs it:
        # (forward + advect + uint8 pack) | (seed build from C cam rows +
        # K uint8 masks) | (walk + decode + uint16 pack)
        edge, pack_dev = runner._run_advect(imgs[i], *eargs)
        pack = np.asarray(pack_dev)[:, :94, :125]
        instance_map = cent_mod.cluster_centroids_from_basin(
            pack[:2].astype(np.int32), basin_sets[i]  # see docstring
        )
        camp = np.zeros((cam_sets[i].shape[0], 96, 128), np.float32)
        camp[:, :94, :125] = cam_sets[i]
        # fixed 6-mask cap so every image shares one (seed-build, walk)
        # shape family and the warmup covers it: per-shape first
        # executions cost seconds through the relay and would land in
        # the timed passes (zero mask rows are zero seed rows — they
        # never win the decode, so the labels are unchanged)
        assert instance_map.shape[0] <= 6, instance_map.shape
        maskp = np.zeros((6, 96, 128), np.uint8)
        maskp[: instance_map.shape[0], :94, :125] = instance_map
        seeds = _seed_build(jnp.asarray(camp), jnp.asarray(maskp))
        labels_np, best_np = _walk_unpack_np(np.asarray(
            walker.propagate_all(
                seeds, edge, 94, 125, (375, 500), 0.25, packed=True
            )
        ))
        comp_map, comp_rows, comp_sizes = cent_mod.split_components(
            labels_np, seeds.shape[0]
        )
        scores = np.zeros(comp_rows.shape[0] + 1, np.float32)
        np.maximum.at(scores, comp_map.reshape(-1), best_np.reshape(-1))
        return scores

    one(len(imgs) - 1)  # compile warmup on the dedicated input
    best = 0.0
    for p in range(n_passes):  # distinct inputs per pass (tunnel caching)
        t0 = time.time()
        with ThreadPoolExecutor(2) as pool:  # the stage's pipeline depth
            list(pool.map(one, range(p * n_images, (p + 1) * n_images)))
        best = max(best, n_images / (time.time() - t0))
    return best


if __name__ == "__main__":
    main()
