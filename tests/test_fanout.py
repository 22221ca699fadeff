"""Single-process multi-device inference fan-out + the pipeline-wired
model-sharded random walk.

The reference keeps every GPU busy in the make stages by spawning one
process per GPU (step/make_cam.py:71-74, make_sem_seg_labels.py:67-70);
irn_tpu commits per-image programs to local devices round-robin inside one
process. ``rw_mesh_model`` row-shards one image's transition matrix over
the mesh instead (the long-context mode) — both must reproduce the
single-device outputs exactly.
"""

import dataclasses
import os

import imageio.v2 as imageio
import jax
import jax.numpy as jnp
import numpy as np

from irn_tpu.data import synthetic, voc12
from irn_tpu.models.irn import IRNet
from irn_tpu.pipeline import common
from irn_tpu.pipeline.config import Config
from irn_tpu.pipeline.stages_irn import (
    EdgeDisplacementRunner,
    RandomWalkRunner,
    make_sem_seg_labels,
)
from irn_tpu.utils import checkpoint as ckpt


def test_device_spreader_round_robin():
    spread = common.DeviceSpreader()
    assert len(spread) == len(jax.local_devices())
    for i in range(2 * len(spread)):
        spread(i)
    assert all(v == 2 for v in spread.assigned.values())
    # capped variant
    two = common.DeviceSpreader(2)
    assert len(two) == 2


def _tiny_irn_variables():
    model = IRNet()
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32)
    )
    return jax.tree.map(np.asarray, variables)


def test_edge_runner_commits_to_each_device(rng):
    cfg = Config(rw_grid_cap=16)
    runner = EdgeDisplacementRunner(cfg, _tiny_irn_variables())
    img = rng.integers(0, 255, (50, 60, 3)).astype(np.uint8)
    ref = None
    for d in jax.local_devices():
        edge, dp, _ = runner(img, img.shape[:2], device=d)
        assert edge.devices() == {d}
        assert dp.devices() == {d}
        e, p = np.asarray(edge), np.asarray(dp)
        if ref is None:
            ref = (e, p)
        else:
            np.testing.assert_array_equal(e, ref[0])
            np.testing.assert_array_equal(p, ref[1])


def test_walker_round_robin_matches_default(rng):
    cfg = Config(rw_grid_cap=16, exp_times=3, rw_radius=2)
    walker = RandomWalkRunner(cfg, n_seed_rows=4)
    h4 = w4 = 14
    size = (54, 54)
    edge = np.ones((16, 16), np.float32)
    edge[:h4, :w4] = rng.random((h4, w4)).astype(np.float32)
    cams = rng.random((3, h4, w4)).astype(np.float32)

    want_l, want_r = walker(cams, jnp.asarray(edge), h4, w4, size, 0.25)
    for d in jax.local_devices():
        got_l, got_r = walker(
            cams, jax.device_put(jnp.asarray(edge), d), h4, w4, size, 0.25,
            device=d,
        )
        assert got_l.devices() == {d}
        np.testing.assert_array_equal(np.asarray(got_l), np.asarray(want_l))
        np.testing.assert_array_equal(np.asarray(got_r), np.asarray(want_r))


def test_walker_mesh_model_parity(rng):
    """rw_mesh_model=8: row-sharded transition power produces the same
    labels (bit-equal) and scores as the single-device walker."""
    base = dict(rw_grid_cap=16, exp_times=3, rw_radius=2)
    w1 = RandomWalkRunner(Config(**base), n_seed_rows=4)
    w8 = RandomWalkRunner(Config(rw_mesh_model=8, **base), n_seed_rows=4)
    assert w8.mesh is not None and w8.mesh.shape["model"] == 8

    h4, w4 = 14, 12
    size = (54, 46)
    edge = np.ones((16, 16), np.float32)
    edge[:h4, :w4] = rng.random((h4, w4)).astype(np.float32)
    cams = rng.random((3, h4, w4)).astype(np.float32)

    l1, r1 = w1(cams, jnp.asarray(edge), h4, w4, size, 0.25)
    l8, r8 = w8(cams, jnp.asarray(edge), h4, w4, size, 0.25)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l8))
    np.testing.assert_allclose(
        np.asarray(r8), np.asarray(r1), atol=1e-6, rtol=1e-6
    )


def test_walker_row_bucket_matches_full_pad(rng):
    """K <= ROW_BUCKET seeds run an 8-row program instead of the n_rows
    one (the stencil's cost is linear in seed rows); padded zero rows are
    inert through propagate + decode, so labels/scores are identical to
    hand-padding the seeds to n_rows."""
    cfg = Config(rw_grid_cap=16, exp_times=3, rw_radius=2)
    walker = RandomWalkRunner(cfg, n_seed_rows=16)

    h4, w4 = 14, 12
    size = (54, 46)
    edge = np.ones((16, 16), np.float32)
    edge[:h4, :w4] = rng.random((h4, w4)).astype(np.float32)
    cams = rng.random((3, h4, w4)).astype(np.float32)
    assert walker._row_bucket(3) == walker.ROW_BUCKET < walker.n_rows

    lb, rb = walker(cams, jnp.asarray(edge), h4, w4, size, 0.25)
    full = np.zeros((16, h4, w4), np.float32)
    full[:3] = cams
    lf, rf = walker(full, jnp.asarray(edge), h4, w4, size, 0.25)
    np.testing.assert_array_equal(np.asarray(lb), np.asarray(lf))
    np.testing.assert_allclose(
        np.asarray(rb), np.asarray(rf), atol=1e-6, rtol=1e-6
    )


def test_row_bucket_family():
    """Seed rows pad to the smallest power-of-two bucket >= k (from
    ROW_BUCKET, capped at n_rows): make_ins_seg's (instances x classes)
    row counts land anywhere in [1, 128], and padding 20 rows to 128
    costs ~10x the 8-row chain (the stencil is linear in rows)."""
    w = RandomWalkRunner(Config(rw_grid_cap=16), n_seed_rows=128)
    assert [w._row_bucket(k) for k in (1, 8, 9, 16, 20, 33, 64, 65, 128)] \
        == [8, 8, 16, 16, 32, 64, 64, 128, 128]
    sem = RandomWalkRunner(Config(rw_grid_cap=16), n_seed_rows=20)
    assert [sem._row_bucket(k) for k in (3, 8, 9, 17, 20)] == \
        [8, 8, 16, 20, 20]


def test_propagate_all_chunked_matches_fused(rng):
    """Uncapped seed rows: chunked streaming through a prebuilt T equals a
    single fused propagation of all rows (labels bit-equal)."""
    base = dict(rw_grid_cap=16, exp_times=3, rw_radius=2)
    chunked = RandomWalkRunner(Config(**base), n_seed_rows=4)
    fused = RandomWalkRunner(Config(**base), n_seed_rows=16)

    h4, w4 = 14, 12
    size = (54, 46)
    edge = np.ones((16, 16), np.float32)
    edge[:h4, :w4] = rng.random((h4, w4)).astype(np.float32)
    seeds = rng.random((10, h4, w4)).astype(np.float32)  # 10 > 4: 3 chunks

    lc, bc = chunked.propagate_all(
        seeds, jnp.asarray(edge), h4, w4, size, 0.25
    )
    lf, bf = fused(seeds, jnp.asarray(edge), h4, w4, size, 0.25)
    np.testing.assert_array_equal(np.asarray(lc), np.asarray(lf))
    np.testing.assert_allclose(
        np.asarray(bc), np.asarray(bf), atol=1e-6, rtol=1e-6
    )


def test_make_cam_batched_matches_per_image(tmp_path, rng):
    """cam_infer_batch > 1 stacks same-size images into one scale pass;
    artifacts must match the per-image path (same math, bigger MXU feed)."""
    from irn_tpu.models.cam import CAMNet
    from irn_tpu.pipeline import stages_cam
    from irn_tpu.pipeline.stages_cam import _chunk_sizes

    assert _chunk_sizes(11, 4) == [4, 4, 2, 1]
    assert _chunk_sizes(3, 8) == [2, 1]
    assert _chunk_sizes(8, 8) == [8]

    root = str(tmp_path / "voc")
    # max_side_jitter=0: all images share one size -> one batched chunk
    train, _ = synthetic.generate(
        root, n_images=6, size=48, max_side_jitter=0, seed=3
    )
    model = CAMNet()
    variables = jax.tree.map(
        np.asarray,
        model.init(jax.random.PRNGKey(1), np.zeros((1, 48, 48, 3), np.float32)),
    )
    weights = str(tmp_path / "cam.ckpt")
    ckpt.save_checkpoint(weights, variables)

    outs = {}
    for tag, bs in {"one": 1, "four": 4}.items():
        cfg = Config(
            voc12_root=root, train_list=train, infer_list=train,
            cls_labels_path=os.path.join(root, "cls_labels.npy"),
            cam_weights_name=weights,
            cam_out_dir=str(tmp_path / ("cam_" + tag)),
            rw_grid_cap=16, pad_multiple=16, cam_infer_batch=bs,
            cam_scales=(1.0, 0.5),
        ).resolve()
        os.makedirs(cfg.cam_out_dir, exist_ok=True)
        stages_cam.make_cam(cfg)
        outs[tag] = {
            n: np.load(
                os.path.join(cfg.cam_out_dir, n + ".npy"), allow_pickle=True
            ).item()
            for n in voc12.load_img_name_list(train)
        }
    for n, want in outs["one"].items():
        got = outs["four"][n]
        np.testing.assert_array_equal(got["keys"], want["keys"])
        np.testing.assert_allclose(got["cam"], want["cam"], atol=1e-5)
        np.testing.assert_allclose(got["high_res"], want["high_res"], atol=1e-5)


def _stage_tree(tmp_path, rng):
    root = str(tmp_path / "voc")
    train, _ = synthetic.generate(
        root, n_images=4, size=48, max_side_jitter=8, seed=2
    )
    cam_dir = str(tmp_path / "cam")
    os.makedirs(cam_dir)
    weights = str(tmp_path / "irn.ckpt")
    ckpt.save_checkpoint(weights, _tiny_irn_variables())
    for name in voc12.load_img_name_list(train):
        img = np.asarray(
            imageio.imread(os.path.join(root, "JPEGImages", name + ".jpg"))
        )
        h4 = (img.shape[0] - 1) // 4 + 1
        w4 = (img.shape[1] - 1) // 4 + 1
        k = int(rng.integers(1, 3))
        keys = np.sort(rng.choice(20, size=k, replace=False)).astype(np.int64)
        np.save(
            os.path.join(cam_dir, name + ".npy"),
            {"keys": keys, "cam": rng.random((k, h4, w4)).astype(np.float32),
             "high_res": None},
        )
    return Config(
        voc12_root=root, train_list=train, infer_list=train,
        rw_grid_cap=16, exp_times=2, rw_radius=2,
        cam_out_dir=cam_dir, irn_weights_name=weights,
    ).resolve()


def test_make_sem_seg_fanout_and_mesh_identical(tmp_path, rng):
    cfg = _stage_tree(tmp_path, rng)
    outs = {}
    for tag, kw in {
        "one": dict(infer_devices=1),
        "all": dict(infer_devices=0),
        "mesh": dict(rw_mesh_model=8),
        "batch2": dict(edge_infer_batch=2),  # batched-forward split flow
        "mono": dict(sem_monolith=True),  # fused one-program-per-image
    }.items():
        c = dataclasses.replace(
            cfg, sem_seg_out_dir=str(tmp_path / ("sem_" + tag)), **kw
        )
        make_sem_seg_labels(c)
        outs[tag] = {
            n: np.asarray(
                imageio.imread(os.path.join(c.sem_seg_out_dir, n + ".png"))
            )
            for n in voc12.load_img_name_list(cfg.train_list)
        }
    for tag in ("all", "mesh", "batch2", "mono"):
        for n, want in outs["one"].items():
            np.testing.assert_array_equal(outs[tag][n], want, err_msg=(tag, n))


def test_walk_pack_uint16_roundtrip(rng):
    """The uint16 (labels, best-bitcast) pack is lossless: labels beyond
    255 and arbitrary f32 scores survive the round trip exactly."""
    from irn_tpu.pipeline.stages_irn import _walk_pack, _walk_unpack_np

    labels = rng.integers(0, 700, (24, 20)).astype(np.int32)
    best = (rng.standard_normal((24, 20)) * 1e3).astype(np.float32)
    best[0, :4] = [0.0, -0.0, 1e-38, 3.4e38]
    l2, b2 = _walk_unpack_np(
        np.asarray(_walk_pack(jnp.asarray(labels), jnp.asarray(best)))
    )
    np.testing.assert_array_equal(l2, labels)
    np.testing.assert_array_equal(b2, best)


def test_advect_pack_u8_matches_legacy(rng):
    """The uint8 (cy, cx, basin) advect pack drives clustering to the SAME
    instance masks as the round-3 f32 (cy, cx, dp) pack: coordinates are
    exact in uint8 at <=255-cell grids and the basin predicate is the
    same f32 sqrt on both sides."""
    from irn_tpu.ops import centroids as cent_mod
    from irn_tpu.pipeline.stages_irn import _advect_pack_program

    h4, w4 = 14, 12
    dp = (rng.standard_normal((2, 16, 16)) * 3).astype(np.float32)
    pack = _advect_pack_program()(
        jnp.asarray(dp), jnp.int32(h4), jnp.int32(w4)
    )
    pack = np.asarray(pack)[:, :h4, :w4]
    assert pack.dtype == np.uint8
    cent = pack[:2].astype(np.int32)
    inst_new = cent_mod.cluster_centroids_from_basin(cent, pack[2])

    # legacy: host threshold on the fetched displacement planes
    from irn_tpu.ops.centroids import find_centroids_bounded

    cent_ref = np.asarray(
        find_centroids_bounded(
            jnp.asarray(dp), jnp.int32(h4), jnp.int32(w4), 300
        )
    )[:, :h4, :w4]
    np.testing.assert_array_equal(cent, cent_ref)
    inst_old = cent_mod.cluster_centroids(cent_ref, dp[:, :h4, :w4])
    np.testing.assert_array_equal(inst_new, inst_old)


def test_device_seeds_match_host_seeds(rng):
    """propagate_all fed device-built seed rows (_seed_build: C cam rows x
    K uint8 masks, bucket dims) decodes bit-identically to the host dense
    K*C seed path — fused AND chunked."""
    from irn_tpu.ops import centroids as cent_mod
    from irn_tpu.pipeline.stages_irn import _seed_build

    base = dict(rw_grid_cap=16, exp_times=3, rw_radius=2)
    h4, w4 = 14, 12
    ch = cw = 16
    size = (54, 46)
    edge = np.ones((16, 16), np.float32)
    edge[:h4, :w4] = rng.random((h4, w4)).astype(np.float32)
    cams = rng.random((3, h4, w4)).astype(np.float32)
    masks = (rng.random((4, h4, w4)) < 0.4).astype(np.uint8)  # K=4

    host_seeds = cent_mod.mask_scores_by_instance(
        cams, masks.astype(bool)
    )  # [12, h4, w4]
    camp = np.zeros((3, ch, cw), np.float32)
    camp[:, :h4, :w4] = cams
    maskp = np.zeros((4, ch, cw), np.uint8)
    maskp[:, :h4, :w4] = masks
    dev_seeds = _seed_build(jnp.asarray(camp), jnp.asarray(maskp))
    assert dev_seeds.shape == (12, ch, cw)

    for n_rows in (16, 4):  # fused, then 3-chunk streaming
        w = RandomWalkRunner(Config(**base), n_seed_rows=n_rows)
        lh, bh = w.propagate_all(
            host_seeds, jnp.asarray(edge), h4, w4, size, 0.25
        )
        ld, bd = w.propagate_all(
            dev_seeds, jnp.asarray(edge), h4, w4, size, 0.25
        )
        np.testing.assert_array_equal(np.asarray(lh), np.asarray(ld))
        np.testing.assert_array_equal(np.asarray(bh), np.asarray(bd))


def test_packed_walk_matches_unpacked(rng):
    """packed=True (uint16 pack fused into the walk/decode program) must
    round-trip to exactly the unpacked (labels, best) pair — fused AND
    chunked paths."""
    from irn_tpu.pipeline.stages_irn import _walk_unpack_np

    base = dict(rw_grid_cap=16, exp_times=3, rw_radius=2)
    h4, w4 = 14, 12
    size = (54, 46)
    edge = np.ones((16, 16), np.float32)
    edge[:h4, :w4] = rng.random((h4, w4)).astype(np.float32)
    seeds = rng.random((10, h4, w4)).astype(np.float32)

    for n_rows in (16, 4):
        w = RandomWalkRunner(Config(**base), n_seed_rows=n_rows)
        labels, best = w.propagate_all(
            seeds, jnp.asarray(edge), h4, w4, size, 0.25
        )
        lp, bp = _walk_unpack_np(np.asarray(w.propagate_all(
            seeds, jnp.asarray(edge), h4, w4, size, 0.25, packed=True
        )))
        np.testing.assert_array_equal(np.asarray(labels), lp)
        np.testing.assert_array_equal(np.asarray(best), bp)


def test_with_advect_matches_separate_programs(rng):
    """EdgeDisplacementRunner.with_advect (forward + advection in one
    program) must equal __call__ followed by the standalone advect pack
    program bit-for-bit."""
    from irn_tpu.pipeline.stages_irn import _advect_pack_program

    cfg = Config(rw_grid_cap=16)
    variables = _tiny_irn_variables()
    runner = EdgeDisplacementRunner(cfg, variables)
    img = (rng.random((54, 46, 3)) * 255).astype(np.uint8)

    edge_a, dp, (h4, w4) = runner(img, (54, 46))
    pack_a = np.asarray(
        _advect_pack_program()(dp, jnp.int32(h4), jnp.int32(w4))
    )
    edge_b, pack_b, (h4b, w4b) = runner.with_advect(img, (54, 46))
    assert (h4, w4) == (h4b, w4b)
    np.testing.assert_array_equal(np.asarray(edge_a), np.asarray(edge_b))
    assert np.asarray(pack_b).dtype == np.uint8
    np.testing.assert_array_equal(pack_a, np.asarray(pack_b))


def test_with_cluster_matches_separate_programs(rng):
    """EdgeDisplacementRunner.with_cluster (forward + advection + device
    CCL in one program) must equal __call__ followed by the standalone
    cluster pack program bit-for-bit."""
    from irn_tpu.pipeline.stages_irn import _cluster_pack_program

    cfg = Config(rw_grid_cap=16)
    variables = _tiny_irn_variables()
    runner = EdgeDisplacementRunner(cfg, variables)
    img = (rng.random((54, 46, 3)) * 255).astype(np.uint8)

    edge_a, dp, (h4, w4) = runner(img, (54, 46))
    masks_a, n_a = _cluster_pack_program(cfg.ins_cluster_cap)(
        dp, jnp.int32(h4), jnp.int32(w4)
    )
    edge_b, masks_b, n_b, (h4b, w4b) = runner.with_cluster(img, (54, 46))
    assert (h4, w4) == (h4b, w4b)
    np.testing.assert_array_equal(np.asarray(edge_a), np.asarray(edge_b))
    assert np.asarray(masks_b).dtype == np.uint8
    np.testing.assert_array_equal(np.asarray(masks_a), np.asarray(masks_b))
    assert int(n_a) == int(n_b)


def test_cluster_pack_matches_host_clustering(rng):
    """The device cluster program (advection + basin CCL, ops/ccl_tpu)
    must produce the host flow's instance masks exactly: same advected
    centroids -> same basin predicate -> same components, same id order —
    on a displacement field with REAL multi-basin structure (three
    attractors; a random-init net's field is degenerate, ROADMAP)."""
    from irn_tpu.ops import centroids as cent_mod
    from irn_tpu.pipeline.stages_irn import (
        _advect_pack_program,
        _cluster_pack_program,
    )

    h4, w4, cap = 27, 22, 32
    yy, xx = np.mgrid[:cap, :cap].astype(np.float32)
    dp = np.zeros((2, cap, cap), np.float32)
    # three attractors: dp points toward the nearest one, shrinking as it
    # converges, so |dp| < 2.5 near each (a real basin per attractor)
    pts = [(6.0, 5.0), (20.0, 16.0), (8.0, 18.0)]
    d2 = np.stack([(yy - py) ** 2 + (xx - px) ** 2 for py, px in pts])
    nearest = np.argmin(d2, axis=0)
    # gain 0.8 -> basin radius 2.5 / 0.8 ~ 3.1 cells: the three disks
    # stay disjoint (attractors are >= 12 apart), one component each
    for j, (py, px) in enumerate(pts):
        sel = nearest == j
        dp[0][sel] = 0.8 * (py - yy[sel])
        dp[1][sel] = 0.8 * (px - xx[sel])
    k_cap = 8
    masks, n_found = _cluster_pack_program(k_cap)(
        jnp.asarray(dp), jnp.int32(h4), jnp.int32(w4)
    )
    masks, n_found = np.asarray(masks), int(n_found)

    pack = np.asarray(_advect_pack_program()(
        jnp.asarray(dp), jnp.int32(h4), jnp.int32(w4)
    ))[:, :h4, :w4]
    inst = cent_mod.cluster_centroids_from_basin(
        pack[:2].astype(np.int32), pack[2]
    )
    k = inst.shape[0]
    assert k >= 3  # the attractors actually produced distinct clusters
    assert n_found == k
    np.testing.assert_array_equal(masks[:k, :h4, :w4], inst)
    assert not masks[k:].any()
    assert not masks[:, h4:, :].any() and not masks[:, :, w4:].any()


def test_make_ins_seg_ccl_matches_host_stage(tmp_path, rng):
    """Stage-level A/B: make_ins_seg_labels with the device-CCL flow
    (ins_device_ccl=True, the default) must write byte-identical
    detection dicts to the host-union-find flow — including with a
    cluster cap of 1, where any multi-cluster image exercises the
    overflow fallback end-to-end."""
    from irn_tpu.pipeline.stages_irn import make_ins_seg_labels

    cfg = _stage_tree(tmp_path, rng)
    outs = {}
    for tag, kw in {
        "host": dict(ins_device_ccl=False),
        "ccl": dict(ins_device_ccl=True),
        "ccl1": dict(ins_device_ccl=True, ins_cluster_cap=1),
        # device component split disabled (labels fetch + host tail) and
        # comp_cap=1 (any multi-component image exercises the monosplit
        # overflow fallback end-to-end)
        "nosplit": dict(ins_device_ccl=True, ins_comp_cap=0),
        "comp1": dict(ins_device_ccl=True, ins_comp_cap=1),
    }.items():
        c = dataclasses.replace(
            cfg, ins_seg_out_dir=str(tmp_path / ("ins_" + tag)), **kw
        )
        make_ins_seg_labels(c)
        outs[tag] = {
            n: np.load(
                os.path.join(c.ins_seg_out_dir, n + ".npy"),
                allow_pickle=True,
            ).item()
            for n in voc12.load_img_name_list(cfg.train_list)
        }
    for tag in ("ccl", "ccl1", "nosplit", "comp1"):
        for n, want in outs["host"].items():
            got = outs[tag][n]
            assert got["size"] == want["size"], (tag, n)
            np.testing.assert_array_equal(
                got["class"], want["class"], err_msg=f"{tag}/{n}"
            )
            np.testing.assert_array_equal(
                got["mask"], want["mask"], err_msg=f"{tag}/{n}"
            )
            np.testing.assert_allclose(
                got["score"], want["score"], rtol=0, atol=0,
                err_msg=f"{tag}/{n}",
            )


def test_u8_walk_matches_unpacked(rng):
    """packed="u8" (labels-only uint8 fetch, the make_sem_seg transport)
    must equal the unpacked labels exactly — values are bounded by the
    seed-row count, so the cast is lossless."""
    base = dict(rw_grid_cap=16, exp_times=3, rw_radius=2)
    h4, w4 = 14, 12
    size = (54, 46)
    edge = np.ones((16, 16), np.float32)
    edge[:h4, :w4] = rng.random((h4, w4)).astype(np.float32)
    cams = rng.random((5, h4, w4)).astype(np.float32)

    w = RandomWalkRunner(Config(**base), n_seed_rows=20)
    labels, _ = w(cams, jnp.asarray(edge), h4, w4, size, 0.25)
    lu8 = np.asarray(
        w(cams, jnp.asarray(edge), h4, w4, size, 0.25, packed="u8")
    )
    assert lu8.dtype == np.uint8
    np.testing.assert_array_equal(np.asarray(labels), lu8)


def test_propagate_fused_matches_separate(rng):
    """propagate_fused (seed build + edge crop + row pad + walk + meta
    pack in ONE program) must equal the separate-program flow
    (_seed_build_cropped -> propagate_all) byte-for-byte: the fused seed
    multiply is the same f32 elementwise op, so fusion cannot change a
    bit of the packed fetch."""
    from irn_tpu.pipeline.stages_irn import _seed_build_cropped

    base = dict(rw_grid_cap=16, exp_times=3, rw_radius=2)
    h4, w4, cap, k_cap, c_pad = 14, 12, 16, 4, 2
    size = (54, 46)
    w = RandomWalkRunner(Config(**base), n_seed_rows=32)
    ch, cw = w._bucket(h4), w._bucket(w4)

    edge = np.ones((cap, cap), np.float32)
    edge[:h4, :w4] = rng.random((h4, w4)).astype(np.float32)
    edge_dev = jnp.asarray(edge)
    masks = np.zeros((k_cap, cap, cap), np.uint8)
    masks[0, 2:7, 3:8] = 1
    masks[1, 8:13, 1:6] = 1
    masks[2, 1:5, 8:11] = 1  # rank 3 left empty (padded mask row)
    masks_dev = jnp.asarray(masks)
    camp = np.zeros((c_pad, ch, cw), np.float32)
    camp[:, :h4, :w4] = rng.random((c_pad, h4, w4)).astype(np.float32)
    meta = jnp.int32(3)

    fused = np.asarray(w.propagate_fused(
        camp, masks_dev, edge_dev, h4, w4, size, 0.25, meta=meta
    ))
    seeds = _seed_build_cropped(jnp.asarray(camp), masks_dev)
    sep = np.asarray(w.propagate_all(
        seeds, edge_dev, h4, w4, size, 0.25, packed=True, meta=meta
    ))
    np.testing.assert_array_equal(fused, sep)


def test_propagate_monolith_matches_split_flow(rng):
    """propagate_monolith (forward + advection + CCL + seed build + walk
    + meta pack, ONE program fed by ONE packed uint8 blob) must equal
    with_cluster followed by propagate_fused byte-for-byte — including
    the f32 cam rows surviving the uint8 bitcast transport exactly."""
    cfg = Config(rw_grid_cap=16, exp_times=3, rw_radius=2,
                 ins_cluster_cap=4)
    variables = _tiny_irn_variables()
    runner = EdgeDisplacementRunner(cfg, variables)
    walker = RandomWalkRunner(Config(
        rw_grid_cap=16, exp_times=3, rw_radius=2
    ), n_seed_rows=32)
    img = (rng.random((54, 46, 3)) * 255).astype(np.uint8)
    size = (54, 46)
    h4, w4 = 14, 12
    ch, cw = walker._bucket(h4), walker._bucket(w4)
    c_pad = 2
    camp = np.zeros((c_pad, ch, cw), np.float32)
    camp[:, :h4, :w4] = rng.random((c_pad, h4, w4)).astype(np.float32)

    edge, masks_dev, n_found_dev, (h4b, w4b) = runner.with_cluster(
        img, size
    )
    assert (h4b, w4b) == (h4, w4)
    split = np.asarray(walker.propagate_fused(
        camp, masks_dev, edge, h4, w4, size, 0.25, meta=n_found_dev
    ))
    mono = np.asarray(walker.propagate_monolith(
        runner, img, camp, size, 0.25, split=False
    ))
    np.testing.assert_array_equal(mono, split)


def test_propagate_monolith_pair_matches_singles(rng):
    """propagate_monolith_pair_packed (two same-bucket images traced
    through one program, one stacked fetch) must reproduce each image's
    single-monolith pack byte-for-byte — the pair is a transport fold
    (1 dispatch + 1 fetch per pair vs per image), not a math change.
    True sizes differ inside the shared bucket to pin that they ride as
    traced scalars."""
    from irn_tpu.pipeline.stages_irn import monolith_pack

    cfg = Config(rw_grid_cap=16, exp_times=3, rw_radius=2,
                 ins_cluster_cap=4, ins_comp_cap=6)
    variables = _tiny_irn_variables()
    runner = EdgeDisplacementRunner(cfg, variables)
    walker = RandomWalkRunner(cfg, n_seed_rows=32)
    sizes = [(54, 46), (50, 42)]  # both bucket to the same (ch, cw)
    c_pad = 2
    blobs, singles = [], []
    for size in sizes:
        h4 = (size[0] - 1) // 4 + 1
        w4 = (size[1] - 1) // 4 + 1
        ch, cw = walker._bucket(h4), walker._bucket(w4)
        img = (rng.random(size + (3,)) * 255).astype(np.uint8)
        camp = np.zeros((c_pad, ch, cw), np.float32)
        camp[:, :h4, :w4] = rng.random((c_pad, h4, w4)).astype(np.float32)
        blobs.append(monolith_pack(runner, img, camp))
        singles.append(np.asarray(walker.propagate_monolith(
            runner, img, camp, size, 0.25
        )))
    pair = np.asarray(walker.propagate_monolith_pair_packed(
        runner, jnp.asarray(np.stack(blobs)), sizes[0], sizes[1], 0.25
    ))
    np.testing.assert_array_equal(pair[0], singles[0])
    np.testing.assert_array_equal(pair[1], singles[1])


def test_sem_monolith_matches_split_flow(rng):
    """propagate_sem_monolith_packed (forward + walk + decode + u8 pack,
    ONE program fed by one packed blob) must equal the split flow
    (runner._run forward, then the packed="u8" walk) byte-for-byte —
    the f32 cam rows survive the uint8 bitcast transport exactly, and
    the monolith's pow2 zero cam rows pad identically to the split
    path's device row pad."""
    from irn_tpu.pipeline.stages_irn import _pow2_ge, monolith_pack

    cfg = Config(rw_grid_cap=16, exp_times=3, rw_radius=2)
    variables = _tiny_irn_variables()
    runner = EdgeDisplacementRunner(cfg, variables)
    walker = RandomWalkRunner(cfg, n_seed_rows=20)
    size = (54, 46)
    h4, w4 = 14, 12
    img = (rng.random(size + (3,)) * 255).astype(np.uint8)
    cams = rng.random((3, h4, w4)).astype(np.float32)

    cap_px = runner.cap * 4
    imgp = np.zeros((cap_px, cap_px, 3), np.uint8)
    imgp[: size[0], : size[1]] = img
    edge, _ = runner._run(
        jnp.asarray(imgp), jnp.int32(size[0]), jnp.int32(size[1]),
        jnp.int32(h4), jnp.int32(w4),
    )
    split = np.asarray(walker(
        cams, edge, h4, w4, size, 0.25, packed="u8"
    ))

    ch, cw = walker._bucket(h4), walker._bucket(w4)
    camp = np.zeros((_pow2_ge(cams.shape[0]), ch, cw), np.float32)
    camp[: cams.shape[0], :h4, :w4] = cams
    mono = np.asarray(walker.propagate_sem_monolith_packed(
        runner, jnp.asarray(monolith_pack(runner, img, camp)),
        size[0], size[1], size, 0.25,
    ))
    assert mono.dtype == np.uint8
    np.testing.assert_array_equal(mono, split)


def test_propagate_monolith_split_matches_host_tail(rng):
    """The monolith SPLIT variant (device component split + score
    reduction, ops/ccl_tpu.component_tables fused after the walk) must
    reproduce the host decode tail run on the labels pack: same component
    ids, seed rows, sizes, and bitwise-equal f32 max scores — exactly
    what _finish_monosplit consumes in place of detect_and_save's
    split_components + np.maximum.at."""
    from irn_tpu.ops.centroids import split_components
    from irn_tpu.pipeline.stages_irn import (
        _split_unpack_np,
        _walk_unpack_meta_np,
    )

    cfg = Config(rw_grid_cap=16, exp_times=3, rw_radius=2,
                 ins_cluster_cap=4)
    variables = _tiny_irn_variables()
    runner = EdgeDisplacementRunner(cfg, variables)
    walker = RandomWalkRunner(Config(
        rw_grid_cap=16, exp_times=3, rw_radius=2
    ), n_seed_rows=32)
    img = (rng.random((54, 46, 3)) * 255).astype(np.uint8)
    size = (54, 46)
    h4, w4 = 14, 12
    ch, cw = walker._bucket(h4), walker._bucket(w4)
    c_pad = 2
    camp = np.zeros((c_pad, ch, cw), np.float32)
    camp[:, :h4, :w4] = rng.random((c_pad, h4, w4)).astype(np.float32)

    labels, best, n_found = _walk_unpack_meta_np(np.asarray(
        walker.propagate_monolith(runner, img, camp, size, 0.25,
                                  split=False)
    ))
    comp_map, rows, sizes, scores, n_comp, meta = _split_unpack_np(
        np.asarray(walker.propagate_monolith(
            runner, img, camp, size, 0.25, split=True
        )),
        walker.comp_cap,
    )
    assert meta == n_found
    h_map, h_rows, h_sizes = split_components(
        labels, c_pad * runner.cluster_cap
    )
    k = h_rows.shape[0]
    h_scores = np.zeros(k + 1, np.float32)
    np.maximum.at(h_scores, h_map.reshape(-1), best.reshape(-1))
    assert n_comp == k
    np.testing.assert_array_equal(comp_map, h_map)
    np.testing.assert_array_equal(rows[:k], h_rows)
    np.testing.assert_array_equal(sizes[:k], h_sizes)
    np.testing.assert_array_equal(scores[:k], h_scores[1:])
