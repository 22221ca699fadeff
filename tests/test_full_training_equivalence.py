"""Full-training-run equivalence vs the torch reference.

test_train_step_parity pins 2-3 optimizer steps; this runs the reference's
*training loops* to completion — the body of step/train_cam.py:73-101
(2 epochs x 4 steps; the per-epoch validate() is elided: a no-grad forward
with no parameter effect) and step/train_irn.py:49-107 INCLUDING the
post-training displacement-mean calibration pass — on torch-CPU against
irn_tpu's production trainers over identical precomputed batch streams
(both data pipelines bypassed; batches fed directly), float64. Final
checkpoints are diffed parameter-by-parameter and the per-step loss
trajectories compared, so the poly schedule's indexing across epoch
boundaries, weight-decay accumulation, and the calibration statistics are
all pinned end-of-schedule, not just at step 3.

The torch side computes its affinity masks with the reference's own
GetAffinityLabelFromIndices (voc12/dataloader.py:80-106, fed the reduced
label map exactly as VOC12AffinityDataset does at dataloader.py:269-271)
while ours uses the production on-device ``affinity_labels_2d`` — closing
the label-extraction seam no other test crosses.

A final test loads each framework's *trained* weights into its own
make_cam / make_sem_seg stages over a synthetic VOC tree and diffs the
downstream artifacts, closing the seam between "training matches" and
"what training feeds downstream matches".

Documented divergence from production scale: crop 64 (stride-4 grid 16^2)
and PathIndex radius 5 instead of 512/radius 10 — radius 10 requires a
grid wider than 20 (cropped_width = W - 2*radius_floor, indexing.py:63);
the geometry machinery is scale-independent and the radius-10 figures are
pinned in test_paths.py.
"""

import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

from conftest import REFERENCE_ROOT, requires_reference

torch = pytest.importorskip("torch")

pytestmark = [pytest.mark.slow, requires_reference]

CROP = 64          # stride-4 grid 16x16
RADIUS = 5
N_IMAGES, BS, EPOCHS = 8, 2, 2
STEPS_PER_EPOCH = N_IMAGES // BS   # drop_last exact: 4
MAX_STEP = STEPS_PER_EPOCH * EPOCHS
LR, WD = 0.1, 1e-4


@pytest.fixture(scope="module")
def ref_mods():
    sys.path.insert(0, REFERENCE_ROOT)
    from net import resnet50 as ref_resnet50

    def fake_load_url(url):
        m = ref_resnet50.ResNet(ref_resnet50.Bottleneck, [3, 4, 6, 3])
        g = torch.Generator().manual_seed(7)
        sd = m.state_dict()
        for k in sd:
            t = sd[k]
            if k.endswith("running_var"):
                sd[k] = torch.rand(t.shape, generator=g) + 0.5
            elif t.dtype.is_floating_point:
                sd[k] = torch.randn(t.shape, generator=g) * 0.05
        sd["fc.weight"] = torch.zeros(1000, 2048)
        sd["fc.bias"] = torch.zeros(1000)
        return sd

    ref_resnet50.model_zoo.load_url = fake_load_url
    import test_reference_stage_diff as refdiff

    refdiff._stub_pydensecrf()  # misc/imutils.py imports it at module scope
    from misc import indexing, torchutils
    from net import resnet50_cam, resnet50_irn

    # voc12/dataloader.py np.loads voc12/cls_labels.npy relative to the
    # CWD at import time; shim it to reach GetAffinityLabelFromIndices
    import tempfile

    shim = tempfile.mkdtemp()
    os.makedirs(os.path.join(shim, "voc12"), exist_ok=True)
    np.save(
        os.path.join(shim, "voc12", "cls_labels.npy"),
        {2007000000: np.zeros(20, np.float32)},
    )
    cwd = os.getcwd()
    os.chdir(shim)
    try:
        from voc12 import dataloader as ref_dataloader
    finally:
        os.chdir(cwd)

    yield SimpleNamespace(
        cam_mod=resnet50_cam,
        irn_mod=resnet50_irn,
        torchutils=torchutils,
        indexing=indexing,
        dataloader=ref_dataloader,
    )
    sys.path.remove(REFERENCE_ROOT)


def _stream_rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    from irn_tpu.data import synthetic

    root = str(tmp_path_factory.mktemp("train_equiv") / "voc")
    train_list, _ = synthetic.generate(
        root, n_images=3, size=52, max_side_jitter=10, seed=11
    )
    return SimpleNamespace(root=root, train=train_list)


def _tree_batches(tree, rng, n_steps):
    """Batch stream drawn from the synthetic tree's own images and labels
    (normalized, zero-padded to CROP^2 as the reference's padding crop
    does, imutils.py:95-117). Training on the tree itself keeps the tiny
    schedule non-degenerate: a stream of random labels pushes every class
    logit negative and the ReLU'd CAMs identically zero, whereupon the
    downstream decode compares our exact zeros against the reference's
    0/0=NaN argmax — a pathological-input artifact, not fidelity."""
    import imageio.v2 as imageio

    from irn_tpu.data import voc12

    names = voc12.load_img_name_list(tree.train)
    label_dict = voc12.load_label_dict(tree.root + "/cls_labels.npy")
    mean = np.array([0.485, 0.456, 0.406])
    std = np.array([0.229, 0.224, 0.225])
    pool_img, pool_lab = [], []
    for name in names:
        img = np.asarray(
            imageio.imread(
                os.path.join(tree.root, "JPEGImages", name + ".jpg")
            )
        ).astype(np.float64)
        norm = (img / 255.0 - mean) / std
        pad = np.zeros((CROP, CROP, 3), np.float64)
        pad[: norm.shape[0], : norm.shape[1]] = norm
        pool_img.append(pad.transpose(2, 0, 1))
        pool_lab.append(label_dict[name].astype(np.float64))
    idx = rng.integers(0, len(pool_img), size=(n_steps, BS))
    imgs = np.stack(
        [[pool_img[j] for j in row] for row in idx]
    )
    labels = np.stack([[pool_lab[j] for j in row] for row in idx])
    return imgs, labels


@pytest.fixture(scope="module")
def cam_trained(ref_mods, tree):
    """Train the reference CAM net (train_cam.py:56-101 body) and our
    production trainer on the identical batch stream; returns both."""
    import jax

    with jax.enable_x64(True):
        import jax.numpy as jnp

        from irn_tpu.models.cam import CAMNet
        from irn_tpu.train import cam_train, optim
        from irn_tpu.train.state import create_train_state
        from irn_tpu.utils.weights import convert_cam_net

        imgs, labels = _tree_batches(tree, _stream_rng(), MAX_STEP)

        # --- reference full schedule ---
        torch.manual_seed(1234)  # head init draws from the global rng
        model = ref_mods.cam_mod.Net().double()
        model.train()
        init_sd = {k: v.clone() for k, v in model.state_dict().items()}
        pg = model.trainable_parameters()
        opt = ref_mods.torchutils.PolyOptimizer(
            [
                {"params": pg[0], "lr": LR, "weight_decay": WD},
                {"params": pg[1], "lr": 10 * LR, "weight_decay": WD},
            ],
            lr=LR, weight_decay=WD, max_step=MAX_STEP,
        )
        ref_losses = []
        for ep in range(EPOCHS):
            for step in range(STEPS_PER_EPOCH):
                s = ep * STEPS_PER_EPOCH + step
                x = torch.from_numpy(imgs[s])
                y = torch.from_numpy(labels[s])
                loss = torch.nn.functional.multilabel_soft_margin_loss(
                    model(x), y
                )
                ref_losses.append(float(loss))
                opt.zero_grad()
                loss.backward()
                opt.step()
            # train_cam.py:97 validate(): no-grad forward only — zero
            # parameter effect (Net.train() even ignores the mode flag,
            # resnet50_cam.py:39-43), elided.

        # --- ours: the production trainer on the same stream ---
        variables = jax.tree.map(
            lambda x: np.asarray(x, np.float64), convert_cam_net(init_sd)
        )
        ours = CAMNet(dtype=jnp.float64)
        tx = optim.poly_sgd(
            LR, max_step=MAX_STEP, power=0.9, weight_decay=WD,
            momentum=1e-4, mult_fn=optim.cam_lr_mult,
        )
        state = create_train_state(variables, tx)
        train_step = cam_train.make_train_step(ours, tx)
        our_losses = []
        for s in range(MAX_STEP):
            state, metrics = train_step(
                state, jnp.asarray(np.transpose(imgs[s], (0, 2, 3, 1))),
                jnp.asarray(labels[s]),
            )
            our_losses.append(float(metrics["loss"]))

        want = convert_cam_net({k: v for k, v in model.state_dict().items()})
        return SimpleNamespace(
            ref_model=model, ref_params=want, state=state,
            ref_losses=ref_losses, our_losses=our_losses,
        )


@pytest.fixture(scope="module")
def irn_trained(ref_mods, tree):
    """Train the reference AffinityDisplacementLoss (train_irn.py:10-110
    body, calibration included) and our production trainer on the
    identical batch stream; the torch masks come from the reference's
    GetAffinityLabelFromIndices, ours from affinity_labels_2d."""
    import jax

    with jax.enable_x64(True):
        import jax.numpy as jnp

        from irn_tpu.models.irn import IRNet
        from irn_tpu.train import irn_train, optim
        from irn_tpu.train.state import create_train_state
        from irn_tpu.utils.weights import convert_irn_net

        grid = CROP // 4
        rng = _stream_rng()
        imgs, _ = _tree_batches(tree, rng, MAX_STEP)
        reds = rng.choice(
            np.array([0, 1, 2, 255], np.int64),
            size=(MAX_STEP, BS, grid, grid), p=[0.4, 0.25, 0.25, 0.1],
        )
        cal_imgs, _ = _tree_batches(tree, rng, 2)

        # --- reference full schedule + calibration ---
        path_index = ref_mods.indexing.PathIndex(
            radius=RADIUS, default_size=(grid, grid)
        )
        extract = ref_mods.dataloader.GetAffinityLabelFromIndices(
            path_index.src_indices, path_index.dst_indices
        )
        torch.manual_seed(4321)  # decoder inits draw from the global rng
        model = ref_mods.irn_mod.AffinityDisplacementLoss(
            path_index
        ).double()
        model.train()
        init_sd = {k: v.clone() for k, v in model.state_dict().items()}
        pg = model.trainable_parameters()
        opt = ref_mods.torchutils.PolyOptimizer(
            [
                {"params": pg[0], "lr": LR, "weight_decay": WD},
                {"params": pg[1], "lr": 10 * LR, "weight_decay": WD},
            ],
            lr=LR, weight_decay=WD, max_step=MAX_STEP,
        )
        ref_losses = []
        for s in range(MAX_STEP):
            # VOC12AffinityDataset runs the extractor per sample in the
            # workers (dataloader.py:269-271); stack into the batch
            tb, tf, tn = (
                torch.stack(ms).double()
                for ms in zip(*(extract(r) for r in reds[s]))
            )
            pos_l, neg_l, fg_l, bg_l = model(torch.from_numpy(imgs[s]), True)
            bg_pos = torch.sum(tb * pos_l) / (torch.sum(tb) + 1e-5)
            fg_pos = torch.sum(tf * pos_l) / (torch.sum(tf) + 1e-5)
            pos = bg_pos / 2 + fg_pos / 2
            neg = torch.sum(tn * neg_l) / (torch.sum(tn) + 1e-5)
            fg = torch.sum(fg_l * tf.unsqueeze(1)) / (
                2 * torch.sum(tf) + 1e-5
            )
            bg = torch.sum(bg_l * tb.unsqueeze(1)) / (
                2 * torch.sum(tb) + 1e-5
            )
            total = (pos + neg) / 2 + (fg + bg) / 2
            ref_losses.append(float(total))
            opt.zero_grad()
            total.backward()
            opt.step()
        # calibration (train_irn.py:87-107): eval-mode forwards, per-batch
        # channel means, running_mean <- mean of batch means. MeanShift
        # subtracts the zero-initialized running_mean here, a no-op.
        model.eval()
        dp_means = []
        with torch.no_grad():
            for batch in cal_imgs:
                _, dp = model(torch.from_numpy(batch), False)
                dp_means.append(torch.mean(dp, dim=(0, 2, 3)))
        model.mean_shift.running_mean = torch.mean(
            torch.stack(dp_means), dim=0
        )

        # --- ours: the production trainer + calibration helpers ---
        variables = jax.tree.map(
            lambda x: np.asarray(x, np.float64), convert_irn_net(init_sd)
        )
        ours = IRNet(dtype=jnp.float64)
        tx = optim.poly_sgd(
            LR, max_step=MAX_STEP, power=0.9, weight_decay=WD,
            momentum=1e-4, mult_fn=optim.irn_lr_mult,
        )
        state = create_train_state(variables, tx)
        geom = irn_train.build_train_geometry(CROP, RADIUS)
        train_step = irn_train.make_train_step(ours, tx, geom)
        our_losses = []
        for s in range(MAX_STEP):
            state, metrics = train_step(
                state, jnp.asarray(np.transpose(imgs[s], (0, 2, 3, 1))),
                jnp.asarray(reds[s]),
            )
            our_losses.append(float(metrics["loss"]))
        dp_mean_step = irn_train.make_dp_mean_step(ours)
        batch_means = [
            dp_mean_step(state, jnp.asarray(np.transpose(b, (0, 2, 3, 1))))
            for b in cal_imgs
        ]
        state = irn_train.calibrate_mean_shift(state, batch_means)

        want = convert_irn_net({k: v for k, v in model.state_dict().items()})
        return SimpleNamespace(
            ref_model=model, ref_params=want, state=state,
            ref_losses=ref_losses, our_losses=our_losses,
        )


def _assert_params_close(want_params, got_params, atol):
    import jax

    flat_w = jax.tree_util.tree_flatten_with_path(want_params)[0]
    flat_g = dict(jax.tree_util.tree_flatten_with_path(got_params)[0])
    assert flat_w and len(flat_w) == len(flat_g)
    worst = 0.0
    for path, w in flat_w:
        g = np.asarray(flat_g[path], np.float64)
        w = np.asarray(w, np.float64)
        worst = max(worst, float(np.abs(g - w).max()))
        np.testing.assert_allclose(
            g, w, atol=atol, rtol=1e-5, err_msg=jax.tree_util.keystr(path)
        )
    return worst


def test_cam_full_training_equivalence(cam_trained):
    # per-step losses pin the schedule indexing across the epoch boundary
    np.testing.assert_allclose(
        cam_trained.our_losses, cam_trained.ref_losses, rtol=1e-7, atol=1e-9
    )
    # eager-CPU f64 agreement is exact; the jitted step adds XLA FMA/
    # reassociation noise ~1e-9/step (see test_train_step_parity.py) —
    # 8 steps gets 2.7x test_train_step_parity's 3-step budget
    worst = _assert_params_close(
        cam_trained.ref_params["params"], cam_trained.state.params,
        atol=1.5e-7,
    )
    print(f"cam full-run param drift after {MAX_STEP} steps: {worst:.2e}")


def test_irn_full_training_equivalence(irn_trained):
    np.testing.assert_allclose(
        irn_trained.our_losses, irn_trained.ref_losses, rtol=1e-7, atol=1e-9
    )
    worst = _assert_params_close(
        irn_trained.ref_params["params"], irn_trained.state.params,
        atol=1.5e-7,
    )
    print(f"irn full-run param drift after {MAX_STEP} steps: {worst:.2e}")


def test_irn_calibration_equivalence(irn_trained):
    """The displacement-mean calibration statistic (train_irn.py:95-107)
    written into the checkpoint matches bitwise-closely."""
    ref_mean = irn_trained.ref_model.mean_shift.running_mean.numpy()
    got = np.asarray(irn_trained.state.stats["dp_mean"], np.float64)
    np.testing.assert_allclose(got, ref_mean, atol=1e-7, rtol=1e-6)


@pytest.fixture(scope="module")
def downstream(ref_mods, tree, cam_trained, irn_trained, tmp_path_factory):
    """Each framework's trained weights through its own make_cam +
    make_sem_seg over the synthetic VOC tree they trained on (the loop
    bodies of step/make_cam.py:26-56 and make_sem_seg_labels.py:28-51 on
    torch-CPU for the reference side, as in test_reference_stage_diff)."""
    import test_reference_stage_diff as refdiff

    from irn_tpu.data import voc12
    from irn_tpu.pipeline import stages_cam, stages_irn
    from irn_tpu.pipeline.config import Config
    from irn_tpu.utils import checkpoint as ckpt

    work = tmp_path_factory.mktemp("train_equiv_downstream")
    root = tree.root
    train_list = tree.train
    names = voc12.load_img_name_list(train_list)
    labels = voc12.load_label_dict(root + "/cls_labels.npy")

    def to_f32(tree_):
        import jax

        return jax.tree.map(
            lambda x: np.asarray(x, np.float32)
            if np.issubdtype(np.asarray(x).dtype, np.floating)
            else np.asarray(x),
            tree_,
        )

    cam_w = str(work / "cam.ckpt")
    irn_w = str(work / "irn.ckpt")
    ckpt.save_checkpoint(cam_w, to_f32(cam_trained.state.variables))
    ckpt.save_checkpoint(irn_w, to_f32(irn_trained.state.variables))

    scales = (1.0, 0.5)
    cfg = Config(
        voc12_root=root, train_list=train_list, infer_list=train_list,
        cls_labels_path=root + "/cls_labels.npy",
        cam_scales=scales, cam_weights_name=cam_w, irn_weights_name=irn_w,
        cam_out_dir=str(work / "cam_ours"),
        sem_seg_out_dir=str(work / "sem_ours"),
        rw_grid_cap=16, pad_multiple=16,
    ).resolve()
    os.makedirs(cfg.cam_out_dir, exist_ok=True)
    stages_cam.make_cam(cfg)
    # degenerate all-zero CAMs would make the sem decode compare our exact
    # zeros against the reference's 0/0=NaN argmax (torch picks NaN as the
    # max) — a pathological-input artifact; fail loudly here instead
    for name in names:
        d = np.load(
            os.path.join(cfg.cam_out_dir, name + ".npy"), allow_pickle=True
        ).item()
        assert float(np.max(d["cam"])) > 1e-3, (
            f"degenerate trained CAM for {name}; adjust the training stream"
        )
    stages_irn.make_sem_seg_labels(cfg)

    # reference side: f32 nets carrying its own trained weights. The CAM
    # inference subclass shares Net's parameters (resnet50_cam.py:50);
    # EdgeDisplacement loads the training checkpoint strict=False exactly
    # as make_sem_seg_labels.py:59 does (path_indices buffers dropped).
    refdiff._stub_pydensecrf()
    from misc import imutils as ref_imutils

    cam_net = ref_mods.cam_mod.CAM()
    cam_net.load_state_dict(
        {k: v.float() for k, v in cam_trained.ref_model.state_dict().items()}
    )
    cam_net.eval()
    ed_net = ref_mods.irn_mod.EdgeDisplacement(crop_size=CROP)
    ed_net.load_state_dict(
        {k: v.float() for k, v in irn_trained.ref_model.state_dict().items()},
        strict=False,
    )
    ed_net.eval()

    def normalize(img, mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)):
        arr = np.asarray(img)
        out = np.empty_like(arr, np.float32)
        for c in range(3):
            out[..., c] = (arr[..., c] / 255.0 - mean[c]) / std[c]
        return out

    env = SimpleNamespace(
        imutils=ref_imutils, indexing=ref_mods.indexing, normalize=normalize
    )
    ref_cam_dir = str(work / "cam_ref")
    ref_sem_dir = str(work / "sem_ref")
    orig_cuda = torch.Tensor.cuda  # indexing.py hardcodes .cuda()
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        with _patched_scales(refdiff, scales):
            refdiff._ref_make_cam(
                env, tree, names, labels, cam_net, ref_cam_dir
            )
            # both sides walk OUR cam artifacts: with tiny-schedule weights
            # the per-class walk scores are near-ties, and chaining each
            # side's ~1e-6-different cams through T^256 + global max-
            # normalization can flip a uniform image's argmax — a knife
            # edge, not a fidelity signal (see test_reference_stage_diff).
            # The cam artifacts themselves are diffed below.
            refdiff._ref_make_sem_seg(
                env, tree, names, ed_net, cfg.cam_out_dir, ref_sem_dir
            )
    finally:
        torch.Tensor.cuda = orig_cuda

    return SimpleNamespace(
        names=names, cfg=cfg, ref_cam_dir=ref_cam_dir, ref_sem_dir=ref_sem_dir
    )


from contextlib import contextmanager


@contextmanager
def _patched_scales(refdiff, scales):
    orig = refdiff.SCALES
    refdiff.SCALES = scales
    try:
        yield
    finally:
        refdiff.SCALES = orig


def test_trained_make_cam_artifact_diff(downstream):
    worst_cam = worst_hr = 0.0
    for name in downstream.names:
        ours = np.load(
            os.path.join(downstream.cfg.cam_out_dir, name + ".npy"),
            allow_pickle=True,
        ).item()
        ref = np.load(
            os.path.join(downstream.ref_cam_dir, name + ".npy"),
            allow_pickle=True,
        ).item()
        np.testing.assert_array_equal(
            np.asarray(ours["keys"]), np.asarray(ref["keys"]), err_msg=name
        )
        worst_cam = max(
            worst_cam, float(np.abs(ours["cam"] - ref["cam"]).max())
        )
        worst_hr = max(
            worst_hr, float(np.abs(ours["high_res"] - ref["high_res"]).max())
        )
    print(
        f"trained cam artifact deltas: strided {worst_cam:.2e} "
        f"highres {worst_hr:.2e}"
    )
    assert worst_cam < 3e-3, worst_cam
    assert worst_hr < 3e-3, worst_hr


def test_trained_make_sem_seg_artifact_diff(downstream):
    import imageio.v2 as imageio

    total = agree = 0
    for name in downstream.names:
        ours = np.asarray(
            imageio.imread(
                os.path.join(downstream.cfg.sem_seg_out_dir, name + ".png")
            )
        )
        ref = np.asarray(
            imageio.imread(os.path.join(downstream.ref_sem_dir, name + ".png"))
        )
        assert ours.shape == ref.shape, name
        total += ref.size
        agree += int((ours == ref).sum())
    rate = agree / total
    print(f"trained sem_seg label agreement: {rate:.6f} ({agree}/{total})")
    assert rate >= 0.99, rate
