"""Stage-level artifact diff against the reference pipeline.

Per-op parity tests pin individual kernels; this pins the *pipeline*: the
reference's make_cam and make_sem_seg computations run on torch-CPU over a
synthetic VOC tree (the loop bodies of step/make_cam.py:26-56 and
step/make_sem_seg_labels.py:28-51 with the CUDA transfers elided and the
per-GPU spawn unrolled — the stage files themselves hard-require CUDA),
with both frameworks loading weights ported from the same randomly
initialized reference nets. The artifacts our stages write are then
diffed: cam npy dicts to small map deltas, random-walk label pngs to
>= 99% pixel agreement. Measured deltas are recorded in BASELINE.md.
"""

import os
import sys
from types import SimpleNamespace

import imageio.v2 as imageio
import numpy as np
import pytest

from conftest import REFERENCE_ROOT, requires_reference

torch = pytest.importorskip("torch")

pytestmark = [pytest.mark.slow, requires_reference]

SCALES = (1.0, 0.5)


def _stub_skimage():
    """step/make_ins_seg_labels.py needs skimage.measure.label (not
    installed); scipy.ndimage.label with a 4-connectivity structure is the
    same algorithm (connectivity=1, background=0)."""
    import types

    from scipy import ndimage

    if "skimage" in sys.modules:
        return
    four = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])

    def label(x, connectivity=1, background=0):
        assert connectivity == 1 and background == 0
        return ndimage.label(np.asarray(x) != background, structure=four)[0]

    pkg = types.ModuleType("skimage")
    measure = types.ModuleType("skimage.measure")
    measure.label = label
    pkg.measure = measure
    sys.modules["skimage"] = pkg
    sys.modules["skimage.measure"] = measure


def _stub_pydensecrf():
    """misc/imutils.py imports pydensecrf at module scope; only its resize
    helpers are used here, so stub the CRF modules (not installed)."""
    import types

    if "pydensecrf" in sys.modules:
        return
    pkg = types.ModuleType("pydensecrf")
    dcrf = types.ModuleType("pydensecrf.densecrf")
    utils = types.ModuleType("pydensecrf.utils")
    utils.unary_from_labels = None
    pkg.densecrf = dcrf
    pkg.utils = utils
    sys.modules["pydensecrf"] = pkg
    sys.modules["pydensecrf.densecrf"] = dcrf
    sys.modules["pydensecrf.utils"] = utils


@pytest.fixture(scope="module")
def ref_env():
    sys.path.insert(0, REFERENCE_ROOT)
    _stub_pydensecrf()
    # misc/indexing.py hardcodes .cuda() (edge_to_affinity:99,
    # affinity_sparse2dense:127); run the oracle on CPU
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    from net import resnet50 as ref_resnet50

    def fake_load_url(url):
        m = ref_resnet50.ResNet(ref_resnet50.Bottleneck, [3, 4, 6, 3])
        g = torch.Generator().manual_seed(0)
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
    from net import resnet50_cam, resnet50_irn
    from misc import imutils as ref_imutils
    from misc import indexing as ref_indexing

    # step/make_ins_seg_labels.py imports voc12.dataloader, which np.loads
    # voc12/cls_labels.npy relative to the CWD at import time
    _stub_skimage()
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
        from step import make_ins_seg_labels as ref_ins
    finally:
        os.chdir(cwd)

    # voc12/dataloader.py np.loads cls_labels.npy at import time, so its
    # TorchvisionNormalize (dataloader.py:65-78) is restated here
    def normalize(img, mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)):
        arr = np.asarray(img)
        out = np.empty_like(arr, np.float32)
        for c in range(3):
            out[..., c] = (arr[..., c] / 255.0 - mean[c]) / std[c]
        return out

    yield SimpleNamespace(
        cam_mod=resnet50_cam,
        irn_mod=resnet50_irn,
        imutils=ref_imutils,
        indexing=ref_indexing,
        ins=ref_ins,
        normalize=normalize,
    )
    torch.Tensor.cuda = orig_cuda
    sys.path.remove(REFERENCE_ROOT)


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    from irn_tpu.data import synthetic

    root = str(tmp_path_factory.mktemp("refdiff") / "voc")
    train, val = synthetic.generate(
        root, n_images=3, size=52, max_side_jitter=10, seed=11
    )
    return SimpleNamespace(root=root, train=train)


def _read(tree, name):
    img = np.asarray(
        imageio.imread(os.path.join(tree.root, "JPEGImages", name + ".jpg"))
    )
    return img


def _ref_make_cam(env, tree, names, labels, cam_net, out_dir):
    """The body of step/make_cam.py:26-56 on CPU."""
    os.makedirs(out_dir, exist_ok=True)
    import torch.nn.functional as F

    with torch.no_grad():
        for name in names:
            img = _read(tree, name)
            size = img.shape[:2]
            strided_size = env.imutils.get_strided_size(size, 4)
            strided_up_size = env.imutils.get_strided_up_size(size, 16)
            outputs = []
            for s in SCALES:
                s_img = img if s == 1 else env.imutils.pil_rescale(img, s, 3)
                norm = env.normalize(s_img)
                pair = np.stack([norm, np.flip(norm, -2)], axis=0)
                pair = torch.from_numpy(
                    np.ascontiguousarray(pair.transpose(0, 3, 1, 2))
                )
                outputs.append(cam_net(pair))
            strided_cam = torch.sum(
                torch.stack(
                    [
                        F.interpolate(
                            torch.unsqueeze(o, 0), strided_size,
                            mode="bilinear", align_corners=False,
                        )[0]
                        for o in outputs
                    ]
                ),
                0,
            )
            highres_cam = [
                F.interpolate(
                    torch.unsqueeze(o, 1), strided_up_size, mode="bilinear",
                    align_corners=False,
                )
                for o in outputs
            ]
            highres_cam = torch.sum(torch.stack(highres_cam, 0), 0)[
                :, 0, : size[0], : size[1]
            ]
            valid_cat = torch.nonzero(torch.from_numpy(labels[name]))[:, 0]
            strided_cam = strided_cam[valid_cat]
            strided_cam /= F.adaptive_max_pool2d(strided_cam, (1, 1)) + 1e-5
            highres_cam = highres_cam[valid_cat]
            highres_cam /= F.adaptive_max_pool2d(highres_cam, (1, 1)) + 1e-5
            np.save(
                os.path.join(out_dir, name + ".npy"),
                {
                    "keys": valid_cat.numpy(),
                    "cam": strided_cam.numpy(),
                    "high_res": highres_cam.numpy(),
                },
            )


def _ref_make_sem_seg(env, tree, names, ed_net, cam_dir, out_dir, bg=0.25):
    """The body of step/make_sem_seg_labels.py:28-51 on CPU."""
    os.makedirs(out_dir, exist_ok=True)
    import torch.nn.functional as F

    with torch.no_grad():
        for name in names:
            img = _read(tree, name)
            size = img.shape[:2]
            norm = env.normalize(img)
            pair = np.stack([norm, np.flip(norm, -2)], axis=0)
            pair = torch.from_numpy(
                np.ascontiguousarray(pair.transpose(0, 3, 1, 2))
            )
            edge, dp = ed_net(pair)
            cam_dict = np.load(
                os.path.join(cam_dir, name + ".npy"), allow_pickle=True
            ).item()
            cams = torch.from_numpy(np.asarray(cam_dict["cam"], np.float32))
            keys = np.pad(
                np.asarray(cam_dict["keys"]) + 1, (1, 0), mode="constant"
            )
            rw = env.indexing.propagate_to_edge(
                cams, edge, beta=10, exp_times=8, radius=5
            )
            rw_up = F.interpolate(
                rw, scale_factor=4, mode="bilinear", align_corners=False
            )[..., 0, : size[0], : size[1]]
            rw_up = rw_up / torch.max(rw_up)
            rw_up_bg = F.pad(rw_up, (0, 0, 0, 0, 1, 0), value=bg)
            rw_pred = torch.argmax(rw_up_bg, dim=0).numpy()
            imageio.imsave(
                os.path.join(out_dir, name + ".png"),
                keys[rw_pred].astype(np.uint8),
            )


def _ref_make_ins_seg(env, tree, names, ed_net, cam_dir, out_dir, bg=0.25):
    """The body of step/make_ins_seg_labels.py:118-152 on CPU."""
    os.makedirs(out_dir, exist_ok=True)
    import torch.nn.functional as F

    from misc import pyutils as ref_pyutils

    with torch.no_grad():
        for name in names:
            img = _read(tree, name)
            size = np.asarray(img.shape[:2])
            norm = env.normalize(img)
            pair = np.stack([norm, np.flip(norm, -2)], axis=0)
            pair = torch.from_numpy(
                np.ascontiguousarray(pair.transpose(0, 3, 1, 2))
            )
            edge, dp = ed_net(pair)
            dp = dp.numpy()
            cam_dict = np.load(
                os.path.join(cam_dir, name + ".npy"), allow_pickle=True
            ).item()
            cams = torch.from_numpy(np.asarray(cam_dict["cam"], np.float32))
            keys = np.asarray(cam_dict["keys"])
            centroids = env.ins.find_centroids_with_refinement(dp)
            instance_map = env.ins.cluster_centroids(centroids, dp)
            instance_cam = env.ins.separte_score_by_mask(cams, instance_map)
            rw = env.indexing.propagate_to_edge(
                instance_cam, edge, beta=10, exp_times=8, radius=5
            )
            rw_up = F.interpolate(
                rw, scale_factor=4, mode="bilinear", align_corners=False
            )[:, 0, : size[0], : size[1]]
            rw_up = rw_up / torch.max(rw_up)
            rw_up_bg = F.pad(rw_up, (0, 0, 0, 0, 1, 0), value=bg)
            num_classes = len(keys)
            num_instances = instance_map.shape[0]
            instance_shape = torch.argmax(rw_up_bg, 0).numpy()
            instance_shape = ref_pyutils.to_one_hot(
                instance_shape, maximum_val=num_instances * num_classes + 1
            )[1:]
            instance_class_id = np.repeat(keys, num_instances)
            detected = env.ins.detect_instance(
                rw_up.numpy(), instance_shape, instance_class_id,
                max_fragment_size=size[0] * size[1] * 0.01,
            )
            np.save(os.path.join(out_dir, name + ".npy"), detected)


@pytest.fixture(scope="module")
def artifacts(ref_env, tree, tmp_path_factory):
    """Run both frameworks' make_cam + make_sem_seg over the tree."""
    import jax

    from irn_tpu.data import voc12
    from irn_tpu.pipeline import stages_cam, stages_irn
    from irn_tpu.pipeline.config import Config
    from irn_tpu.utils import checkpoint as ckpt
    from irn_tpu.utils.weights import convert_cam_net, convert_irn_net

    work = tmp_path_factory.mktemp("refdiff_work")
    names = voc12.load_img_name_list(tree.train)
    labels = voc12.load_label_dict(tree.root + "/cls_labels.npy")

    # one set of random reference nets drives both frameworks. Module
    # construction draws classifier/decoder inits from torch's GLOBAL rng
    # (only the backbone comes from the seeded fake_load_url), so pin it —
    # otherwise any earlier test that builds a torch module shifts these
    # weights and the near-tie instance/sem diffs can flip.
    torch.manual_seed(0)
    cam_net = ref_env.cam_mod.CAM()
    cam_net.eval()
    ed_net = ref_env.irn_mod.EdgeDisplacement(crop_size=64)
    ed_net.mean_shift.running_mean = torch.tensor([0.13, -0.21])
    ed_net.eval()

    cam_w = str(work / "cam.ckpt")
    irn_w = str(work / "irn.ckpt")
    ckpt.save_checkpoint(
        cam_w, convert_cam_net({k: v for k, v in cam_net.state_dict().items()})
    )
    ckpt.save_checkpoint(
        irn_w, convert_irn_net({k: v for k, v in ed_net.state_dict().items()})
    )

    cfg = Config(
        voc12_root=tree.root, train_list=tree.train, infer_list=tree.train,
        cls_labels_path=tree.root + "/cls_labels.npy",
        cam_scales=SCALES, cam_weights_name=cam_w, irn_weights_name=irn_w,
        cam_out_dir=str(work / "cam_ours"),
        sem_seg_out_dir=str(work / "sem_ours"),
        ins_seg_out_dir=str(work / "ins_ours"),
        rw_grid_cap=16, pad_multiple=16,
    ).resolve()
    os.makedirs(cfg.cam_out_dir, exist_ok=True)
    stages_cam.make_cam(cfg)
    stages_irn.make_sem_seg_labels(cfg)
    stages_irn.make_ins_seg_labels(cfg)

    ref_cam_dir = str(work / "cam_ref")
    ref_sem_dir = str(work / "sem_ref")
    ref_ins_dir = str(work / "ins_ref")
    _ref_make_cam(ref_env, tree, names, labels, cam_net, ref_cam_dir)
    # The label stages read OUR cam artifacts on both sides: with random
    # (untrained) nets the per-class random-walk scores are near-ties, so
    # chaining each side's own ~1e-6-different cams through T^256 + global
    # max-normalization can flip a whole uniform image's argmax — a
    # knife-edge artifact of random weights, not a fidelity signal. The cam
    # stage itself is diffed above; the sem/ins diffs isolate their stages
    # on identical inputs.
    _ref_make_sem_seg(
        ref_env, tree, names, ed_net, cfg.cam_out_dir, ref_sem_dir
    )
    _ref_make_ins_seg(
        ref_env, tree, names, ed_net, cfg.cam_out_dir, ref_ins_dir
    )

    return SimpleNamespace(
        names=names, cfg=cfg, ref_cam_dir=ref_cam_dir,
        ref_sem_dir=ref_sem_dir, ref_ins_dir=ref_ins_dir,
    )


def test_make_cam_artifact_diff(artifacts):
    worst_cam = worst_hr = 0.0
    for name in artifacts.names:
        ours = np.load(
            os.path.join(artifacts.cfg.cam_out_dir, name + ".npy"),
            allow_pickle=True,
        ).item()
        ref = np.load(
            os.path.join(artifacts.ref_cam_dir, name + ".npy"),
            allow_pickle=True,
        ).item()
        np.testing.assert_array_equal(
            np.asarray(ours["keys"]), np.asarray(ref["keys"]), err_msg=name
        )
        d_cam = float(np.abs(ours["cam"] - ref["cam"]).max())
        d_hr = float(np.abs(ours["high_res"] - ref["high_res"]).max())
        worst_cam = max(worst_cam, d_cam)
        worst_hr = max(worst_hr, d_hr)
    print(f"cam artifact deltas: strided {worst_cam:.2e} highres {worst_hr:.2e}")
    assert worst_cam < 3e-3, worst_cam
    assert worst_hr < 3e-3, worst_hr


def test_make_sem_seg_artifact_diff(artifacts):
    total = agree = 0
    for name in artifacts.names:
        ours = np.asarray(
            imageio.imread(
                os.path.join(artifacts.cfg.sem_seg_out_dir, name + ".png")
            )
        )
        ref = np.asarray(
            imageio.imread(os.path.join(artifacts.ref_sem_dir, name + ".png"))
        )
        assert ours.shape == ref.shape, name
        total += ref.size
        agree += int((ours == ref).sum())
    rate = agree / total
    print(f"sem_seg label agreement: {rate:.6f} ({agree}/{total})")
    assert rate >= 0.99, rate


def test_make_ins_seg_artifact_diff(artifacts):
    """Every reference instance (class, mask, score) has an exact match in
    our detections, and vice versa (instance ordering may differ)."""
    n_ref = n_ours = 0
    for name in artifacts.names:
        ours = np.load(
            os.path.join(artifacts.cfg.ins_seg_out_dir, name + ".npy"),
            allow_pickle=True,
        ).item()
        ref = np.load(
            os.path.join(artifacts.ref_ins_dir, name + ".npy"),
            allow_pickle=True,
        ).item()
        assert len(ours["score"]) == len(ref["score"]), name
        n_ref += len(ref["score"])
        n_ours += len(ours["score"])
        used = set()
        for score, mask, cls in zip(ref["score"], ref["mask"], ref["class"]):
            found = None
            for j in range(len(ours["score"])):
                if j in used:
                    continue
                if int(ours["class"][j]) != int(cls):
                    continue
                if not np.array_equal(
                    np.asarray(ours["mask"][j], bool), np.asarray(mask, bool)
                ):
                    continue
                if abs(float(ours["score"][j]) - float(score)) > 2e-3:
                    continue
                found = j
                break
            assert found is not None, (name, int(cls), float(score))
            used.add(found)
    print(f"ins_seg instances matched exactly: {n_ref} ref vs {n_ours} ours")
    assert n_ref == n_ours
