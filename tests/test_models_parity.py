"""Forward-parity tests: Flax models vs the reference torch modules.

The reference nets are instantiated with randomized weights (the torchvision
download is monkeypatched away), converted through irn_tpu.utils.weights, and
compared on random inputs. This pins conv/BN/GN/upsample semantics.
"""

import sys

import numpy as np
import pytest

from conftest import requires_reference, REFERENCE_ROOT

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_modules():
    sys.path.insert(0, REFERENCE_ROOT)
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

    # module construction draws head/decoder inits from torch's GLOBAL
    # rng; pin it so weights are order-independent across the suite
    torch.manual_seed(1234)
    yield resnet50_cam, resnet50_irn
    sys.path.remove(REFERENCE_ROOT)


def _rand_img(rng, n, h, w):
    return rng.standard_normal((n, 3, h, w)).astype(np.float32)


@requires_reference
def test_cam_logits_parity(ref_modules, rng):
    resnet50_cam, _ = ref_modules
    from irn_tpu.models.cam import CAMNet
    from irn_tpu.utils.weights import convert_cam_net

    ref = resnet50_cam.Net()
    ref.eval()
    x = _rand_img(rng, 2, 64, 64)
    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(x)).numpy()

    variables = convert_cam_net({k: v for k, v in ref.state_dict().items()})
    model = CAMNet()
    ours = model.apply(variables, np.transpose(x, (0, 2, 3, 1)), train=False)
    # fp32 accumulation noise through ~50 conv layers; fp64 parity is exact
    # to machine epsilon (verified manually), so the tolerance is loose.
    np.testing.assert_allclose(np.asarray(ours), ref_logits, atol=1e-3, rtol=5e-2)


@requires_reference
def test_cam_maps_parity(ref_modules, rng):
    resnet50_cam, _ = ref_modules
    from irn_tpu.models.cam import CAMNet, fuse_flip
    from irn_tpu.utils.weights import convert_cam_net

    ref = resnet50_cam.CAM()
    ref.eval()
    img = _rand_img(rng, 1, 96, 64)[0]
    pair = np.stack([img, img[:, :, ::-1]], axis=0)  # orig + hflip (W axis)
    with torch.no_grad():
        ref_cam = ref(torch.from_numpy(pair.copy())).numpy()  # [20, h, w]

    variables = convert_cam_net({k: v for k, v in ref.state_dict().items()})
    model = CAMNet()
    maps = model.apply(
        variables, np.transpose(pair, (0, 2, 3, 1)), method=model.cam
    )
    fused = fuse_flip(np.asarray(maps))  # [h, w, 20]
    np.testing.assert_allclose(
        np.transpose(fused, (2, 0, 1)), ref_cam, atol=2e-3, rtol=5e-2
    )


@requires_reference
def test_irn_parity(ref_modules, rng):
    _, resnet50_irn = ref_modules
    from irn_tpu.models.irn import IRNet
    from irn_tpu.utils.weights import convert_irn_net

    ref = resnet50_irn.Net()
    # randomize the displacement calibration to exercise MeanShift
    ref.mean_shift.running_mean = torch.tensor([0.3, -0.7])
    ref.eval()  # MeanShift active in eval
    x = _rand_img(rng, 1, 100, 64)
    with torch.no_grad():
        ref_edge, ref_dp = ref(torch.from_numpy(x))

    variables = convert_irn_net({k: v for k, v in ref.state_dict().items()})
    model = IRNet()
    edge, dp = model.apply(
        variables, np.transpose(x, (0, 2, 3, 1)), apply_mean_shift=True
    )
    np.testing.assert_allclose(
        np.asarray(edge)[..., 0], ref_edge.numpy()[:, 0], atol=2e-3, rtol=5e-2
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(dp), (0, 3, 1, 2)),
        ref_dp.numpy(),
        atol=2e-3,
        rtol=5e-2,
    )


def test_resize_matches_torch(rng):
    import torch.nn.functional as F

    from irn_tpu.ops.resize import resize_bilinear

    x = rng.standard_normal((1, 5, 13, 17)).astype(np.float32)
    for size in [(26, 34), (7, 9), (52, 68), (13, 17)]:
        ref = F.interpolate(
            torch.from_numpy(x), size, mode="bilinear", align_corners=False
        ).numpy()
        ours = resize_bilinear(np.transpose(x, (0, 2, 3, 1)), size)
        np.testing.assert_allclose(
            np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref, atol=1e-5, rtol=1e-5
        )


def test_multilabel_loss_matches_torch(rng):
    import torch.nn.functional as F

    from irn_tpu.models.cam import multilabel_soft_margin_loss

    logits = rng.standard_normal((4, 20)).astype(np.float32)
    targets = (rng.random((4, 20)) < 0.2).astype(np.float32)
    ref = F.multilabel_soft_margin_loss(
        torch.from_numpy(logits), torch.from_numpy(targets)
    ).item()
    ours = float(multilabel_soft_margin_loss(logits, targets))
    assert abs(ref - ours) < 1e-5


@requires_reference
def test_cam_maps_padded_extent_parity(ref_modules, rng):
    """Padded-buffer inference with extent masking == exact-size reference
    run (the make_cam fidelity guarantee for bucketed shapes)."""
    import jax.numpy as jnp

    resnet50_cam, _ = ref_modules
    from irn_tpu.models.cam import CAMNet
    from irn_tpu.utils.weights import convert_cam_net

    ref = resnet50_cam.CAM()
    ref.eval()
    h, w = 75, 90  # deliberately not multiples of 16
    img = _rand_img(rng, 1, h, w)[0]
    pair = np.stack([img, img[:, :, ::-1]], axis=0)
    with torch.no_grad():
        ref_maps = ref.stage4(ref.stage3(ref.stage2(ref.stage1(
            torch.from_numpy(pair.copy())))))
        ref_maps = torch.relu(torch.nn.functional.conv2d(
            ref_maps, ref.classifier.weight)).numpy()  # [2, 20, vh, vw]

    variables = convert_cam_net({k: v for k, v in ref.state_dict().items()})
    model = CAMNet()
    padded = np.zeros((2, 128, 128, 3), np.float32)
    padded[:, :h, :w] = np.transpose(pair, (0, 2, 3, 1))
    maps = model.apply(
        variables, padded, extent=(jnp.int32(h), jnp.int32(w)),
        method=model.cam,
    )
    vh, vw = -(-h // 16), -(-w // 16)
    got = np.transpose(np.asarray(maps)[:, :vh, :vw, :], (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref_maps, atol=2e-3, rtol=5e-2)
