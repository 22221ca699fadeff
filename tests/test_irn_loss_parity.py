"""IRN loss-head parity vs the reference torch module.

Pins our affinity_displacement_loss_maps + irn_total_loss against
net/resnet50_irn.py AffinityDisplacementLoss (to_affinity 162-175,
to_pair_displacement 177-193, the four maps 198-213) and the masked
reduction of step/train_irn.py:58-69 — directly on the loss heads with
synthetic edge/displacement tensors (the backbone is parity-tested
separately in test_models_parity.py). Especially load-bearing for the
path-max implementation, which is a custom-VJP unrolled window chain
here vs index_select + max_pool2d there."""

import sys

import numpy as np
import pytest

from conftest import requires_reference, REFERENCE_ROOT

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from irn_tpu.ops import affinity as aff_mod
from irn_tpu.ops import paths


@pytest.fixture(scope="module")
def ref_loss_head():
    sys.path.insert(0, REFERENCE_ROOT)
    from net import resnet50 as ref_resnet50

    def fake_load_url(url):
        m = ref_resnet50.ResNet(ref_resnet50.Bottleneck, [3, 4, 6, 3])
        sd = m.state_dict()
        for k in sd:
            t = sd[k]
            if t.dtype.is_floating_point:
                sd[k] = torch.zeros(t.shape)
            if k.endswith("running_var"):
                sd[k] = torch.ones(t.shape)
        sd["fc.weight"] = torch.zeros(1000, 2048)
        sd["fc.bias"] = torch.zeros(1000)
        return sd

    ref_resnet50.model_zoo.load_url = fake_load_url
    from misc import indexing
    from net import resnet50_irn

    torch.manual_seed(1234)  # decoder inits come from the global rng
    head = resnet50_irn.AffinityDisplacementLoss(
        indexing.PathIndex(radius=5, default_size=(20, 24))
    )
    yield head
    sys.path.remove(REFERENCE_ROOT)


@requires_reference
def test_loss_maps_and_reduction_parity(ref_loss_head, rng):
    h, w, b = 20, 24, 2
    ps = paths.build_path_set(5)
    grid = paths.build_grid_index(ps, (h, w))

    edge_logit = rng.standard_normal((b, 1, h, w)).astype(np.float32)
    dp = (rng.standard_normal((b, 2, h, w)) * 2).astype(np.float32)

    # --- reference maps ---
    te = torch.from_numpy(edge_logit)
    td = torch.from_numpy(dp)
    with torch.no_grad():
        aff = ref_loss_head.to_affinity(torch.sigmoid(te))
        ref_pos = (-1) * torch.log(aff + 1e-5)
        ref_neg = (-1) * torch.log(1.0 + 1e-5 - aff)
        pair = ref_loss_head.to_pair_displacement(td)
        ref_fg = ref_loss_head.to_displacement_loss(pair)
        ref_bg = torch.abs(pair)

    # --- ours (NHWC layouts) ---
    maps = aff_mod.affinity_displacement_loss_maps(
        jnp.asarray(np.transpose(edge_logit, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(dp, (0, 2, 3, 1))),
        grid,
    )

    np.testing.assert_allclose(
        np.asarray(maps.pos_aff), ref_pos.numpy(), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(maps.neg_aff), ref_neg.numpy(), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(maps.dp_fg), ref_fg.numpy(), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(maps.dp_bg), ref_bg.numpy(), atol=1e-5, rtol=1e-5
    )

    # --- masked reduction (train_irn.py:58-69) on shared labels ---
    lab = rng.choice(
        np.array([0, 1, 2, 255], np.int64), size=(b, h, w),
        p=[0.4, 0.25, 0.25, 0.1],
    )
    bg, fg, neg = aff_mod.affinity_labels_2d(jnp.asarray(lab), ps)
    tb, tf, tn = (torch.from_numpy(np.asarray(x)) for x in (bg, fg, neg))

    with torch.no_grad():
        bg_pos = torch.sum(tb * ref_pos) / (torch.sum(tb) + 1e-5)
        fg_pos = torch.sum(tf * ref_pos) / (torch.sum(tf) + 1e-5)
        pos = bg_pos / 2 + fg_pos / 2
        negl = torch.sum(tn * ref_neg) / (torch.sum(tn) + 1e-5)
        fgl = torch.sum(ref_fg * tf.unsqueeze(1)) / (2 * torch.sum(tf) + 1e-5)
        bgl = torch.sum(ref_bg * tb.unsqueeze(1)) / (2 * torch.sum(tb) + 1e-5)
        ref_total = (pos + negl) / 2 + (fgl + bgl) / 2

    total, metrics = aff_mod.irn_total_loss(maps, bg, fg, neg)
    assert float(metrics["loss_pos_aff"]) == pytest.approx(float(pos), rel=1e-5)
    assert float(metrics["loss_neg_aff"]) == pytest.approx(float(negl), rel=1e-5)
    assert float(metrics["loss_dp_fg"]) == pytest.approx(float(fgl), rel=1e-5)
    assert float(metrics["loss_dp_bg"]) == pytest.approx(float(bgl), rel=1e-5)
    assert float(total) == pytest.approx(float(ref_total), rel=1e-5)
