"""Training-step tests: gradient flow/freezing semantics, optimizer groups,
data-parallel execution over the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from irn_tpu.models.cam import CAMNet
from irn_tpu.models.irn import IRNet
from irn_tpu.parallel import mesh as mesh_mod
from irn_tpu.train import cam_train, irn_train, optim
from irn_tpu.train.state import create_train_state


def _flat(tree):
    return {
        "/".join(str(k.key) for k in path): v
        for path, v in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


@pytest.fixture(scope="module")
def cam_setup():
    model = CAMNet(n_classes=20)
    x = np.zeros((2, 32, 32, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    tx = optim.poly_sgd(0.1, max_step=10, mult_fn=optim.cam_lr_mult)
    state = create_train_state(variables, tx)
    step = cam_train.make_train_step(model, tx)
    return model, state, step


def test_cam_train_step_updates_correct_params(cam_setup, rng):
    _, state, step = cam_setup
    images = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    labels = np.zeros((2, 20), np.float32)
    labels[:, 3] = 1.0
    new_state, metrics = step(state, images, labels)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1

    before = _flat(state.params)
    after = _flat(new_state.params)
    frozen_changed = []
    trainable_changed = []
    for k in before:
        changed = not np.allclose(before[k], after[k])
        if k.startswith("resnet50/conv1") or k.startswith("resnet50/bn1") or \
           k.startswith("resnet50/layer1_") or k.startswith("resnet50/layer2_"):
            frozen_changed.append((k, changed))
        else:
            trainable_changed.append((k, changed))
    assert not any(c for _, c in frozen_changed)
    # head + at least some of layers 3/4 must move
    assert any(c for k, c in trainable_changed if k.startswith("classifier"))
    assert any(c for k, c in trainable_changed if k.startswith("resnet50/layer4_"))


def test_cam_loss_decreases(cam_setup, rng):
    _, state, step = cam_setup
    images = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    labels = np.zeros((2, 20), np.float32)
    labels[:, 5] = 1.0
    losses = []
    for _ in range(5):
        state, metrics = step(state, images, labels)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]


def test_cam_data_parallel_mesh(cam_setup, rng):
    _, state, step = cam_setup
    mesh = mesh_mod.make_mesh()
    assert mesh.devices.size == 8
    images = rng.standard_normal((8, 32, 32, 3)).astype(np.float32)
    labels = (rng.random((8, 20)) < 0.2).astype(np.float32)
    sharded = mesh_mod.shard_batch({"img": images, "label": labels}, mesh)
    rep_state = mesh_mod.replicate(state, mesh)
    new_state, metrics = step(rep_state, sharded["img"], sharded["label"])
    assert np.isfinite(float(metrics["loss"]))
    # pure-function parity: sharded result == single-device result
    ref_state, ref_metrics = step(state, images, labels)
    assert abs(float(metrics["loss"]) - float(ref_metrics["loss"])) < 1e-5


def test_irn_train_step(rng):
    model = IRNet()
    x = np.zeros((2, 32, 32, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    grid = irn_train.build_train_geometry(crop_size=32, radius=3)
    tx = optim.poly_sgd(0.1, max_step=10, mult_fn=optim.irn_lr_mult)
    state = create_train_state(variables, tx)
    step = irn_train.make_train_step(model, tx, grid)

    images = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    reduced = rng.choice(
        np.array([0, 1, 2, 255], np.int32), size=(2, 8, 8), p=[0.4, 0.3, 0.2, 0.1]
    )
    new_state, metrics = step(state, images, reduced)
    for k in ("loss", "loss_pos_aff", "loss_neg_aff", "loss_dp_fg", "loss_dp_bg"):
        assert np.isfinite(float(metrics[k])), k

    before = _flat(state.params)
    after = _flat(new_state.params)
    for k in before:
        changed = not np.allclose(before[k], after[k])
        if k.startswith("resnet50/"):
            assert not changed, k  # frozen backbone
    assert any(
        not np.allclose(before[k], after[k]) for k in before if k.startswith("fc_edge")
    )
    assert any(
        not np.allclose(before[k], after[k]) for k in before if k.startswith("fc_dp")
    )


def test_mean_shift_calibration(rng):
    model = IRNet()
    x = np.zeros((1, 32, 32, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    tx = optim.poly_sgd(0.1, max_step=10)
    state = create_train_state(variables, tx)
    dp_step = irn_train.make_dp_mean_step(model)
    means = [dp_step(state, rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
             for _ in range(3)]
    state2 = irn_train.calibrate_mean_shift(state, means)
    assert state2.stats["dp_mean"].shape == (2,)
    np.testing.assert_allclose(
        np.asarray(state2.stats["dp_mean"]),
        np.mean(np.stack([np.asarray(m) for m in means]), axis=0),
        rtol=1e-6,
    )
    # calibrated mean is subtracted at eval
    img = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    _, dp_raw = model.apply(state2.variables, img, apply_mean_shift=False)
    _, dp_shift = model.apply(state2.variables, img, apply_mean_shift=True)
    np.testing.assert_allclose(
        np.asarray(dp_raw - dp_shift),
        np.broadcast_to(np.asarray(state2.stats["dp_mean"]), dp_raw.shape),
        atol=1e-6,
    )


def test_poly_schedule():
    sched = optim.poly_schedule(0.1, 100, 0.9)
    assert abs(float(sched(0)) - 0.1) < 1e-7
    assert float(sched(50)) < 0.1
    # frozen at the last in-range value past max_step
    assert float(sched(100)) == float(sched(99))


def test_sgdr_schedule_matches_reference_restart_loop():
    """sgdr_schedule == the reference SGDROptimizer's literal restart
    bookkeeping (torchutils.py:49-62) for both the geometric cycles and
    restart_mult=1, which must keep restarting forever (the precomputed
    table used to stop after its last entry and run the cosine past pi —
    found by review)."""
    import math

    def ref_lr_seq(base, spe, epoch_start, m, steps):
        max_step = spe * epoch_start
        local = total_restart = 0
        out = []
        for _ in range(steps):
            if local >= max_step:
                local = 0
                max_step *= m
                total_restart += 1
            out.append(
                base * (1 + math.cos(math.pi * local / max_step)) / 2
                / (total_restart + 1)
            )
            local += 1
        return out

    for m in (1, 2):
        sched = optim.sgdr_schedule(0.1, steps_per_epoch=5, epoch_start=1,
                                    restart_mult=m)
        want = ref_lr_seq(0.1, 5, 1, m, 40)
        got = [float(sched(s)) for s in range(40)]
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8,
                                   err_msg=f"restart_mult={m}")


def test_checkpoint_roundtrip(tmp_path, rng):
    from irn_tpu.utils import checkpoint as ckpt

    tree = {"a": rng.standard_normal((3, 3)), "b": {"c": np.int32(7)}}
    path = str(tmp_path / "t.ckpt")
    ckpt.save_checkpoint(path, tree)
    back = ckpt.load_checkpoint(path)
    np.testing.assert_allclose(back["a"], tree["a"])
    assert back["b"]["c"] == 7
