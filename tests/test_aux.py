"""Auxiliary subsystem tests: viz, SGDR schedule, resume checkpointing,
weight-port CLI."""

import numpy as np
import pytest

from irn_tpu.train import optim
from irn_tpu.utils import viz


def test_colorize_label_shapes():
    lab = np.array([[0, 1], [2, 21]])
    img = viz.colorize_label(lab, by_hue=False)
    assert img.shape == (2, 2, 3)
    img = viz.colorize_label(lab, by_hue=True)
    assert img.shape == (2, 2, 3)
    assert (img[0, 0] == 0).all()  # background black


def test_colorize_displacement():
    dp = np.stack([np.ones((4, 4)), np.zeros((4, 4))])
    img = viz.colorize_displacement(dp)
    assert img.shape == (4, 4, 3)
    assert np.isfinite(img).all()


def test_colorize_score():
    score = np.random.default_rng(0).random((3, 5, 5)).astype(np.float32)
    img = viz.colorize_score(score)
    assert img.shape == (5, 5, 3) and img.max() <= 1.0 + 1e-6


def test_sgdr_schedule_matches_reference_semantics():
    """Oracle: the reference SGDROptimizer's loop-state update
    (torchutils.py:47-63)."""
    import math

    base_lr, spe, start, mult = 0.1, 10, 1, 2

    def oracle(n_steps):
        out = []
        local, max_step, restarts = 0, spe * start, 0
        for _ in range(n_steps):
            if local >= max_step:
                local = 0
                max_step *= mult
                restarts += 1
            lr = base_lr * (1 + math.cos(math.pi * local / max_step)) / 2 / (restarts + 1)
            out.append(lr)
            local += 1
        return out

    sched = optim.sgdr_schedule(base_lr, spe, start, mult)
    want = oracle(70)
    got = [float(sched(i)) for i in range(70)]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-8)


def test_sgdr_transform_steps(rng):
    import jax.numpy as jnp

    tx = optim.sgdr(0.1, steps_per_epoch=5)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    grads = {"w": jnp.ones((3,))}
    updates, state = tx.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), -0.1, rtol=1e-6)


def test_train_resume_roundtrip(tmp_path):
    """Saving and restoring TrainState mid-training reproduces the run."""
    import jax
    import jax.numpy as jnp

    from irn_tpu.models.cam import CAMNet
    from irn_tpu.train import cam_train
    from irn_tpu.train.state import create_train_state
    from irn_tpu.utils import checkpoint as ckpt

    model = CAMNet()
    x = np.zeros((1, 32, 32, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    tx = optim.poly_sgd(0.05, max_step=8, mult_fn=optim.cam_lr_mult)
    state = create_train_state(variables, tx)
    step = cam_train.make_train_step(model, tx)

    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    labels = np.zeros((1, 20), np.float32)
    labels[0, 2] = 1.0

    state, _ = step(state, imgs, labels)
    path = str(tmp_path / "mid.ckpt")
    ckpt.save_checkpoint(
        path, {"params": state.params, "stats": state.stats,
               "opt_state": state.opt_state, "step": state.step, "epoch": 1}
    )
    state_a, ma = step(state, imgs, labels)

    saved = ckpt.load_checkpoint(path)
    resumed = create_train_state(
        {"params": saved["params"], "stats": saved["stats"]}, tx
    ).replace(opt_state=saved["opt_state"], step=jnp.asarray(saved["step"]))
    state_b, mb = step(resumed, imgs, labels)
    assert abs(float(ma["loss"]) - float(mb["loss"])) < 1e-6
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(state_a.params)[0]),
        np.asarray(jax.tree.leaves(state_b.params)[0]),
        atol=1e-7,
    )


def test_orbax_checkpoint_roundtrip(tmp_path):
    from irn_tpu.utils import checkpoint as ckpt

    tree = {
        "params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "step": np.int64(7),
    }
    path = str(tmp_path / "orbax_ckpt")
    ckpt.save_orbax(path, tree)
    back = ckpt.load_orbax(path)
    np.testing.assert_array_equal(back["params"]["w"], tree["params"]["w"])
    assert int(back["step"]) == 7


def test_port_cli(tmp_path):
    torch = pytest.importorskip("torch")
    import subprocess
    import sys as _sys

    # minimal fake torchvision-style state dict via the reference arch shape
    from conftest import REFERENCE_ROOT, reference_available

    if not reference_available():
        pytest.skip("reference not mounted")
    _sys.path.insert(0, REFERENCE_ROOT)
    from net import resnet50 as ref

    _sys.path.remove(REFERENCE_ROOT)
    sd = ref.ResNet(ref.Bottleneck, [3, 4, 6, 3]).state_dict()
    src = str(tmp_path / "r50.pth")
    dst = str(tmp_path / "r50.ckpt")
    torch.save(sd, src)
    out = subprocess.run(
        [_sys.executable, "tools/port_torchvision_weights.py", src, dst],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    from irn_tpu.utils import checkpoint as ckpt

    tree = ckpt.load_checkpoint(dst)
    assert "params" in tree and "stats" in tree
    assert tree["params"]["conv1"]["kernel"].shape == (7, 7, 3, 64)
