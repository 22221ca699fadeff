"""Training-step parity vs the reference: identical weights + batches
through one/three optimizer steps must produce the same updated params.

This pins the full training dynamics — loss gradients through the
detached-stem backbone, the 1x/10x LR groups, the poly schedule's step
indexing, and the reference PolyOptimizer's effective hyper-parameters:
its ``weight_decay`` argument lands in torch SGD's *momentum* positional
slot (torchutils.py:10-11), BUT the per-group dicts carry explicit
``weight_decay`` keys that override the swallowed default
(train_cam.py:57-59) — so the reference trains with real weight decay
1e-4 plus stray momentum 1e-4. Writing this test found our stages
training with wd=0 under the wrong reading of that bug (7.5e-6 param
drift after just 3 steps), plus a float32 LR-schedule creep
(int32 count / int division). Float64, where forward parity is exact to
~1e-15 (fp32 parity through 50 conv layers is only ~1e-3)."""

import sys

import numpy as np
import pytest

from conftest import requires_reference, REFERENCE_ROOT

torch = pytest.importorskip("torch")


@pytest.fixture()
def ref_cam():
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
    from net import resnet50_cam

    yield resnet50_cam
    sys.path.remove(REFERENCE_ROOT)


@requires_reference
def test_cam_train_step_parity(ref_cam, rng):
    sys.path.insert(0, REFERENCE_ROOT)
    from misc import torchutils

    import jax

    with jax.enable_x64(True):
        import jax.numpy as jnp

        from irn_tpu.models.cam import CAMNet, multilabel_soft_margin_loss
        from irn_tpu.train import optim
        from irn_tpu.train.state import create_train_state
        from irn_tpu.utils.weights import convert_cam_net

        n_steps, max_step, lr = 3, 10, 0.1
        imgs = rng.standard_normal((n_steps, 2, 3, 64, 64)).astype(np.float64)
        labels = (rng.random((n_steps, 2, 20)) < 0.2).astype(np.float64)

        # --- reference: 3 PolyOptimizer steps (train_cam.py:57-85) ---
        torch.manual_seed(1234)  # head init comes from the global rng
        model = ref_cam.Net().double()
        model.train()
        init_sd = {k: v.clone() for k, v in model.state_dict().items()}
        pg = model.trainable_parameters()
        opt = torchutils.PolyOptimizer(
            [
                {"params": pg[0], "lr": lr, "weight_decay": 1e-4},
                {"params": pg[1], "lr": 10 * lr, "weight_decay": 1e-4},
            ],
            lr=lr, weight_decay=1e-4, max_step=max_step,
        )
        for s in range(n_steps):
            x = torch.from_numpy(imgs[s])
            y = torch.from_numpy(labels[s])
            loss = torch.nn.functional.multilabel_soft_margin_loss(
                model(x), y
            )
            opt.zero_grad()
            loss.backward()
            opt.step()
        want = convert_cam_net(
            {k: v for k, v in model.state_dict().items()}
        )

        # --- ours: same start, the stages' production construction — the
        # reference's EFFECTIVE hypers are weight decay 1e-4 (the
        # per-group dicts override the swallowed constructor default) AND
        # stray momentum 1e-4 (the swapped positional) ---
        variables = convert_cam_net(init_sd)
        variables = jax.tree.map(
            lambda x: np.asarray(x, np.float64), variables
        )
        ours = CAMNet(dtype=jnp.float64)
        tx = optim.poly_sgd(
            lr, max_step=max_step, power=0.9, weight_decay=1e-4,
            momentum=1e-4, mult_fn=optim.cam_lr_mult,
        )
        state = create_train_state(variables, tx)

        @jax.jit
        def step(state, images, y):
            def loss_fn(params):
                logits = ours.apply(
                    {"params": params, "stats": state.stats}, images,
                    train=True,
                )
                return multilabel_soft_margin_loss(logits, y)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            import optax

            updates, opt_state = tx.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            return state.replace(params=params, opt_state=opt_state), loss

        for s in range(n_steps):
            state, loss = step(
                state, jnp.asarray(np.transpose(imgs[s], (0, 2, 3, 1))),
                jnp.asarray(labels[s]),
            )

        flat_w = jax.tree_util.tree_flatten_with_path(want["params"])[0]
        flat_g = dict(
            jax.tree_util.tree_flatten_with_path(state.params)[0]
        )
        assert flat_w and len(flat_w) == len(flat_g)
        for path, w in flat_w:
            g = np.asarray(flat_g[path], np.float64)
            # eager CPU float64 agreement is exact (~1e-18, verified);
            # the jitted step adds XLA FMA/reassociation noise ~1e-9 abs.
            # The tolerance still catches semantic drift (the weight-decay
            # omission this test found measured 7.5e-6 after 3 steps).
            np.testing.assert_allclose(
                g, np.asarray(w, np.float64), atol=5e-8, rtol=1e-5,
                err_msg=jax.tree_util.keystr(path),
            )
    sys.path.remove(REFERENCE_ROOT)

@requires_reference
def test_irn_train_step_parity(ref_cam, rng):
    """IRN step: decoder/GroupNorm/upsample gradients + masked losses +
    PolyOptimizer semantics vs the torch reference, float64, 2 steps.
    (``ref_cam`` fixture only patches the weight download; resnet50_irn
    imports cleanly after it.)"""
    sys.path.insert(0, REFERENCE_ROOT)
    from misc import indexing, torchutils
    from net import resnet50_irn

    import jax

    with jax.enable_x64(True):
        import jax.numpy as jnp
        import optax

        from irn_tpu.models.irn import IRNet
        from irn_tpu.ops import affinity as aff_mod
        from irn_tpu.train import irn_train, optim
        from irn_tpu.train.state import create_train_state
        from irn_tpu.utils.weights import convert_irn_net

        n_steps, max_step, lr = 2, 10, 0.1
        h = w = 64  # stride-4 grid 16x16
        imgs = rng.standard_normal((n_steps, 2, 3, h, w)).astype(np.float64)
        reds = rng.choice(
            np.array([0, 1, 2, 255], np.int64), size=(n_steps, 2, 16, 16),
            p=[0.4, 0.25, 0.25, 0.1],
        )
        grid = irn_train.build_train_geometry(h, 5)
        ps = grid.path_set
        masks = [aff_mod.affinity_labels_2d(jnp.asarray(r), ps) for r in reds]

        # --- reference (train_irn.py:14-83) ---
        torch.manual_seed(1234)  # decoder inits come from the global rng
        model = resnet50_irn.AffinityDisplacementLoss(
            indexing.PathIndex(radius=5, default_size=(16, 16))
        ).double()
        model.train()
        init_sd = {k: v.clone() for k, v in model.state_dict().items()}
        pg = model.trainable_parameters()
        opt = torchutils.PolyOptimizer(
            [
                {"params": pg[0], "lr": lr, "weight_decay": 1e-4},
                {"params": pg[1], "lr": 10 * lr, "weight_decay": 1e-4},
            ],
            lr=lr, weight_decay=1e-4, max_step=max_step,
        )
        for s in range(n_steps):
            pos_l, neg_l, fg_l, bg_l = model(torch.from_numpy(imgs[s]), True)
            tb, tf, tn = (
                torch.from_numpy(np.asarray(m)) for m in masks[s]
            )
            bg_pos = torch.sum(tb * pos_l) / (torch.sum(tb) + 1e-5)
            fg_pos = torch.sum(tf * pos_l) / (torch.sum(tf) + 1e-5)
            pos = bg_pos / 2 + fg_pos / 2
            neg = torch.sum(tn * neg_l) / (torch.sum(tn) + 1e-5)
            fg = torch.sum(fg_l * tf.unsqueeze(1)) / (2 * torch.sum(tf) + 1e-5)
            bg = torch.sum(bg_l * tb.unsqueeze(1)) / (2 * torch.sum(tb) + 1e-5)
            total = (pos + neg) / 2 + (fg + bg) / 2
            opt.zero_grad()
            total.backward()
            opt.step()
        want = convert_irn_net({k: v for k, v in model.state_dict().items()})

        # --- ours: the production step construction ---
        variables = jax.tree.map(
            lambda x: np.asarray(x, np.float64), convert_irn_net(init_sd)
        )
        ours = IRNet(dtype=jnp.float64)
        tx = optim.poly_sgd(
            lr, max_step=max_step, power=0.9, weight_decay=1e-4,
            momentum=1e-4, mult_fn=optim.irn_lr_mult,
        )
        state = create_train_state(variables, tx)
        step = irn_train.make_train_step(ours, tx, grid)
        for s in range(n_steps):
            state, _ = step(
                state, jnp.asarray(np.transpose(imgs[s], (0, 2, 3, 1))),
                jnp.asarray(reds[s]),
            )

        flat_w = jax.tree_util.tree_flatten_with_path(want["params"])[0]
        flat_g = dict(jax.tree_util.tree_flatten_with_path(state.params)[0])
        assert flat_w and len(flat_w) == len(flat_g)
        for path, wv in flat_w:
            g = np.asarray(flat_g[path], np.float64)
            np.testing.assert_allclose(
                g, np.asarray(wv, np.float64), atol=5e-8, rtol=1e-5,
                err_msg=jax.tree_util.keystr(path),
            )
    sys.path.remove(REFERENCE_ROOT)
