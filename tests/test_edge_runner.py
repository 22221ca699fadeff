"""EdgeDisplacementRunner parity: the uint8-upload device path (normalize +
pad-mask + flip pair built on device) must equal the reference semantics
computed host-side (normalize, zero-pad the normalized tensor, flip of the
unpadded image, flip-averaged sigmoid edge, unflipped displacement)."""

import jax
import jax.numpy as jnp
import numpy as np

from irn_tpu.data import transforms as T
from irn_tpu.models.irn import IRNet
from irn_tpu.pipeline.config import Config
from irn_tpu.pipeline.stages_irn import EdgeDisplacementRunner


def test_runner_matches_host_reference_semantics(rng):
    cfg = Config(rw_grid_cap=32)  # 128 px crop buffer
    model = IRNet()
    img = rng.integers(0, 255, (100, 116, 3)).astype(np.uint8)
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 128, 128, 3), np.float32)
    )
    variables = jax.tree.map(np.asarray, variables)

    runner = EdgeDisplacementRunner(cfg, variables)
    edge, dp, (h4, w4) = runner(img, img.shape[:2])
    assert (h4, w4) == (25, 29)

    # host reference semantics (resnet50_irn.py:223-234)
    x = T.normalize(img)
    pad = np.zeros((128, 128, 3), np.float32)
    pad[:100, :116] = x
    pad_f = np.zeros((128, 128, 3), np.float32)
    pad_f[:100, :116] = x[:, ::-1]
    pair = np.stack([pad, pad_f])
    edge_logit, dp_ref = model.apply(variables, pair, apply_mean_shift=True)
    e = np.asarray(edge_logit)[..., 0]
    want_edge = 1.0 / (1.0 + np.exp(-(e[0, :h4, :w4] / 2 + e[1, :h4, :w4][:, ::-1] / 2)))
    want_dp = np.transpose(np.asarray(dp_ref)[0, :h4, :w4], (2, 0, 1))

    got_edge = np.asarray(edge)
    got_dp = np.asarray(dp)
    np.testing.assert_allclose(got_edge[:h4, :w4], want_edge, atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(got_dp[:, :h4, :w4], want_dp, atol=1e-4, rtol=1e-3)
    # hard boundary / zero displacement beyond extent
    assert (got_edge[h4:, :] == 1.0).all() and (got_edge[:, w4:] == 1.0).all()
    assert (got_dp[:, h4:, :] == 0).all() and (got_dp[:, :, w4:] == 0).all()


def test_batched_runner_matches_per_image(rng):
    """runner.batch (one [2B] forward, empty slots masked) must reproduce
    the per-image programs exactly for a mixed-size block, including a
    partial batch that leaves padded slots."""
    cfg = Config(rw_grid_cap=32, edge_infer_batch=4)
    model = IRNet()
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 128, 128, 3), np.float32)
    )
    variables = jax.tree.map(np.asarray, variables)
    runner = EdgeDisplacementRunner(cfg, variables)

    shapes = [(100, 116), (128, 128), (64, 91)]  # partial block of 3 < B=4
    imgs = [
        rng.integers(0, 255, (h, w, 3)).astype(np.uint8) for h, w in shapes
    ]
    sizes = [im.shape[:2] for im in imgs]
    got = runner.batch(imgs, sizes)
    assert len(got) == 3
    for im, size, (edge_b, dp_b, hw_b) in zip(imgs, sizes, got):
        edge_1, dp_1, hw_1 = runner(im, size)
        assert hw_b == hw_1
        np.testing.assert_allclose(
            np.asarray(edge_b), np.asarray(edge_1), atol=2e-5, rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(dp_b), np.asarray(dp_1), atol=2e-5, rtol=1e-5
        )
