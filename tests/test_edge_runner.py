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
