"""Dynamic-extent bilinear resize equals torch interpolate on the true
extents, for several (src, dst) size combinations inside fixed buffers."""

import numpy as np
import pytest

from irn_tpu.ops.resize import resize_bilinear_dynamic

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


@pytest.mark.parametrize(
    "src_true,out_true",
    [((13, 17), (52, 68)), ((32, 24), (125, 94)), ((7, 7), (20, 30)),
     ((30, 30), (15, 11))],
)
def test_matches_torch_within_caps(rng, src_true, out_true):
    src_cap = (32, 32)
    out_cap = (128, 128)
    c = 3
    content = rng.standard_normal((c,) + src_true).astype(np.float32)
    buf = np.zeros((c,) + src_cap, np.float32)
    buf[:, : src_true[0], : src_true[1]] = content

    got = np.asarray(
        resize_bilinear_dynamic(buf, src_true, out_true, out_cap)
    )
    want = F.interpolate(
        torch.from_numpy(content)[None], out_true, mode="bilinear",
        align_corners=False,
    )[0].numpy()
    np.testing.assert_allclose(
        got[:, : out_true[0], : out_true[1]], want, atol=1e-5, rtol=1e-4
    )
    # zero beyond the true output extent
    assert np.abs(got[:, out_true[0]:, :]).max() == 0
    assert np.abs(got[:, :, out_true[1]:]).max() == 0
