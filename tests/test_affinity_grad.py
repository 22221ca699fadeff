"""Gradient parity for the memory-lean path-max custom VJP.

_path_max keeps only an int8 argmax residual and scatter-routes the
cotangent (winner-take-all, the torch max_pool2d backward semantics,
resnet50_irn.py:170) — this pins it against a naive differentiable
formulation built from true-length per-pair maxima."""

import jax
import jax.numpy as jnp
import numpy as np

from irn_tpu.ops import affinity as aff_mod
from irn_tpu.ops import paths


def test_path_affinity_value_and_grad_match_naive(rng):
    ps = paths.build_path_set(5)
    h, w = 20, 24
    rf = ps.radius_floor
    ch, cw = h - rf, w - 2 * rf
    edge = jnp.asarray(rng.random((2, h, w)).astype(np.float32))
    wgt = jnp.asarray(
        rng.random((2, ps.n_pairs, ch * cw)).astype(np.float32)
    )

    def loss_new(e):
        return jnp.sum(aff_mod.path_affinity(e, ps) * wgt)

    def loss_naive(e):
        # per-pair max over the TRUE path cells (no padding duplicates —
        # jnp.max's tie gradient would double-count them)
        per_pair = []
        for p in range(ps.n_pairs):
            n_cells = int(ps.lengths[p])
            cells = ps.cells[p][:n_cells]
            views = jnp.stack(
                [
                    aff_mod.shifted_window(e, int(dy), int(dx), rf, ch, cw)
                    for dy, dx in cells
                ],
                axis=0,
            )
            per_pair.append(views.max(axis=0))  # [2, ch, cw]
        a = 1.0 - jnp.stack(per_pair, axis=1)  # [2, n_pairs, ch, cw]
        return jnp.sum(a.reshape(2, ps.n_pairs, ch * cw) * wgt)

    v1, g1 = jax.value_and_grad(loss_new)(edge)
    v2, g2 = jax.value_and_grad(loss_naive)(edge)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), atol=1e-5, rtol=1e-5
    )
    assert np.abs(np.asarray(g1)).sum() > 0  # gradient actually flows
