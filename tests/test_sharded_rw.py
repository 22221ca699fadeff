"""Model-sharded random-walk parity: block-row sharded matrix power and
seed propagation must equal the single-device computation."""

import jax.numpy as jnp
import numpy as np

from irn_tpu.ops.matpow import matrix_power_squarings
from irn_tpu.parallel import mesh as mesh_mod
from irn_tpu.parallel.rw_sharded import (
    sharded_matrix_power,
    sharded_propagate_rows,
)


def test_sharded_matrix_power_parity(rng):
    n = 8 * 32
    a = np.abs(rng.standard_normal((n, n))).astype(np.float32)
    t = a / a.sum(axis=0, keepdims=True)

    want = np.asarray(matrix_power_squarings(jnp.asarray(t), 3))
    mesh = mesh_mod.make_mesh(n_data=1, n_model=8)
    got = np.asarray(sharded_matrix_power(jnp.asarray(t), 3, mesh))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_sharded_propagate_parity(rng):
    n = 8 * 16
    t = np.abs(rng.standard_normal((n, n))).astype(np.float32)
    seeds = rng.standard_normal((4, n)).astype(np.float32)
    want = seeds @ t
    mesh = mesh_mod.make_mesh(n_data=1, n_model=8)
    got = np.asarray(sharded_propagate_rows(jnp.asarray(seeds), jnp.asarray(t), mesh))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)
