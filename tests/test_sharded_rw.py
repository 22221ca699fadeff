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


def _banded(rng, n, h):
    r = np.arange(n)
    band = np.abs(r[:, None] - r[None, :]) <= h
    t = np.zeros((n, n), np.float32)
    t[band] = rng.random(band.sum(), dtype=np.float32) * 0.05
    return t


def test_banded_sharded_power_parity(rng):
    from irn_tpu.parallel.rw_sharded import banded_matrix_power

    mesh = mesh_mod.make_mesh(n_data=1, n_model=8)
    n = 8 * 32
    for h in (10, 40):  # single-hop and multi-hop (h > n_loc=32) halos
        t = _banded(rng, n, h)
        want = np.asarray(matrix_power_squarings(jnp.asarray(t), 2))
        got = np.asarray(banded_matrix_power(jnp.asarray(t), 2, h, mesh))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)
        # out-of-band entries stay exact zeros (the applications read T
        # unmasked)
        r = np.arange(n)
        assert (got[np.abs(r[:, None] - r[None, :]) > 4 * h] == 0).all()


def test_banded_sharded_propagate_parity(rng):
    from irn_tpu.parallel.rw_sharded import (
        banded_matrix_power,
        banded_propagate_rows,
    )

    mesh = mesh_mod.make_mesh(n_data=1, n_model=8)
    n, h = 8 * 32, 12
    t = _banded(rng, n, h)
    seeds = rng.standard_normal((4, n)).astype(np.float32)
    want = seeds @ t @ t @ t @ t
    got = np.asarray(
        banded_propagate_rows(jnp.asarray(seeds), jnp.asarray(t), 4, mesh)
    )
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)

    # hybrid: 1 banded-sharded squaring + 2 sharded applications == T^4... t2 = T^2
    t2 = banded_matrix_power(jnp.asarray(t), 1, h, mesh)
    got2 = np.asarray(
        banded_propagate_rows(jnp.asarray(seeds), t2, 2, mesh)
    )
    np.testing.assert_allclose(got2, want, atol=1e-3, rtol=1e-3)


def test_banded_sharded_bf16_keeps_f32_carry(rng):
    """ADVICE r2 regression: in bf16 mode the mesh-banded carries (T
    between squarings, the seed matrix between applications, the psum)
    must accumulate in f32 — only the matmul OPERANDS are bf16. The
    output dtype pins it structurally, and a numeric bound pins it
    behaviorally: with f32 carries the only rounding is per-matmul
    operand quantization, so 2 squarings + 4 applications stay within a
    few bf16 ulps of the f32 result instead of compounding."""
    from irn_tpu.parallel.rw_sharded import (
        banded_matrix_power,
        banded_propagate_rows,
    )

    mesh = mesh_mod.make_mesh(n_data=1, n_model=8)
    n, h = 8 * 32, 12
    t = _banded(rng, n, h)
    # column-normalize so magnitudes mimic a real transition matrix
    t = t / np.maximum(t.sum(axis=0, keepdims=True), 1e-6)
    seeds = rng.random((8, n)).astype(np.float32)

    t2 = banded_matrix_power(jnp.asarray(t), 2, h, mesh,
                             matmul_dtype=jnp.bfloat16)
    assert t2.dtype == jnp.float32  # carry not rounded to bf16
    got = banded_propagate_rows(jnp.asarray(seeds), t2, 4, mesh,
                                matmul_dtype=jnp.bfloat16)
    assert got.dtype == jnp.float32

    want = seeds @ np.linalg.matrix_power(t, 4 * 4)
    # bf16 has ~3 decimal digits; f32 carries keep the relative error at
    # the few-ulp level even through 6 chained products
    np.testing.assert_allclose(np.asarray(got), want, rtol=0.05,
                               atol=2e-4 * np.abs(want).max())


def test_sharded_assembly_matches_dense_affinity(rng):
    """Per-device row-block assembly from the band-value table ==
    the replicated dense_affinity (and the normalized transition too)."""
    import jax
    import jax.numpy as jnp2

    from irn_tpu.ops import random_walk as rw_mod
    from irn_tpu.parallel import rw_sharded

    mesh = mesh_mod.make_mesh(n_data=1, n_model=8)
    # radius 2: band well inside a device block; radius 5: max doff (138)
    # EXCEEDS n_loc (128), exercising band columns that land in the
    # ppermuted halo row of the flat-misalignment trick
    for radius in (2, 5):
        geom = rw_mod.build_geometry(24, 24, radius=radius)
        assert geom.n_pad % 8 == 0
        edge = rng.random((24, 24)).astype(np.float32)

        want = np.asarray(rw_mod.dense_affinity(geom, jnp2.asarray(edge)))

        @jax.jit
        def sharded(e, geom=geom):
            vs, doffs = rw_mod.band_values(geom, e)
            a = rw_sharded.assemble_rows_in_jit(vs, doffs, geom.n_pad, mesh)
            return a, rw_sharded.normalize_rows_in_jit(a, 10, mesh)

        got_a, got_t = sharded(jnp2.asarray(edge))
        np.testing.assert_array_equal(np.asarray(got_a), want,
                                      err_msg=f"radius={radius}")
        want_t = np.asarray(
            rw_mod.normalize_transition(jnp2.asarray(want), 10)
        )
        np.testing.assert_allclose(np.asarray(got_t), want_t, atol=1e-6,
                                   rtol=1e-6)


def test_chunked_walker_mesh_banded_matches_single_device(rng):
    """propagate_all (uncapped seeds, chunked) through the halo-sharded
    mesh path vs the single-device walker at the same split."""
    import jax.numpy as jnp2

    from irn_tpu.ops import random_walk as rw_mod
    from irn_tpu.pipeline.config import Config
    from irn_tpu.pipeline.stages_irn import RandomWalkRunner

    base = dict(rw_grid_cap=32, exp_times=3, rw_radius=2,
                rw_square_times=1)
    w1 = RandomWalkRunner(Config(**base), n_seed_rows=4)
    w8 = RandomWalkRunner(Config(rw_mesh_model=8, **base), n_seed_rows=4)
    geom = rw_mod.build_geometry(32, 32, radius=2)
    assert w8._mesh_banded(geom, 1)

    h4 = w4 = 28
    size = (110, 106)
    edge = np.ones((32, 32), np.float32)
    edge[:h4, :w4] = rng.random((h4, w4)).astype(np.float32)
    seeds = rng.random((10, h4, w4)).astype(np.float32)  # 10 > 4 chunks

    l1, b1 = w1.propagate_all(seeds, jnp2.asarray(edge), h4, w4, size, 0.25)
    l8, b8 = w8.propagate_all(seeds, jnp2.asarray(edge), h4, w4, size, 0.25)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l8))
    np.testing.assert_allclose(
        np.asarray(b8), np.asarray(b1), atol=1e-5, rtol=1e-5
    )


def test_chunked_walker_mesh_diag_matches_single_device(rng):
    """The chunked mesh-diag branch (make_ins_seg in rw_mesh_model mode
    at the e=0 production default — square_times unset): T stays in
    diagonal (w, inv) form, chunks stream through the column-sharded
    stencil, and labels equal the single-device walker."""
    import jax.numpy as jnp2

    from irn_tpu.ops import random_walk as rw_mod
    from irn_tpu.pipeline.config import Config
    from irn_tpu.pipeline.stages_irn import RandomWalkRunner

    base = dict(rw_grid_cap=32, exp_times=3, rw_radius=2)  # default split
    w1 = RandomWalkRunner(Config(**base), n_seed_rows=4)
    w8 = RandomWalkRunner(Config(rw_mesh_model=8, **base), n_seed_rows=4)
    geom = rw_mod.build_geometry(32, 32, radius=2)
    assert w8._mesh_diag(geom, 0)  # the branch under test engages

    h4 = w4 = 28
    size = (110, 106)
    edge = np.ones((32, 32), np.float32)
    edge[:h4, :w4] = rng.random((h4, w4)).astype(np.float32)
    seeds = rng.random((10, h4, w4)).astype(np.float32)  # 10 > 4 chunks

    l1, b1 = w1.propagate_all(seeds, jnp2.asarray(edge), h4, w4, size, 0.25)
    l8, b8 = w8.propagate_all(seeds, jnp2.asarray(edge), h4, w4, size, 0.25)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l8))
    np.testing.assert_allclose(
        np.asarray(b8), np.asarray(b1), atol=1e-5, rtol=1e-5
    )


def test_propagate_mesh_banded_matches_single_device(rng):
    """rw_mod.propagate's halo-exchange mesh path (mesh_banded) against
    the single-device computation at the same square_times."""
    from irn_tpu.ops import random_walk as rw_mod

    geom = rw_mod.build_geometry(32, 32, radius=2)
    mesh = mesh_mod.make_mesh(n_data=1, n_model=8)
    assert rw_mod.banded_sharded_fits(geom, 3, 1, 8)
    h4 = w4 = 28
    edge = np.ones((32, 32), np.float32)
    edge[:h4, :w4] = rng.random((h4, w4)).astype(np.float32)
    cam = np.zeros((3, 32, 32), np.float32)
    cam[:, :h4, :w4] = rng.random((3, h4, w4))

    want = np.asarray(
        rw_mod.propagate(geom, cam, edge, beta=10, exp_times=3,
                         square_times=1)
    )
    got = np.asarray(
        rw_mod.propagate(geom, cam, edge, beta=10, exp_times=3,
                         square_times=1, mesh=mesh)
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_propagate_mesh_diag_matches_single_device(rng):
    """The column-sharded diagonal stencil (the e=0 mesh default) against
    the single-device stencil and the dense f32 schedule: halo ppermutes
    + local shifted FMAs must reproduce apply_diag_chain exactly (same
    adds, same order per output element)."""
    from irn_tpu.ops import random_walk as rw_mod

    geom = rw_mod.build_geometry(32, 32, radius=2)
    mesh = mesh_mod.make_mesh(n_data=1, n_model=8)
    assert rw_mod.diag_sharded_fits(geom, 8)
    h4 = w4 = 28
    edge = np.ones((32, 32), np.float32)
    edge[:h4, :w4] = rng.random((h4, w4)).astype(np.float32)
    cam = np.zeros((3, 32, 32), np.float32)
    cam[:, :h4, :w4] = rng.random((3, h4, w4))

    single = np.asarray(
        rw_mod.propagate_diag(geom, cam, edge, beta=10, exp_times=3)
    )
    meshed = np.asarray(
        rw_mod.propagate_mesh_diag(geom, cam, edge, 10, 3, mesh)
    )
    np.testing.assert_allclose(meshed, single, atol=1e-6, rtol=1e-6)

    dense = np.asarray(
        rw_mod.propagate(geom, cam, edge, beta=10, exp_times=3,
                         square_times=0)
    )
    np.testing.assert_allclose(meshed, dense, atol=1e-5, rtol=1e-4)

    # propagate() routes the mesh e=0 default through the stencil
    routed = np.asarray(
        rw_mod.propagate(geom, cam, edge, beta=10, exp_times=3,
                         square_times=0, mesh=mesh)
    )
    np.testing.assert_array_equal(routed, meshed)
