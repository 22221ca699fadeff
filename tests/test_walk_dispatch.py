"""Pin the RandomWalkRunner kernel-dispatch matrix (VERDICT r3 weak #5).

``RandomWalkRunner._resolve`` + the internal ``propagate``/
``propagate_banded`` gates encode 5 execution modes; this table asserts
which mode each (config, geometry, backend, IRN_TPU_APPLY) combination
resolves to, so a future kernel or gate change cannot silently reroute
production. ``resolve_mode`` mirrors the fused program's dispatch; the
chunked path resolves identically by construction (same ``sq``, same
gates — stages_irn._chunk_programs).
"""

import jax
import pytest

from irn_tpu.ops import random_walk as rw_mod
from irn_tpu.pipeline.config import Config
from irn_tpu.pipeline.stages_irn import RandomWalkRunner

PROD = (96, 128)  # the VOC-typical landscape bucket (stride-4 94x125)
SMALL = dict(rw_grid_cap=16, exp_times=3, rw_radius=2)  # test geometry

# (name, config kwargs, geometry, backend, IRN_TPU_APPLY, expected mode)
MATRIX = [
    # production defaults: e=0 f32-exact diagonal stencil on TPU
    ("prod-default", {}, PROD, "tpu", None, "diag"),
    # opting out of the stencil picks the packed band-tile matmul chain
    ("prod-apply-xla", {}, PROD, "tpu", "xla", "banded"),
    ("prod-apply-pallas", {}, PROD, "tpu", "pallas", "banded"),
    # non-TPU backends have no banded kernels
    ("prod-cpu", {}, PROD, "cpu", None, "dense"),
    ("prod-banded-off", {"rw_banded": False}, PROD, "tpu", None, "dense"),
    # pinned exponents: banded while the 2^e-grown band fits, else dense
    ("prod-sq2", {"rw_square_times": 2}, PROD, "tpu", None, "banded"),
    ("prod-sq8-pure-squaring", {"rw_square_times": 8}, PROD, "tpu", None,
     "dense"),
    # mesh mode (long-context): column-sharded stencil at the e=0
    # default, halo-exchange band at pinned e>0 / stencil opt-out
    ("mesh-default", {"rw_mesh_model": 8}, PROD, "tpu", None, "mesh_diag"),
    ("mesh-apply-xla", {"rw_mesh_model": 8}, PROD, "tpu", "xla",
     "mesh_banded"),
    ("mesh-sq1", {"rw_mesh_model": 8, "rw_square_times": 1}, PROD, "tpu",
     None, "mesh_banded"),
    ("mesh-banded-off", {"rw_mesh_model": 8, "rw_banded": False}, PROD,
     "tpu", None, "dense"),
    ("mesh-sq8", {"rw_mesh_model": 8, "rw_square_times": 8}, PROD, "tpu",
     None, "dense"),
    # tiny test geometry: the band (bs=512) outgrows the 1.1k^2 matrix,
    # so single-device falls to dense; the sharded stencil still engages
    ("small-default", SMALL, (16, 16), "tpu", None, "dense"),
    ("small-mesh", {"rw_mesh_model": 8, **SMALL}, (16, 16), "tpu", None,
     "mesh_diag"),
]


@pytest.mark.parametrize(
    "kwargs,geom,backend,apply_env,expected",
    [m[1:] for m in MATRIX],
    ids=[m[0] for m in MATRIX],
)
def test_dispatch_matrix(monkeypatch, kwargs, geom, backend, apply_env,
                         expected):
    if apply_env is None:
        monkeypatch.delenv("IRN_TPU_APPLY", raising=False)
    else:
        monkeypatch.setenv("IRN_TPU_APPLY", apply_env)
    monkeypatch.setattr(jax, "default_backend", lambda: backend)
    walker = RandomWalkRunner(Config(**kwargs), n_seed_rows=4)
    assert walker.resolve_mode(*geom) == expected


def test_all_production_buckets_resolve_diag(monkeypatch):
    """Every bucket the production geometry family can emit (BUCKET=32
    multiples up to rw_grid_cap, radius 5) runs the f32-exact stencil on
    TPU — no bucket silently falls back to the bf16-compounding dense
    matmul chain (the round-3 accuracy bug class)."""
    monkeypatch.delenv("IRN_TPU_APPLY", raising=False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    cfg = Config()
    walker = RandomWalkRunner(cfg, n_seed_rows=20)
    b = RandomWalkRunner.BUCKET
    for cap_h in range(b, cfg.rw_grid_cap + 1, b):
        for cap_w in range(b, cfg.rw_grid_cap + 1, b):
            assert walker.resolve_mode(cap_h, cap_w) == "diag", (
                cap_h, cap_w)


def test_resolve_mode_matches_chunked_flags(monkeypatch):
    """resolve_mode's claim that fused and chunked dispatch agree, checked
    against the chunked path's actual flag computation for a mesh config
    (the path with the most gates)."""
    monkeypatch.delenv("IRN_TPU_APPLY", raising=False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    w = RandomWalkRunner(Config(rw_mesh_model=8, **SMALL), n_seed_rows=4)
    geom = rw_mod.build_geometry(16, 16, radius=2)
    sq, banded = w._resolve(geom)
    assert not banded and w._mesh_diag(geom, sq)  # == "mesh_diag"
    assert w.resolve_mode(16, 16) == "mesh_diag"
