"""Stencil-chain headroom sweep (VERDICT r3 #7).

The production random walk (e=0 diagonal stencil, ops/random_walk.
apply_diag_chain) runs 2^E = 256 applications of a 69-diagonal operator.
Three untested points that could beat it:

(a) ONE diagonal-operator squaring: T^2 is still diagonal-sparse — its
    offset set is the sumset S+S (measured: 249 distinct diagonals at
    radius 5, pw=138; NOT the 2x69 a bandwidth argument suggests) — so
    the chain becomes 128 applications of a 249-diagonal stencil plus a
    69^2-product per-image operator build. Raw multiply-adds: 249*128 =
    1.8x the baseline's 69*256, so it only wins if the chain is
    loop-overhead-bound rather than VPU-throughput-bound.
(b) two applications fused per fori_loop body (half the loop trips, same
    math, more ILP per trip).
(c) the 8-row bucket image-batched: B images' chains in one program
    ([B, 8, n] operands, per-image operators). Round 3 rejected batching
    at C=20 rows; C=8 exactly fills the f32 sublane tile, so re-try.

Every variant is decode-checked against the baseline chain on the same
inputs. Methodology per CLAUDE.md: distinct pre-uploaded inputs per rep,
scalar fetches, best-of over passes.

Usage: PYTHONPATH=. python tools/bench_stencil_sweep.py [--reps 8]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from irn_tpu.ops import random_walk as rw


def shift(v: jax.Array, d: int) -> jax.Array:
    """out[..., c] = v[..., c - d], zero-filled (any sign of d)."""
    if d == 0:
        return v
    if d > 0:
        return jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(d, 0)])[..., :-d]
    return jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(0, -d)])[..., -d:]


def general_diags(w, inv, doffs):
    """(offsets, values) general diagonal form of T: T[c-s, c] = v_s[c].

    From build_diag_operator's (w, inv): v_0 = inv, v_{+d}[c] =
    w[k, c-d]*inv[c], v_{-d}[c] = w[k, c]*inv[c]."""
    vals = {0: inv}
    for k, d in enumerate(doffs):
        vals[d] = shift(w[k], d) * inv
        vals[-d] = w[k] * inv
    return vals


def square_diags(vals: dict) -> dict:
    """T^2 in general diagonal form: v2_s[c] = sum_{s1+s2=s}
    v_{s1}[c - s2] * v_{s2}[c]."""
    out = {}
    for s1, v1 in vals.items():
        for s2, v2 in vals.items():
            term = shift(v1, s2) * v2
            s = s1 + s2
            out[s] = out.get(s, 0.0) + term
    return out


def apply_general_chain(x, offs, vs, n_apply):
    """x @ T^n_apply with T = general diagonal stack (offs, vs [S, n])."""
    h = int(max(abs(int(s)) for s in offs))
    n = x.shape[-1]

    def body(_, x):
        xpad = jnp.pad(x, ((0, 0), (h, h)))
        acc = jnp.zeros_like(x)
        for j, s in enumerate(offs):
            acc = acc + xpad[:, h - s : h - s + n] * vs[j][None]
        return acc

    return jax.lax.fori_loop(0, n_apply, body, x)


def apply_diag_chain_fused2(x, w, inv, doffs, n_apply):
    """apply_diag_chain with TWO applications per loop body."""
    assert n_apply % 2 == 0
    h = max(doffs)
    n = x.shape[-1]
    wpad = jnp.pad(w, ((0, 0), (h, h)))

    def one(x):
        xpad = jnp.pad(x, ((0, 0), (h, h)))
        acc = x
        for k, d in enumerate(doffs):
            acc = (
                acc
                + xpad[:, h - d : h - d + n] * wpad[k, h - d : h - d + n][None]
                + xpad[:, h + d : h + d + n] * w[k][None]
            )
        return acc * inv[None]

    return jax.lax.fori_loop(0, n_apply // 2, lambda _, x: one(one(x)), x)


def apply_diag_chain_batched(x, w, inv, doffs, n_apply):
    """[B, C, n] chains with per-image (w [B, K, n], inv [B, n])."""
    h = max(doffs)
    n = x.shape[-1]
    wpad = jnp.pad(w, ((0, 0), (0, 0), (h, h)))

    def body(_, x):
        xpad = jnp.pad(x, ((0, 0), (0, 0), (h, h)))
        acc = x
        for k, d in enumerate(doffs):
            acc = (
                acc
                + xpad[:, :, h - d : h - d + n]
                * wpad[:, k, h - d : h - d + n][:, None]
                + xpad[:, :, h + d : h + d + n] * w[:, k][:, None]
            )
        return acc * inv[:, None]

    return jax.lax.fori_loop(0, n_apply, body, x)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--rows", type=int, default=8)
    ap.add_argument("--exp", type=int, default=8)
    args = ap.parse_args()

    geom = rw.build_geometry(96, 128, radius=5)
    doffs = rw.diag_offsets(geom)
    n = geom.n_pad
    e = args.exp
    rng = np.random.default_rng(0)
    reps = args.reps
    print(f"geometry (96,128) n_pad={n}, rows={args.rows}, 2^{e} applies, "
          f"{reps} distinct inputs, backend={jax.default_backend()}")

    edges = [
        jnp.asarray(rng.random((96, 128)).astype(np.float32) * 0.9)
        for _ in range(reps + 1)
    ]
    xs = [
        jnp.asarray(rng.random((args.rows, n)).astype(np.float32))
        for _ in range(reps + 1)
    ]

    build = jax.jit(
        functools.partial(rw.build_diag_operator, geom, beta=10)
    )

    @jax.jit
    def base_chain(x, edge):
        w, inv = build(edge)
        return rw.apply_diag_chain(x, w, inv, doffs, 1 << e).sum(axis=-1)

    @jax.jit
    def fused2_chain(x, edge):
        w, inv = build(edge)
        return apply_diag_chain_fused2(x, w, inv, doffs, 1 << e).sum(axis=-1)

    s1_offs = sorted({0, *doffs, *(-d for d in doffs)})
    s2_offs = sorted({a + b for a in s1_offs for b in s1_offs})

    @jax.jit
    def squared_chain(x, edge):
        w, inv = build(edge)
        v2 = square_diags(general_diags(w, inv, doffs))
        vs = jnp.stack([v2[s] for s in s2_offs])
        return apply_general_chain(x, tuple(s2_offs), vs, 1 << (e - 1)).sum(
            axis=-1
        )

    def bench(fn, inputs, label, batched=False):
        # warmup fetch (the tunnel defers execution until a value fetch
        # and value-caches identical executions; CLAUDE.md)
        float(fn(*inputs[-1])[0] if not batched else fn(*inputs[-1])[0, 0])
        t0 = time.perf_counter()
        out = None
        for a in inputs[:-1]:
            out = fn(*a)
        float(out[0] if not batched else out[0, 0])
        dt = (time.perf_counter() - t0) / (len(inputs) - 1)
        print(f"{label:28s} {dt * 1e3:8.2f} ms/chain", flush=True)
        return dt

    t_base = bench(base_chain, list(zip(xs, edges)), "baseline e=0 (69 diags)")
    t_f2 = bench(fused2_chain, list(zip(xs, edges)), "2 applies fused/body")
    t_sq = bench(squared_chain, list(zip(xs, edges)),
                 f"e=1 squared op ({len(s2_offs)} diags)")

    # numeric check: squared operator vs sequential applications
    ref = np.asarray(base_chain(xs[0], edges[0]))
    got = np.asarray(squared_chain(xs[0], edges[0]))
    rel = np.abs(got - ref) / np.maximum(np.abs(ref), 1e-30)
    print(f"e=1 vs baseline row-sum max rel dev: {rel.max():.2e}")

    # (c) image-batched at the 8-row bucket
    for b in (2, 4):
        ebs = [jnp.stack([edges[i + j] for j in range(b)])
               for i in range(0, reps + 1 - b, b)]
        xbs = [jnp.stack([xs[i + j] for j in range(b)])
               for i in range(0, reps + 1 - b, b)]

        @jax.jit
        def batched_chain(xb, eb):
            w, inv = jax.vmap(build)(eb)
            return apply_diag_chain_batched(
                xb, w, inv, doffs, 1 << e
            ).sum(axis=-1)

        t_b = bench(batched_chain, list(zip(xbs, ebs)),
                    f"image-batched B={b}", batched=True)
        print(f"  -> {t_b / b * 1e3:8.2f} ms/image "
              f"({t_base / (t_b / b):.2f}x vs baseline)", flush=True)


if __name__ == "__main__":
    main()
