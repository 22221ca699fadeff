"""A REAL halo-pipelined VMEM-resident Pallas 3x3 conv probe (VERDICT r3
#4 / ROADMAP gap 5).

Round 3's refutation compared XLA's conv emitter against nine *separate*
shifted GEMMs that re-stream the activation from HBM per tap — a strawman.
This kernel streams the activation from HBM ONCE and keeps everything else
in VMEM:

- grid (B, H/BH): the whole padded image is one input block, held resident
  across the h-minor grid steps (the index map ignores the h coordinate,
  so Mosaic fetches each image once and double-buffers the next image
  against compute);
- per step, the kernel builds a lane-concatenated im2col slab
  S'[BH+2, Wp, 3C] from two sublane-shifted copies (the dx taps), then
  runs THREE fat MXU GEMMs — A'_dy [BH*Wp, 3C] @ K'_dy [3C, F], one per
  dy row tap, K = 384 deep — into an f32 VMEM accumulator. The dy slices
  of S' are leading-dim slices (free); no gather, no HBM re-streaming.

Shapes: the heaviest make_cam pass (scale-2.0 c3: 64x125x94x128, XLA
4.6 ms / 48 TF, tools/bench_conv.py) + the other production 3x3s.
Decision rule per VERDICT r3 #4: >= 1.2x over XLA's emitter wires it
behind an env flag; anything less records the refutation with a real
kernel as evidence.

Usage: PYTHONPATH=. python tools/bench_conv_pallas.py
"""

from __future__ import annotations

import functools
import time

import numpy as np


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def conv3x3_pallas(x, k, bh: int):
    """SAME 3x3 stride-1 conv, NHWC bf16, f32 accumulation.

    x: [B, H, W, C] bf16; k: [3, 3, C, F] bf16. Returns [B, H, W, F] bf16.
    H must divide into bh-row blocks.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    f = k.shape[-1]
    assert h % bh == 0, (h, bh)
    nh = h // bh
    wo = _round_up(w, 8)          # sublane-aligned output width
    wp = _round_up(wo + 2, 8)     # input width: wo + both dx halos
    # zero halo: rows 0 / h+1, cols 0 / w+1 (cols beyond stay zero)
    xpad = jnp.zeros((b, h + 2, wp, c), x.dtype)
    xpad = xpad.at[:, 1 : h + 1, 1 : w + 1, :].set(x)
    # K'[dy]: [3C, F], row dx*C + c = k[dy, dx, c, f]
    kk = jnp.transpose(k, (0, 1, 2, 3)).reshape(3, 3 * c, f)

    m = bh * wo

    def kernel(x_ref, k_ref, o_ref, sp_ref):
        hb = pl.program_id(1)
        slab = x_ref[0, pl.ds(hb * bh, bh + 2)]          # [bh+2, wp, c]
        # im2col along lanes: S'[r, j, dx*C:] = slab[r, j+dx, :]
        # (stores relayout the sublane-offset dx slices; a lane concat of
        # offset-mismatched vectors is unimplemented in Mosaic)
        for dx in range(3):
            sp_ref[:, :, dx * c : (dx + 1) * c] = slab[:, dx : dx + wo, :]
        acc = jnp.zeros((m, f), jnp.float32)
        for dy in range(3):
            a = sp_ref[dy : dy + bh].reshape(m, 3 * c)   # leading-dim slice
            acc = acc + jnp.dot(
                a, k_ref[dy], preferred_element_type=jnp.float32
            )
        o_ref[0] = acc.reshape(bh, wo, f).astype(o_ref.dtype)

    flops = 2 * b * h * wo * 9 * c * f
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, wo, f), x.dtype),
        grid=(b, nh),
        in_specs=[
            # whole padded image resident; h-minor steps reuse it
            pl.BlockSpec(
                (1, h + 2, wp, c), lambda i, j: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bh, wo, f), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((bh + 2, wo, 3 * c), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=x.size * 2 + b * h * wo * f * 2,
            transcendentals=0,
        ),
    )(xpad, kk)
    return out[:, :, :w, :]


def conv_xla(x, k):
    import jax.lax as lax
    import jax.numpy as jnp

    return lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    # (label, B, H, W, C, F, bh): bh divides H
    shapes = [
        ("make_cam s2.0 c3 3x3x128", 64, 125, 94, 128, 128, 25),
        ("make_cam s2.0 c4 3x3x256", 64, 63, 47, 256, 256, 21),
        ("make_cam s2.0 c5 3x3x512", 64, 63, 47, 512, 512, 9),
        ("train/edge 512^2 c4 3x3x256", 16, 32, 32, 256, 256, 16),
    ]
    n_rep = 8
    for label, b, h, w, c, f, bh in shapes:
        keys = jax.random.split(jax.random.PRNGKey(0), n_rep)
        gen = jax.jit(
            lambda kk: jax.random.normal(kk, (b, h, w, c), jnp.bfloat16)
        )
        xs = [gen(kk) for kk in keys]
        k = jnp.asarray(rng.standard_normal((3, 3, c, f)) * 0.05,
                        jnp.bfloat16)
        float(xs[-1].sum().astype(jnp.float32))
        gflop = 2.0 * b * h * w * c * f * 9 / 1e9

        row = [f"{label}: {gflop:7.1f} GFLOP"]
        outs = {}
        fns = (
            ("xla_conv", conv_xla),
            ("pallas", functools.partial(conv3x3_pallas, bh=bh)),
        )
        for name, fn in fns:
            g = jax.jit(lambda x, fn=fn: fn(x, k).astype(jnp.float32).sum())
            outs[name] = float(g(xs[0]))
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                for x in xs:
                    out = g(x)
                float(out)
                best = min(best, (time.time() - t0) / n_rep)
            row.append(f"{name} {best*1e3:7.2f} ms {gflop/best/1e3:6.1f} TF")
        rel = abs(outs["xla_conv"] - outs["pallas"]) / (
            abs(outs["xla_conv"]) + 1e-9
        )
        row.append(f"rel {rel:.1e}")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
