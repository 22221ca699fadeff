"""Can the backbone's 3x3 convs beat XLA's conv emitter as shifted GEMMs?

make_cam's device chain is conv-bound at ~23% of bf16 peak (BASELINE.md
round-3 ablation; the same forwards bound train_cam and the composed
make_sem_seg edge pass). XLA lowers NHWC convs through its own TPU conv
emitter; the alternative formulation for stride-1 dilation-1 3x3 convs is
nine shifted [B*H*W, C] @ [C, F] GEMMs accumulated in f32 — the MXU sees
large plain matmuls instead of a convolution schedule. This tool measures
both on the production shapes (the scale-2.0 make_cam pass at
cam_infer_batch=32 => batch 64, plus the train_cam 512^2 bs16 shapes) so
the integrate-or-refute decision is recorded with numbers, like the
matpow/apply-chain decisions (BASELINE.md).

Reference being rebuilt: /root/reference/net/resnet50.py bottleneck 3x3s.
"""

import time

import numpy as np


def conv_xla(x, k):
    import jax.lax as lax

    return lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=np.float32,
    )


def conv_gemm(x, k):
    """Nine shifted GEMMs: y[b,i,j,f] = sum_{dy,dx} xpad[b,i+dy,j+dx,:] @
    k[dy,dx]. Same math as SAME-padded 3x3 conv, f32 accumulation."""
    import jax.numpy as jnp

    b, h, w, c = x.shape
    f = k.shape[-1]
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            sl = xpad[:, dy : dy + h, dx : dx + w, :].reshape(-1, c)
            t = jnp.dot(sl, k[dy, dx], preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
    return acc.reshape(b, h, w, f)


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    # (label, B, H, W, C, F): make_cam scale-2.0 pass at k=32 (batch 2K=64)
    # c3/c4/c5 bottleneck 3x3s; train_cam bs16 512^2 c4; edge-runner c4.
    shapes = [
        ("make_cam s2.0 c3 3x3x128", 64, 125, 94, 128, 128),
        ("make_cam s2.0 c4 3x3x256", 64, 63, 47, 256, 256),
        ("make_cam s2.0 c5 3x3x512", 64, 63, 47, 512, 512),
        ("train/edge 512^2 c4 3x3x256", 16, 32, 32, 256, 256),
    ]
    n_rep = 8
    for label, b, h, w, c, f in shapes:
        # generate inputs ON device (CLAUDE.md: GB-size uploads through the
        # relay take minutes; these activations are ~190 MB each)
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
        for name, fn in (("xla_conv", conv_xla), ("gemm9", conv_gemm)):
            g = jax.jit(lambda x: fn(x, k).astype(jnp.float32).sum())
            outs[name] = float(g(xs[0]))
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                for x in xs:
                    out = g(x)
                float(out)
                best = min(best, (time.time() - t0) / n_rep)
            row.append(f"{name} {best*1e3:7.2f} ms {gflop/best/1e3:6.1f} TF")
        rel = abs(outs["xla_conv"] - outs["gemm9"]) / (
            abs(outs["xla_conv"]) + 1e-9
        )
        row.append(f"rel {rel:.1e}")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
