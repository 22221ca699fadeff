"""Device (TPU) dense-CRF mean field — the one pipeline component that had
no TPU in it (cam_to_ir_label ran the native lattice on host CPU,
step/cam_to_ir_label.py:29-34 / misc/imutils.py:156-170).

The exact CRF operator is approximated with structure XLA/MXU can run flat
out, instead of the permutohedral lattice's scatter/gather (TPU-hostile):

- **Gaussian kernel (sxy=3, compat=3): exact.** Small spatial support →
  truncated separable convolution (|tap| <= 4 sigma, error < 4e-4), with
  the symmetric normalization's row sums computed by convolving the
  validity mask (exact border handling).
- **Bilateral kernel (sxy=50, srgb=5, compat=10): landmark subgrid.**
  Every pixel exchanges messages with a stride-``s`` spatial subgrid of
  landmark pixels; the 5-D kernel to each landmark is evaluated EXACTLY
  (no color quantization — the cross term is one [N,5]@[5,S] matmul, then
  one fused exp), so color edges stay sharp. Each mean-field iteration is
  then a single [N, S] @ [S, 2L] MXU matmul with the kernel matrix
  HBM-resident in bf16. The spatial sigma of 50 px is far coarser than
  the default stride of 4, so the subsampling loses little (measured:
  97-99% argmax agreement with the exact O(N^2) operator, vs 99.6% for
  the production lattice — tests/test_crf_tpu.py).

Both kernels keep the DenseCRF v2 conventions pinned by the exact oracle
in tests/test_crf_cc.py: unit-variance kernels on 1/sxy- and 1/srgb-scaled
features, symmetric D^-1/2 K D^-1/2 normalization, self term included,
positive-Potts update, unary = log gt_prob / log((1-gt_prob)/(n-1)).

The fg/bg pair of the ir-label stage (same image, two unaries) shares one
kernel build and folds into the same matmuls ([S, 2L] right operand).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _toeplitz(n: int, taps: jax.Array) -> jax.Array:
    """[n, n] banded Toeplitz blur matrix: T[i, j] = taps[j - i + r]."""
    r = (taps.shape[0] - 1) // 2
    i = jnp.arange(n)
    d = i[None, :] - i[:, None] + r
    return jnp.where(
        (d >= 0) & (d < taps.shape[0]), taps[jnp.clip(d, 0, taps.shape[0] - 1)],
        0.0,
    )


def _sep_gauss(x: jax.Array, th: jax.Array, tw: jax.Array) -> jax.Array:
    """Separable 2-D Gaussian blur as two MXU matmuls, zero padding.

    x: [C, H, W]; th/tw: [H, H] / [W, W] Toeplitz blur matrices
    (:func:`_toeplitz`). Single-channel depthwise convs leave the MXU idle
    on TPU (feature dim 1) — the dense banded matmul formulation runs the
    same math at matrix-unit rates."""
    hp = jax.lax.Precision.HIGHEST
    x = jnp.einsum("chw,wv->chv", x, tw, precision=hp)
    return jnp.einsum("chw,hu->cuw", x, th, precision=hp)


@functools.partial(
    jax.jit,
    static_argnames=("hw", "n_label_cap", "stride", "t", "sxy_gaussian",
                     "compat_gaussian", "sxy_bilateral", "srgb_bilateral",
                     "compat_bilateral", "matmul_dtype", "stream_kernel",
                     "kernel_store"),
)
def crf_pair_packed_program(
    packed_u8: jax.Array,     # [5, H, W] uint8: RGB planes + labels a, b
    eh: jax.Array,
    ew: jax.Array,
    n_labels: jax.Array,
    gt_prob: jax.Array,
    *,
    hw: Tuple[int, int],
    n_label_cap: int = 21,
    stride: int = 4,
    t: int = 10,
    sxy_gaussian: float = 3.0,
    compat_gaussian: float = 3.0,
    sxy_bilateral: float = 50.0,
    srgb_bilateral: float = 5.0,
    compat_bilateral: float = 10.0,
    matmul_dtype: str = "bfloat16",
    stream_kernel: bool = False,
    kernel_store: str = "dense",
) -> jax.Array:
    """:func:`crf_pair_program` from ONE packed uint8 upload.

    Label ids are < n_label_cap <= 255, so the image and both label maps
    travel as five uint8 planes (~1 MB at the 384x512 bucket) instead of
    an image + two int32 maps (~2.2 MB over three transfers) — the
    ir-label stage's host->device traffic more than halves and pays one
    transfer boundary instead of three."""
    return crf_pair_program(
        jnp.moveaxis(packed_u8[:3], 0, -1),
        packed_u8[3].astype(jnp.int32),
        packed_u8[4].astype(jnp.int32),
        eh, ew, n_labels, gt_prob,
        hw=hw, n_label_cap=n_label_cap, stride=stride, t=t,
        sxy_gaussian=sxy_gaussian, compat_gaussian=compat_gaussian,
        sxy_bilateral=sxy_bilateral, srgb_bilateral=srgb_bilateral,
        compat_bilateral=compat_bilateral, matmul_dtype=matmul_dtype,
        stream_kernel=stream_kernel, kernel_store=kernel_store,
    )


@functools.partial(
    jax.jit,
    static_argnames=("hw", "n_label_cap", "stride", "t", "sxy_gaussian",
                     "compat_gaussian", "sxy_bilateral", "srgb_bilateral",
                     "compat_bilateral", "matmul_dtype", "stream_kernel",
                     "kernel_store"),
)
def crf_pair_program(
    img_u8: jax.Array,        # [H, W, 3] uint8 (zero-padded to the bucket)
    labels_a: jax.Array,      # [H, W] int32 in [0, n_labels)
    labels_b: jax.Array,
    eh: jax.Array,            # true extent (scalars)
    ew: jax.Array,
    n_labels: jax.Array,      # per-image label count (<= n_label_cap)
    gt_prob: jax.Array,
    *,
    hw: Tuple[int, int],
    n_label_cap: int = 21,
    stride: int = 4,
    t: int = 10,
    sxy_gaussian: float = 3.0,
    compat_gaussian: float = 3.0,
    sxy_bilateral: float = 50.0,
    srgb_bilateral: float = 5.0,
    compat_bilateral: float = 10.0,
    matmul_dtype: str = "bfloat16",
    stream_kernel: bool = False,
    kernel_store: str = "dense",
) -> jax.Array:
    """Refine two hard label maps sharing one image; returns [2, H, W] i32.

    One compilation per (bucket shape, hyper) combination; extent and label
    count are traced scalars, so every image in a bucket reuses the program.

    ``kernel_store``: "dense" keeps the [N, S] landmark kernel in
    ``matmul_dtype`` (bf16); "int8" stores it symmetrically quantized
    (scale 127 — entries live in [0, 1]) and runs each iteration's
    message matmul as an int8 x int8 -> int32 MXU dot with the landmark
    activations per-column quantized on the fly. The matmul is ~11x
    below v5e's compute/bandwidth balance point (42 flops per kernel
    byte at bf16), so halving the kernel bytes halves the iteration
    cost; the row-sum normalization uses the DEQUANTIZED kernel, so the
    operator stays symmetric-normalized exactly as stored. Quantization
    noise is ~0.4% per entry pre-normalization — measured agreement in
    tools/bench_crf.py (--kstore int8)."""
    h, w = hw
    n = h * w
    cap = n_label_cap
    mdt = jnp.dtype(matmul_dtype)

    ys, xs = jnp.mgrid[0:h, 0:w]
    valid = ((ys < eh) & (xs < ew)).astype(jnp.float32)  # [H, W]

    # ---- bilateral landmark kernel --------------------------------------
    img = img_u8.astype(jnp.float32)
    feats = jnp.concatenate(
        [
            (xs / sxy_bilateral).astype(jnp.float32)[..., None],
            (ys / sxy_bilateral).astype(jnp.float32)[..., None],
            img / srgb_bilateral,
        ],
        axis=-1,
    )  # [H, W, 5]
    off = stride // 2
    f_land = feats[off::stride, off::stride].reshape(-1, 5)
    v_land = valid[off::stride, off::stride].reshape(-1)   # [S]
    f_n = feats.reshape(n, 5)

    # chunked build: the [N, S] f32 cross/exp intermediates would peak at
    # ~2x9.7 GB at the 384x512 bucket — stream 4096-row chunks instead
    # (bucket sides are multiples of 64, so 4096 | N) and materialize only
    # the bf16 kernel matrix + f32 row sums
    sq_land = (f_land**2).sum(1)

    int8_store = kernel_store == "int8"
    assert kernel_store in ("dense", "int8"), kernel_store
    # streaming recomputes the kernel every iteration — quantized storage
    # has nothing to store, the modes are alternatives, not composable
    assert not (stream_kernel and int8_store)
    if int8_store:
        # i32 accumulator headroom: S terms of at most 127*127 each
        n_land = len(range(off, h, stride)) * len(range(off, w, stride))
        assert n_land * 127 * 127 < 2**31, n_land

    def build_chunk(f_c):
        cross = jnp.dot(f_c, f_land.T, precision=jax.lax.Precision.HIGHEST)
        d2 = (f_c**2).sum(1)[:, None] + sq_land[None, :] - 2.0 * cross
        k = jnp.exp(-0.5 * jnp.maximum(d2, 0.0)) * v_land[None, :]
        if int8_store:
            # entries live in [0, 1]: symmetric scale 127, and the row
            # sums come from the QUANTIZED values so the D^-1/2 K D^-1/2
            # normalization matches the kernel actually applied
            kq = jnp.round(k * 127.0)
            return kq.astype(jnp.int8), kq.sum(1) * np.float32(1.0 / 127.0)
        return k.astype(mdt), k.sum(1)

    # largest divisor of n that is <= 4096 — never fall back to chunk=n
    # (a non-64-multiple bucket would otherwise materialize the full
    # [N, S] f32 intermediates this chunking exists to bound)
    chunk = max(c for c in range(1, min(4096, n) + 1) if n % c == 0)
    f_chunks = f_n.reshape(-1, chunk, 5)
    if stream_kernel:
        # never materialize the [N, S] kernel (4.8 GB bf16 at the 384x512
        # stride-4 bucket — each of the t iterations would re-read it from
        # HBM, ~60 ms at v5e bandwidth): keep only the f32 row sums now
        # and recompute kernel chunks fused with the per-iteration matmul.
        # The recomputed bf16 chunks are the exact values build_chunk
        # stores, so both modes decode bit-identically. MEASURED AND
        # REFUTED as a default on v5e: 357 vs 131.5 ms/img at stride 4
        # (tools/bench_crf.py --stream, BASELINE.md round-4) — the VPU
        # exp recompute (~2.4e9 transcendentals/iteration) costs ~4x the
        # HBM re-reads it saves. Kept for HBM-constrained cases (the
        # materialized matrix is the wrapper's largest live buffer).
        k_land = None
        d_b = jax.lax.map(lambda f: build_chunk(f)[1], f_chunks).reshape(n)
    else:
        k_land, d_b = jax.lax.map(build_chunk, f_chunks)
        k_land = k_land.reshape(n, -1)
        d_b = d_b.reshape(n)                                # [N] f32
    nr_b = jax.lax.rsqrt(jnp.maximum(d_b, 1e-12)).reshape(h, w)
    nr_b = nr_b * valid

    # ---- gaussian separable kernel --------------------------------------
    r = int(np.ceil(4.0 * sxy_gaussian))
    taps = jnp.exp(
        -0.5 * (jnp.arange(-r, r + 1, dtype=jnp.float32) / sxy_gaussian) ** 2
    )
    th = _toeplitz(h, taps)
    tw = _toeplitz(w, taps)
    d_g = _sep_gauss(valid[None], th, tw)[0]
    nr_g = jax.lax.rsqrt(jnp.maximum(d_g, 1e-12)) * valid

    # ---- unaries ---------------------------------------------------------
    p_other = (1.0 - gt_prob) / jnp.maximum(
        n_labels.astype(jnp.float32) - 1.0, 1.0
    )
    chans = jnp.arange(cap)

    def unary_of(lab):
        one = jax.nn.one_hot(lab, cap, axis=0, dtype=jnp.float32)
        u = one * jnp.log(gt_prob) + (1.0 - one) * jnp.log(p_other)
        # channels beyond this image's label count can never win
        return jnp.where((chans < n_labels)[:, None, None], u, -1e30)

    u = jnp.stack([unary_of(labels_a), unary_of(labels_b)])  # [2, cap, H, W]

    q = jax.nn.softmax(u, axis=1)
    for _ in range(t):  # static 10 — unrolled (loop-carried buffers lose)
        qm = q * valid
        # gaussian message (exact)
        mg = compat_gaussian * nr_g * _sep_gauss(
            (nr_g * qm).reshape(2 * cap, h, w), th, tw
        ).reshape(2, cap, h, w)
        # bilateral landmark message: one [N, S] @ [S, 2L] matmul
        qb = nr_b * qm                                      # [2, cap, H, W]
        q_land = qb[:, :, off::stride, off::stride].reshape(2 * cap, -1)
        if stream_kernel:
            qlT = q_land.T.astype(mdt)                       # [S, 2L]
            mb_flat = jax.lax.map(
                lambda f: jnp.dot(build_chunk(f)[0], qlT,
                                  preferred_element_type=jnp.float32),
                f_chunks,
            ).reshape(n, -1)                                 # [N, 2L] f32
        elif int8_store:
            # int8 x int8 -> int32 MXU dot: the landmark activations are
            # nonnegative (softmax x rsqrt row norms), so one per-column
            # max is an exact symmetric scale; the kernel side carries
            # the static 1/127 from build_chunk
            qlT = q_land.T                                   # [S, 2L] f32
            qscale = jnp.maximum(jnp.max(qlT, axis=0), 1e-20)
            q8 = jnp.round(qlT * (127.0 / qscale)).astype(jnp.int8)
            mb_flat = jnp.dot(
                k_land, q8, preferred_element_type=jnp.int32
            ).astype(jnp.float32) * (
                qscale * np.float32(1.0 / (127.0 * 127.0))
            )[None, :]                                       # [N, 2L] f32
        else:
            mb_flat = jnp.dot(
                k_land, q_land.T.astype(mdt),
                preferred_element_type=jnp.float32,
            )                                                # [N, 2L] f32
        mb = compat_bilateral * nr_b.reshape(n, 1) * mb_flat
        mb = mb.T.reshape(2, cap, h, w)
        q = jax.nn.softmax(u + mg + mb, axis=1)

    # uint8: labels < n_label_cap <= 255, and the device->host fetch is 4x
    # smaller (the tunnel pays per byte)
    return jnp.argmax(q, axis=1).astype(jnp.uint8)           # [2, H, W]


class LandmarkCRF:
    """Host wrapper: pads to shape buckets, runs :func:`crf_pair_program`
    on device, crops. Drop-in for
    :func:`irn_tpu.ops.crf.crf_inference_label_pair` (the hyper defaults
    match the reference call, imutils.py:156-166)."""

    def __init__(
        self,
        stride: int = 4,
        t: int = 10,
        pad_multiple: int = 64,
        n_label_cap: int = 21,
        matmul_dtype: str = "bfloat16",
        stream_kernel: bool = False,
        kernel_store: str = "dense",
        device=None,
    ):
        self.stride = stride
        self.t = t
        self.pad_multiple = pad_multiple
        self.n_label_cap = n_label_cap
        self.matmul_dtype = matmul_dtype
        self.stream_kernel = stream_kernel
        self.kernel_store = kernel_store
        self.device = device

    def _bucket(self, h: int, w: int) -> Tuple[int, int]:
        m = self.pad_multiple
        return (-(-h // m) * m, -(-w // m) * m)

    def pair(
        self,
        img: np.ndarray,
        labels_a: np.ndarray,
        labels_b: np.ndarray,
        n_labels: int = 21,
        gt_prob: float = 0.7,
        **kernel_kw,
    ) -> Tuple[np.ndarray, np.ndarray]:
        h, w = labels_a.shape
        ph, pw = self._bucket(h, w)
        assert self.n_label_cap <= 255  # labels ride uint8 planes
        # a label >= n_label_cap would silently wrap mod 256 in the uint8
        # pack (and silently one-hot to nothing past the cap even before
        # the pack) — fail loudly instead (ADVICE r4)
        assert labels_a.max(initial=0) < self.n_label_cap, (
            int(labels_a.max()), self.n_label_cap)
        assert labels_b.max(initial=0) < self.n_label_cap, (
            int(labels_b.max()), self.n_label_cap)
        packed = np.zeros((5, ph, pw), np.uint8)
        packed[:3, :h, :w] = np.moveaxis(img, -1, 0)
        packed[3, :h, :w] = labels_a
        packed[4, :h, :w] = labels_b
        packed = jnp.asarray(packed)
        if self.device is not None:
            packed = jax.device_put(packed, self.device)
        out = crf_pair_packed_program(
            packed,
            jnp.int32(h), jnp.int32(w), jnp.int32(n_labels),
            jnp.float32(gt_prob),
            hw=(ph, pw), n_label_cap=self.n_label_cap, stride=self.stride,
            t=self.t, matmul_dtype=self.matmul_dtype,
            stream_kernel=self.stream_kernel,
            kernel_store=self.kernel_store, **kernel_kw,
        )
        out = np.asarray(out)
        return out[0, :h, :w], out[1, :h, :w]

    def single(self, img, labels, n_labels: int = 21, gt_prob: float = 0.7,
               **kw) -> np.ndarray:
        a, _ = self.pair(img, labels, labels, n_labels, gt_prob, **kw)
        return a
