"""Device (landmark-kernel) CRF tests: exact-oracle agreement, pair
consistency, bucket invariance, and stage-level backend A/B.

The landmark CRF (irn_tpu/ops/crf_tpu.py) replaces the host permutohedral
lattice with an exact separable Gaussian + strided-landmark bilateral whose
mean-field iteration is one MXU matmul. It approximates the same exact
operator the lattice approximates — both are held against the brute-force
O(N^2) mean field here (conventions pinned in tests/test_crf_cc.py)."""

import dataclasses
import os

import imageio.v2 as imageio
import numpy as np

from irn_tpu.ops import crf, crf_tpu


def _scene(rng, h, w):
    img = np.full((h, w, 3), 50.0)
    img[:, : w // 2] = (190, 70, 60)
    img[h // 2:, w // 2:] = (70, 170, 90)
    img[10:12, :] = (240, 230, 40)
    img = np.clip(img + rng.normal(0, 10, (h, w, 3)), 0, 255)
    labels = np.zeros((h, w), np.int32)
    labels[:, : w // 2 - 2] = 5
    labels[h // 2 + 2:, w // 2:] = 12
    labels[10:12, ::3] = 7
    labels[rng.random((h, w)) < 0.06] = 18
    return img.astype(np.uint8), labels


def _exact_mean_field(img, labels, t, n_labels, gt_prob):
    """Brute-force dense CRF (same conventions as tests/test_crf_cc.py)."""
    h, w = labels.shape
    n = h * w
    ys, xs = np.mgrid[0:h, 0:w]
    fg = np.stack([xs / 3.0, ys / 3.0], -1).reshape(n, 2)
    fb = np.concatenate(
        [np.stack([xs / 50.0, ys / 50.0], -1).reshape(n, 2),
         img.reshape(n, 3).astype(np.float64) / 5.0], axis=1)
    p_other = (1.0 - gt_prob) / max(n_labels - 1, 1)
    un = np.full((n, n_labels), np.log(p_other))
    un[np.arange(n), labels.reshape(-1)] = np.log(gt_prob)
    mats = []
    for f, wgt in ((fg, 3.0), (fb, 10.0)):
        d2 = ((f[:, None, :] - f[None, :, :]) ** 2).sum(-1)
        k = np.exp(-0.5 * d2)
        nr = 1 / np.sqrt(k.sum(1))
        mats.append(wgt * (nr[:, None] * k * nr[None, :]))

    def softmax(x):
        e = np.exp(x - x.max(1, keepdims=True))
        return e / e.sum(1, keepdims=True)

    q = softmax(un)
    for _ in range(t):
        q = softmax(un + mats[0] @ q + mats[1] @ q)
    return q.argmax(1).reshape(h, w)


def test_landmark_crf_matches_exact_oracle(rng):
    """>= 95% argmax agreement with the brute-force dense mean field at
    full pipeline parameters (the production lattice sits at ~99.5% on the
    same scene — the landmark subsampling is the only extra approximation,
    and the padded-bucket run must equal the oracle computed at TRUE size,
    which also pins the extent masking)."""
    img, labels = _scene(rng, 48, 60)  # bucket pads to 64x64
    want = _exact_mean_field(img, labels, 10, 21, 0.7)
    got = crf_tpu.LandmarkCRF(stride=4, matmul_dtype="float32").single(
        img, labels, n_labels=21
    )
    agree = (got == want).mean()
    assert agree >= 0.95, agree
    # bf16 kernel storage must not move labels materially
    got16 = crf_tpu.LandmarkCRF(stride=4).single(img, labels, n_labels=21)
    assert (got16 == got).mean() >= 0.99


def test_landmark_crf_agrees_with_native_lattice(rng):
    """Backend A/B at op level: the two approximations of the same exact
    operator must agree on nearly all pixels."""
    img, labels = _scene(rng, 48, 60)
    la = labels
    lb = (labels > 0).astype(np.int32)
    wa, wb = crf.crf_inference_label_pair(img, la, lb, t=10, n_labels=21)
    ga, gb = crf_tpu.LandmarkCRF(stride=4).pair(img, la, lb, n_labels=21)
    assert (ga == wa).mean() >= 0.95, (ga == wa).mean()
    assert (gb == wb).mean() >= 0.95, (gb == wb).mean()


def test_landmark_crf_pair_equals_singles(rng):
    img, labels = _scene(rng, 40, 40)
    la = labels
    lb = (labels > 0).astype(np.int32) * 2
    dev = crf_tpu.LandmarkCRF(stride=4, matmul_dtype="float32")
    ga, gb = dev.pair(img, la, lb, n_labels=21)
    np.testing.assert_array_equal(ga, dev.single(img, la, n_labels=21))
    np.testing.assert_array_equal(gb, dev.single(img, lb, n_labels=21))


def test_landmark_crf_bucket_invariance(rng):
    """The same image through a larger padded bucket must produce the same
    labels: padded pixels are excluded from landmarks, normalizers, and
    messages."""
    img, labels = _scene(rng, 40, 52)
    a = crf_tpu.LandmarkCRF(stride=4, pad_multiple=64,
                            matmul_dtype="float32")
    b = crf_tpu.LandmarkCRF(stride=4, pad_multiple=128,
                            matmul_dtype="float32")
    np.testing.assert_array_equal(
        a.single(img, labels, n_labels=21),
        b.single(img, labels, n_labels=21),
    )


def test_landmark_crf_odd_bucket_chunking(rng):
    """A bucket whose pixel count is not a 4096-multiple must still run
    the chunked kernel build (largest divisor <= 4096) and match a
    4096-aligned bucket bit-for-bit — the old fallback materialized the
    full [N, S] intermediates (an OOM at real sizes, found by review)."""
    img, labels = _scene(rng, 90, 100)
    odd = crf_tpu.LandmarkCRF(stride=4, pad_multiple=24,
                              matmul_dtype="float32")
    # 24-multiple bucket of a 90x100 scene: 96x120 = 11520 px — not a
    # 4096-multiple, largest divisor <= 4096 is 3840 => 3 real chunks
    aligned = crf_tpu.LandmarkCRF(stride=4, pad_multiple=64,
                                  matmul_dtype="float32")
    np.testing.assert_array_equal(
        odd.single(img, labels, n_labels=21),
        aligned.single(img, labels, n_labels=21),
    )


def test_ir_label_stage_backend_ab(tmp_path, rng):
    """Stage-level A/B (VERDICT r2 #2): cam_to_ir_label with
    crf_backend='tpu' vs 'native' over a synthetic tree — the decisive
    artifacts (255-ignore / fg / joint-bg combination) must agree on
    >= 90% of pixels per image."""
    from irn_tpu.data import synthetic, voc12
    from irn_tpu.pipeline import stages_cam
    from irn_tpu.pipeline.config import Config

    root = str(tmp_path / "voc")
    train, _ = synthetic.generate(root, n_images=3, size=56,
                                  max_side_jitter=8, seed=5)
    cam_dir = tmp_path / "cam"
    cam_dir.mkdir()
    names = voc12.load_img_name_list(train)
    for name in names:
        img = np.asarray(
            imageio.imread(os.path.join(root, "JPEGImages", name + ".jpg"))
        )
        k = int(rng.integers(1, 3))
        keys = np.sort(rng.choice(20, size=k, replace=False)).astype(np.int64)
        # spatially coherent CAMs (color-proximity blobs): pure random
        # noise would make every pixel a mean-field tie and measure
        # knife-edge flips, not backend fidelity
        refs = rng.integers(0, 255, (k, 3))
        dist = np.linalg.norm(
            img[None].astype(np.float32) - refs[:, None, None, :], axis=-1
        )
        high = np.exp(-dist / 60.0).astype(np.float32)
        # per-class max-normalize like the reference (make_cam.py:48-52)
        high /= high.max(axis=(1, 2), keepdims=True) + 1e-5
        np.save(str(cam_dir / f"{name}.npy"),
                {"keys": keys, "cam": None, "high_res": high})

    outs = {}
    for backend in ("native", "tpu"):
        cfg = dataclasses.replace(
            Config(voc12_root=root, train_list=train, infer_list=train,
                   cam_out_dir=str(cam_dir),
                   ir_label_out_dir=str(tmp_path / f"ir_{backend}")).resolve(),
            num_workers=2, crf_backend=backend,
        )
        stages_cam.cam_to_ir_label(cfg)
        outs[backend] = {
            name: np.asarray(imageio.imread(
                str(tmp_path / f"ir_{backend}" / f"{name}.png")))
            for name in names
        }
    for name in names:
        agree = (outs["native"][name] == outs["tpu"][name]).mean()
        assert agree >= 0.90, (name, agree)


def test_stream_kernel_bit_identical(rng):
    """stream_kernel=True recomputes the bilateral kernel chunks fused
    with each iteration's matmul instead of materializing the [N, S]
    matrix (HBM-bound at production buckets); the recomputed bf16 chunks
    are the same values the materialized path stores, so the decoded
    labels must match. CPU-verified only: on TPU the chunked matmul vs
    one full jnp.dot is additionally an XLA tiling/reduction-order
    assumption this suite does not pin on hardware (the flag is
    non-default, ADVICE r4)."""
    from irn_tpu.ops import crf_tpu

    img = (rng.random((40, 48, 3)) * 255).astype(np.uint8)
    la = rng.integers(0, 4, (40, 48)).astype(np.int32)
    lb = rng.integers(0, 4, (40, 48)).astype(np.int32)
    kw = dict(stride=4, t=3, pad_multiple=8)
    mat = crf_tpu.LandmarkCRF(**kw)
    strm = crf_tpu.LandmarkCRF(stream_kernel=True, **kw)
    a0, b0 = mat.pair(img, la, lb, n_labels=4)
    a1, b1 = strm.pair(img, la, lb, n_labels=4)
    np.testing.assert_array_equal(a0, a1)
    np.testing.assert_array_equal(b0, b1)


def test_int8_kernel_store_agreement(rng):
    """kernel_store='int8' quantizes the landmark kernel matrix to
    symmetric int8 (halving the HBM-bound iteration matmul's bytes on
    TPU) and per-column-quantizes the landmark activations on the fly;
    the row-sum normalization uses the dequantized kernel so the
    operator stays consistent with what's applied. Quantization noise is
    ~0.4% per kernel entry — decoded labels must agree with the dense
    path within the same band the device CRF holds vs the native lattice
    (99.98% measured on the bench scene)."""
    img, labels = _scene(rng, 48, 60)
    la = labels % 6
    lb = (labels > 0).astype(np.int32)
    kw = dict(stride=4, pad_multiple=32)
    a0, b0 = crf_tpu.LandmarkCRF(**kw).pair(img, la, lb, n_labels=6)
    a1, b1 = crf_tpu.LandmarkCRF(kernel_store="int8", **kw).pair(
        img, la, lb, n_labels=6
    )
    assert (a0 == a1).mean() >= 0.995, (a0 == a1).mean()
    assert (b0 == b1).mean() >= 0.995, (b0 == b1).mean()


def test_crf_backend_auto_resolution(monkeypatch):
    """'auto' (the round-4 default) resolves against the live JAX backend
    lazily: 'native' on CPU hosts, 'tpu' whenever an accelerator is
    present; explicit values pass through untouched."""
    from irn_tpu.pipeline.config import Config

    cfg = Config()
    assert cfg.crf_backend == "auto"
    assert cfg.resolved_crf_backend() == "native"  # conftest pins CPU

    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert cfg.resolved_crf_backend() == "tpu"

    for explicit in ("native", "tpu"):
        assert dataclasses.replace(
            cfg, crf_backend=explicit).resolved_crf_backend() == explicit
