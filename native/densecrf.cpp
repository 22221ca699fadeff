// Fully-connected CRF mean-field inference with Gaussian + bilateral
// pairwise kernels on the permutohedral lattice.
//
// Native replacement for the reference's pydensecrf usage
// (misc/imutils.py:156-170 <- step/cam_to_ir_label.py): label-derived unary
// (gt_prob confidence), Potts compatibilities, symmetric kernel
// normalization, argmax decode.
//
// C ABI for ctypes. All buffers are caller-allocated, row-major.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

#include "permutohedral.h"

namespace {

using irn::Permutohedral;

// Symmetric-normalized filtering: out = D^{-1/2} K D^{-1/2} in, where
// D = diag(K 1). Any global blur scale cancels.
class NormalizedKernel {
 public:
  NormalizedKernel(const float* features, int n, int d)
      : lattice_(features, n, d), inv_sqrt_norm_(n) {
    std::vector<float> ones(n, 1.f);
    std::vector<float> norm(n);
    lattice_.Filter(ones.data(), norm.data(), 1);
    for (int i = 0; i < n; ++i)
      inv_sqrt_norm_[i] = 1.f / std::sqrt(std::max(norm[i], 1e-20f));
  }

  // in/out: [n, vd]
  void Apply(const float* in, float* out, int n, int vd,
             std::vector<float>& tmp) const {
    tmp.resize(static_cast<std::size_t>(n) * vd);
    for (int i = 0; i < n; ++i)
      for (int c = 0; c < vd; ++c)
        tmp[static_cast<std::size_t>(i) * vd + c] =
            in[static_cast<std::size_t>(i) * vd + c] * inv_sqrt_norm_[i];
    lattice_.Filter(tmp.data(), out, vd);
    for (int i = 0; i < n; ++i)
      for (int c = 0; c < vd; ++c)
        out[static_cast<std::size_t>(i) * vd + c] *= inv_sqrt_norm_[i];
  }

 private:
  Permutohedral lattice_;
  std::vector<float> inv_sqrt_norm_;
};

void softmax_rows(std::vector<float>& q, const std::vector<float>& logits,
                  int n, int m) {
  for (int i = 0; i < n; ++i) {
    const float* l = logits.data() + static_cast<std::size_t>(i) * m;
    float* o = q.data() + static_cast<std::size_t>(i) * m;
    float mx = l[0];
    for (int c = 1; c < m; ++c) mx = std::max(mx, l[c]);
    float s = 0.f;
    for (int c = 0; c < m; ++c) {
      o[c] = std::exp(l[c] - mx);
      s += o[c];
    }
    const float inv = 1.f / s;
    for (int c = 0; c < m; ++c) o[c] *= inv;
  }
}

}  // namespace

extern "C" {

// OpenMP worker threads for the permutohedral filter (1 = serial; the
// parallel splat reduction is deterministic for a fixed count). Returns
// the effective count (always 1 in a non-OpenMP build). Callers fanning
// out across images should divide cores between images and threads.
int irn_set_num_threads(int n) {
#ifdef _OPENMP
  if (n > 0) omp_set_num_threads(n);
  return omp_get_max_threads();
#else
  (void)n;
  return 1;
#endif
}

// Mean-field CRF over a label map (the reference's crf_inference_label).
//
//   img:        [h, w, 3] uint8 RGB
//   labels:     [h, w] int32 in [0, n_labels)
//   out_labels: [h, w] int32 argmax after `iters` mean-field updates
//
// Unary: -log(gt_prob) at the given label, -log((1-gt_prob)/(n_labels-1))
// elsewhere. Pairwise: Gaussian (sxy_g, w_g) + bilateral (sxy_b, srgb_b,
// w_b), Potts compatibility.
void irn_dense_crf_label(const uint8_t* img, const int32_t* labels, int h,
                         int w, int n_labels, float gt_prob, int iters,
                         float sxy_g, float w_g, float sxy_b, float srgb_b,
                         float w_b, int32_t* out_labels) {
  const int n = h * w;
  const int m = n_labels;

  // Unary (negated for the update: start from -U).
  const float p_other = (1.f - gt_prob) / std::max(n_labels - 1, 1);
  const float log_gt = std::log(gt_prob);
  const float log_other = std::log(p_other);
  std::vector<float> neg_unary(static_cast<std::size_t>(n) * m);
  for (int i = 0; i < n; ++i) {
    const int32_t li = labels[i];
    for (int c = 0; c < m; ++c)
      neg_unary[static_cast<std::size_t>(i) * m + c] =
          (c == li) ? log_gt : log_other;
  }

  // Kernels.
  std::vector<float> feat_g(static_cast<std::size_t>(n) * 2);
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      feat_g[static_cast<std::size_t>(y * w + x) * 2] = x / sxy_g;
      feat_g[static_cast<std::size_t>(y * w + x) * 2 + 1] = y / sxy_g;
    }
  NormalizedKernel kg(feat_g.data(), n, 2);

  std::vector<float> feat_b(static_cast<std::size_t>(n) * 5);
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      const std::size_t i = static_cast<std::size_t>(y * w + x);
      feat_b[i * 5] = x / sxy_b;
      feat_b[i * 5 + 1] = y / sxy_b;
      feat_b[i * 5 + 2] = img[i * 3] / srgb_b;
      feat_b[i * 5 + 3] = img[i * 3 + 1] / srgb_b;
      feat_b[i * 5 + 4] = img[i * 3 + 2] / srgb_b;
    }
  NormalizedKernel kb(feat_b.data(), n, 5);

  // Mean field.
  std::vector<float> q(static_cast<std::size_t>(n) * m);
  std::vector<float> logits(neg_unary);
  std::vector<float> msg(static_cast<std::size_t>(n) * m);
  std::vector<float> tmp;
  softmax_rows(q, logits, n, m);
  for (int it = 0; it < iters; ++it) {
    logits = neg_unary;
    kg.Apply(q.data(), msg.data(), n, m, tmp);
    for (std::size_t i = 0; i < logits.size(); ++i) logits[i] += w_g * msg[i];
    kb.Apply(q.data(), msg.data(), n, m, tmp);
    for (std::size_t i = 0; i < logits.size(); ++i) logits[i] += w_b * msg[i];
    softmax_rows(q, logits, n, m);
  }

  for (int i = 0; i < n; ++i) {
    const float* qi = q.data() + static_cast<std::size_t>(i) * m;
    int best = 0;
    for (int c = 1; c < m; ++c)
      if (qi[c] > qi[best]) best = c;
    out_labels[i] = best;
  }
}

// Two label maps refined with shared kernels. The IR-seed stage
// (step/cam_to_ir_label.py:29-34) runs the CRF twice per image with
// different unaries but identical Gaussian/bilateral kernels — building the
// permutohedral lattices once halves the dominant cost.
void irn_dense_crf_label2(const uint8_t* img, const int32_t* labels_a,
                          const int32_t* labels_b, int h, int w, int n_labels,
                          float gt_prob, int iters, float sxy_g, float w_g,
                          float sxy_b, float srgb_b, float w_b,
                          int32_t* out_a, int32_t* out_b) {
  const int n = h * w;
  const int m = n_labels;

  std::vector<float> feat_g(static_cast<std::size_t>(n) * 2);
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      feat_g[static_cast<std::size_t>(y * w + x) * 2] = x / sxy_g;
      feat_g[static_cast<std::size_t>(y * w + x) * 2 + 1] = y / sxy_g;
    }
  NormalizedKernel kg(feat_g.data(), n, 2);

  std::vector<float> feat_b(static_cast<std::size_t>(n) * 5);
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      const std::size_t i = static_cast<std::size_t>(y * w + x);
      feat_b[i * 5] = x / sxy_b;
      feat_b[i * 5 + 1] = y / sxy_b;
      feat_b[i * 5 + 2] = img[i * 3] / srgb_b;
      feat_b[i * 5 + 3] = img[i * 3 + 1] / srgb_b;
      feat_b[i * 5 + 4] = img[i * 3 + 2] / srgb_b;
    }
  NormalizedKernel kb(feat_b.data(), n, 5);

  const float p_other = (1.f - gt_prob) / std::max(n_labels - 1, 1);
  const float log_gt = std::log(gt_prob);
  const float log_other = std::log(p_other);

  std::vector<float> neg_unary(static_cast<std::size_t>(n) * m);
  std::vector<float> q(static_cast<std::size_t>(n) * m);
  std::vector<float> logits(static_cast<std::size_t>(n) * m);
  std::vector<float> msg(static_cast<std::size_t>(n) * m);
  std::vector<float> tmp;

  const int32_t* label_maps[2] = {labels_a, labels_b};
  int32_t* outs[2] = {out_a, out_b};
  for (int pass = 0; pass < 2; ++pass) {
    const int32_t* labels = label_maps[pass];
    for (int i = 0; i < n; ++i) {
      const int32_t li = labels[i];
      for (int c = 0; c < m; ++c)
        neg_unary[static_cast<std::size_t>(i) * m + c] =
            (c == li) ? log_gt : log_other;
    }
    logits = neg_unary;
    softmax_rows(q, logits, n, m);
    for (int it = 0; it < iters; ++it) {
      logits = neg_unary;
      kg.Apply(q.data(), msg.data(), n, m, tmp);
      for (std::size_t i = 0; i < logits.size(); ++i)
        logits[i] += w_g * msg[i];
      kb.Apply(q.data(), msg.data(), n, m, tmp);
      for (std::size_t i = 0; i < logits.size(); ++i)
        logits[i] += w_b * msg[i];
      softmax_rows(q, logits, n, m);
    }
    int32_t* out = outs[pass];
    for (int i = 0; i < n; ++i) {
      const float* qi = q.data() + static_cast<std::size_t>(i) * m;
      int best = 0;
      for (int c = 1; c < m; ++c)
        if (qi[c] > qi[best]) best = c;
      out[i] = best;
    }
  }
}

// Raw normalized high-dimensional Gaussian filter (for tests / reuse):
// out = D^{-1/2} K D^{-1/2} in with features [n, d], values [n, vd].
void irn_permutohedral_filter(const float* features, const float* in, int n,
                              int d, int vd, float* out) {
  NormalizedKernel k(features, n, d);
  std::vector<float> tmp;
  k.Apply(in, out, n, vd, tmp);
}

}  // extern "C"
