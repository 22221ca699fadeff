// Permutohedral lattice for high-dimensional Gaussian filtering.
//
// Implements the splat / blur / slice approximation of dense Gaussian
// filtering (Adams, Baek & Davis 2010) used by the fully-connected CRF
// (Krahenbuhl & Koltun 2011). Written from scratch for irn_tpu's native
// runtime; replaces the pydensecrf dependency the reference pipeline uses
// at misc/imutils.py:156-170.
//
// Filtering is unnormalized; callers typically filter an all-ones channel
// and normalize (any consistent global blur scale cancels under that).

#pragma once

#include <cstdint>
#include <vector>

namespace irn {

class Permutohedral {
 public:
  // features: n points, d dims, row-major [n, d] (already divided by the
  // kernel bandwidths).
  Permutohedral(const float* features, int n, int d);

  // values: [n, vd] row-major in, out: [n, vd]. in != out allowed or equal.
  void Filter(const float* in, float* out, int vd) const;

  int n_lattice() const { return static_cast<int>(n_lattice_); }

 private:
  int n_ = 0;
  int d_ = 0;
  std::size_t n_lattice_ = 0;
  // per (point, simplex-vertex): lattice index and barycentric weight
  std::vector<int32_t> offsets_;   // [n * (d+1)]
  std::vector<float> weights_;     // [n * (d+1)]
  // blur neighbors per axis: [d+1][n_lattice * 2] (left, right); -1 = none
  std::vector<std::vector<int32_t>> blur_neighbors_;
};

}  // namespace irn
