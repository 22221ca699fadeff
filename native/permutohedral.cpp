#include "permutohedral.h"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <utility>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace irn {
namespace {

// Open-addressing (linear probe) table over int16-key vectors stored
// contiguously in an external buffer. ~5x faster than std::unordered_map
// for the lattice dedup + blur-neighbor probes (no node allocations, no
// pointer chasing; load factor <= 0.5): on textured images the hash work
// dominates lattice construction.
struct FlatKeyTable {
  const int16_t* keys;  // external key store, d int16s per candidate
  int d;
  std::size_t mask;
  std::vector<int32_t> slot_cand;  // candidate whose key claims the slot
  std::vector<int32_t> slot_id;    // its lattice id

  FlatKeyTable(const int16_t* keys, int d, std::size_t n_candidates)
      : keys(keys), d(d) {
    std::size_t cap = 1;
    while (cap < 2 * n_candidates + 1) cap <<= 1;
    mask = cap - 1;
    slot_cand.assign(cap, -1);
    slot_id.assign(cap, -1);
  }

  std::size_t hash_key(const int16_t* k) const {
    std::size_t h = 14695981039346656037ull;
    for (int i = 0; i < d; ++i) {
      h ^= static_cast<std::size_t>(static_cast<uint16_t>(k[i]));
      h *= 1099511628211ull;
    }
    return h;
  }

  // Returns the existing id for candidate c's key, or inserts it with
  // ``new_id`` and returns new_id.
  int32_t find_or_insert(int32_t c, int32_t new_id) {
    const int16_t* k = keys + static_cast<std::size_t>(c) * d;
    std::size_t h = hash_key(k) & mask;
    while (true) {
      const int32_t sc = slot_cand[h];
      if (sc < 0) {
        slot_cand[h] = c;
        slot_id[h] = new_id;
        return new_id;
      }
      if (std::memcmp(keys + static_cast<std::size_t>(sc) * d, k,
                      sizeof(int16_t) * d) == 0)
        return slot_id[h];
      h = (h + 1) & mask;
    }
  }

  int32_t find(const int16_t* k) const {
    std::size_t h = hash_key(k) & mask;
    while (true) {
      const int32_t sc = slot_cand[h];
      if (sc < 0) return -1;
      if (std::memcmp(keys + static_cast<std::size_t>(sc) * d, k,
                      sizeof(int16_t) * d) == 0)
        return slot_id[h];
      h = (h + 1) & mask;
    }
  }
};

}  // namespace

Permutohedral::Permutohedral(const float* features, int n, int d)
    : n_(n), d_(d) {
  const int dp1 = d + 1;
  offsets_.assign(static_cast<std::size_t>(n) * dp1, 0);
  weights_.assign(static_cast<std::size_t>(n) * dp1, 0.f);

  // Elevation scales: project feature space onto the hyperplane H_d with
  // unit-variance blur along lattice axes.
  std::vector<float> scale(d);
  const float inv_std = std::sqrt(2.f / 3.f) * dp1;
  for (int i = 0; i < d; ++i)
    scale[i] = inv_std / std::sqrt(static_cast<float>((i + 1) * (i + 2)));

  std::vector<int16_t> key_store;  // candidate keys, d entries each
  key_store.reserve(static_cast<std::size_t>(n) * dp1 * d);

  std::vector<float> elevated(dp1);
  std::vector<float> rem0(dp1);
  std::vector<int> rank(dp1);
  std::vector<float> bary(dp1 + 1);

  const float down = 1.f / dp1;

  for (int p = 0; p < n; ++p) {
    const float* f = features + static_cast<std::size_t>(p) * d;

    // Elevate f into H_d (E^T f via the standard recurrence).
    float sm = 0.f;
    for (int j = d; j > 0; --j) {
      const float cf = f[j - 1] * scale[j - 1];
      elevated[j] = sm - j * cf;
      sm += cf;
    }
    elevated[0] = sm;

    // Nearest remainder-0 lattice point and differential ranks.
    int sum = 0;
    for (int i = 0; i <= d; ++i) {
      const float v = elevated[i] * down;
      float up = std::ceil(v) * dp1;
      float dn = std::floor(v) * dp1;
      rem0[i] = (up - elevated[i] < elevated[i] - dn) ? up : dn;
      sum += static_cast<int>(rem0[i] * down);
      rank[i] = 0;
    }
    for (int i = 0; i < d; ++i)
      for (int j = i + 1; j <= d; ++j) {
        if (elevated[i] - rem0[i] < elevated[j] - rem0[j])
          ++rank[i];
        else
          ++rank[j];
      }

    // Fix points that round outside the canonical simplex.
    for (int i = 0; i <= d; ++i) {
      rank[i] += sum;
      if (rank[i] < 0) {
        rank[i] += dp1;
        rem0[i] += dp1;
      } else if (rank[i] > d) {
        rank[i] -= dp1;
        rem0[i] -= dp1;
      }
    }

    // Barycentric coordinates inside the simplex.
    std::fill(bary.begin(), bary.end(), 0.f);
    for (int i = 0; i <= d; ++i) {
      const float v = (elevated[i] - rem0[i]) * down;
      bary[d - rank[i]] += v;
      bary[d - rank[i] + 1] -= v;
    }
    bary[0] += 1.f + bary[dp1];

    // Emit the dp1 simplex-vertex keys (first d coords; the last is implied
    // by the zero-sum constraint).
    for (int r = 0; r <= d; ++r) {
      for (int i = 0; i < d; ++i) {
        int16_t ki = static_cast<int16_t>(rem0[i]) + static_cast<int16_t>(r);
        if (rank[i] > d - r) ki -= static_cast<int16_t>(dp1);
        key_store.push_back(ki);
      }
      weights_[static_cast<std::size_t>(p) * dp1 + r] = bary[r];
    }
  }

  // Deduplicate keys into lattice indices.
  const int32_t n_candidates = n * dp1;
  FlatKeyTable table(key_store.data(), d,
                     static_cast<std::size_t>(n_candidates));
  std::vector<int32_t> unique_rows;
  for (int32_t c = 0; c < n_candidates; ++c) {
    const int32_t next_id = static_cast<int32_t>(unique_rows.size());
    const int32_t id = table.find_or_insert(c, next_id);
    if (id == next_id) unique_rows.push_back(c);
    offsets_[c] = id;
  }
  n_lattice_ = unique_rows.size();

  // Precompute blur neighbors n1/n2 along each lattice axis j:
  //   n1 = key + 1 (all dims) except key[j] -= d
  //   n2 = key - 1 (all dims) except key[j] += d
  blur_neighbors_.assign(dp1, std::vector<int32_t>(n_lattice_ * 2, -1));
#ifdef _OPENMP
#pragma omp parallel if (omp_get_max_threads() > 1)
#endif
  {
    std::vector<int16_t> probe(d);
    for (int j = 0; j <= d; ++j) {
      auto& nb = blur_neighbors_[j];
#ifdef _OPENMP
#pragma omp for schedule(static) nowait
#endif
      for (std::int64_t li = 0; li < static_cast<std::int64_t>(n_lattice_);
           ++li) {
        const int16_t* key =
            key_store.data() + static_cast<std::size_t>(unique_rows[li]) * d;
        // n1
        for (int i = 0; i < d; ++i) probe[i] = key[i] + 1;
        if (j < d) probe[j] = key[j] - d;
        nb[li * 2] = table.find(probe.data());
        // n2
        for (int i = 0; i < d; ++i) probe[i] = key[i] - 1;
        if (j < d) probe[j] = key[j] + d;
        nb[li * 2 + 1] = table.find(probe.data());
      }
    }
  }
}

void Permutohedral::Filter(const float* in, float* out, int vd) const {
  const int dp1 = d_ + 1;
  std::vector<float> a(n_lattice_ * vd, 0.f);
  std::vector<float> b(n_lattice_ * vd, 0.f);

#ifdef _OPENMP
  const int nt = omp_get_max_threads();
#else
  const int nt = 1;
#endif

  // Splat. Pixels scatter-add into shared lattice rows, so the parallel
  // path accumulates into per-thread buffers and reduces over lattice rows
  // (deterministic for a fixed thread count: static partition + fixed
  // reduction order).
  if (nt > 1) {
#ifdef _OPENMP
    std::vector<std::vector<float>> partial(nt);
#pragma omp parallel
    {
      const int t = omp_get_thread_num();
      // the team that actually formed can be smaller than
      // omp_get_max_threads() (OMP_DYNAMIC, nested regions): reduce over
      // the real team size — slots beyond it stay empty and unread
      const int team = omp_get_num_threads();
      auto& acc = partial[t];
      acc.assign(n_lattice_ * static_cast<std::size_t>(vd), 0.f);
#pragma omp for schedule(static)
      for (int p = 0; p < n_; ++p) {
        const float* v = in + static_cast<std::size_t>(p) * vd;
        for (int r = 0; r <= d_; ++r) {
          const std::size_t o =
              static_cast<std::size_t>(offsets_[p * dp1 + r]) * vd;
          const float w = weights_[p * dp1 + r];
          for (int c = 0; c < vd; ++c) acc[o + c] += w * v[c];
        }
      }
#pragma omp barrier
#pragma omp for schedule(static)
      for (std::int64_t i = 0;
           i < static_cast<std::int64_t>(n_lattice_) * vd; ++i) {
        float s = 0.f;
        for (int u = 0; u < team; ++u) s += partial[u][i];
        a[i] = s;
      }
    }
#endif
  } else {
    for (int p = 0; p < n_; ++p) {
      const float* v = in + static_cast<std::size_t>(p) * vd;
      for (int r = 0; r <= d_; ++r) {
        const std::size_t o =
            static_cast<std::size_t>(offsets_[p * dp1 + r]) * vd;
        const float w = weights_[p * dp1 + r];
        for (int c = 0; c < vd; ++c) a[o + c] += w * v[c];
      }
    }
  }

  // Blur along each lattice axis with [1, 2, 1] — lattice rows read `cur`,
  // write `nxt`: embarrassingly parallel.
  float* cur = a.data();
  float* nxt = b.data();
  for (int j = 0; j <= d_; ++j) {
    const auto& nb = blur_neighbors_[j];
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if (nt > 1)
#endif
    for (std::int64_t li = 0;
         li < static_cast<std::int64_t>(n_lattice_); ++li) {
      const int32_t l1 = nb[li * 2];
      const int32_t l2 = nb[li * 2 + 1];
      const float* self = cur + li * vd;
      const float* v1 = l1 >= 0 ? cur + static_cast<std::size_t>(l1) * vd : nullptr;
      const float* v2 = l2 >= 0 ? cur + static_cast<std::size_t>(l2) * vd : nullptr;
      float* o = nxt + li * vd;
      for (int c = 0; c < vd; ++c) {
        float s = 2.f * self[c];
        if (v1) s += v1[c];
        if (v2) s += v2[c];
        o[c] = s;
      }
    }
    std::swap(cur, nxt);
  }

  // Slice — per-pixel gather, embarrassingly parallel.
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if (nt > 1)
#endif
  for (int p = 0; p < n_; ++p) {
    float* o = out + static_cast<std::size_t>(p) * vd;
    for (int c = 0; c < vd; ++c) o[c] = 0.f;
    for (int r = 0; r <= d_; ++r) {
      const std::size_t off =
          static_cast<std::size_t>(offsets_[p * dp1 + r]) * vd;
      const float w = weights_[p * dp1 + r];
      for (int c = 0; c < vd; ++c) o[c] += w * cur[off + c];
    }
  }
}

}  // namespace irn
