// Connected components (union-find) and COCO run-length encoding.
//
// Native replacements for the reference's skimage.measure.label calls
// (step/make_ins_seg_labels.py:66,92, connectivity=1, background=0) and the
// pycocotools RLE encoder behind pycococreatortools (step/make_cocoann.py).

#include <cstdint>
#include <vector>

extern "C" {

// 4-connectivity labeling of a binary mask. Background (0) stays 0;
// components are numbered 1..K in order of first (row-major) appearance,
// matching skimage.measure.label. Returns K.
int irn_label_components(const uint8_t* mask, int h, int w,
                         int32_t* out_labels) {
  const int n = h * w;
  std::vector<int32_t> parent(n);

  auto find = [&](int32_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];
      x = parent[x];
    }
    return x;
  };

  for (int i = 0; i < n; ++i) parent[i] = i;

  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      const int i = y * w + x;
      if (!mask[i]) continue;
      if (x > 0 && mask[i - 1]) {
        int32_t a = find(i), b = find(i - 1);
        if (a != b) parent[a] = b;
      }
      if (y > 0 && mask[i - w]) {
        int32_t a = find(i), b = find(i - w);
        if (a != b) parent[a] = b;
      }
    }

  std::vector<int32_t> remap(n, 0);
  int32_t next = 0;
  for (int i = 0; i < n; ++i) {
    if (!mask[i]) {
      out_labels[i] = 0;
      continue;
    }
    const int32_t r = find(i);
    if (remap[r] == 0) remap[r] = ++next;
    out_labels[i] = remap[r];
  }
  return next;
}

// COCO uncompressed RLE of a binary mask: column-major (Fortran) runs,
// starting with the count of leading zeros. Returns the number of counts
// written (caller buffer must hold h*w+1 entries in the worst case).
int irn_rle_encode(const uint8_t* mask, int h, int w, uint32_t* counts) {
  int n_counts = 0;
  uint32_t run = 0;
  uint8_t cur = 0;  // RLE starts by counting zeros
  for (int x = 0; x < w; ++x)
    for (int y = 0; y < h; ++y) {
      const uint8_t v = mask[y * w + x] ? 1 : 0;
      if (v == cur) {
        ++run;
      } else {
        counts[n_counts++] = run;
        cur = v;
        run = 1;
      }
    }
  counts[n_counts++] = run;
  return n_counts;
}

}  // extern "C"
