// gi_native: host-side runtime kernels for the TPU photon-mapping renderer.
//
// The reference implements its host runtime in C++ (kd-tree build
// R3Kdtree.cpp:23-120, scene accel via per-node bboxes R3SceneNode.cpp:421,
// photon buffers photon_utils.cpp:19-65). The TPU framework keeps device
// compute in JAX/Pallas but re-expresses the host runtime natively here:
//
//   * gi_morton_order  — 30-bit Morton (Z-order) sort of points; used to
//     spatially cluster triangles into tight chunks for the Pallas
//     block-culled intersection kernel, and photons for the gather grid.
//   * gi_bvh_build     — binned-SAH BVH over prim bounds (the reference has
//     NO triangle BVH, R3Isect.cpp:800-833 scans linearly; this is the
//     TPU-native accel replacement). Emits flat DFS arrays.
//   * gi_save_photons / gi_load_photons — photon-map checkpoint files
//     (the reference keeps maps only in RAM, photonmap.cpp:474-485).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Morton ordering
// ---------------------------------------------------------------------------

static inline uint32_t expand_bits10(uint32_t v) {
  // spread 10 bits out to every third bit
  v = (v * 0x00010001u) & 0xFF0000FFu;
  v = (v * 0x00000101u) & 0x0F00F00Fu;
  v = (v * 0x00000011u) & 0xC30C30C3u;
  v = (v * 0x00000005u) & 0x49249249u;
  return v;
}

static inline uint32_t morton3(float x, float y, float z) {
  auto q = [](float f) {
    f = f < 0.f ? 0.f : (f > 1.f ? 1.f : f);
    return (uint32_t)(f * 1023.0f);
  };
  return (expand_bits10(q(x)) << 2) | (expand_bits10(q(y)) << 1) |
         expand_bits10(q(z));
}

// pts: [n,3] float32. order_out: [n] uint32 permutation sorting pts by
// Morton code within their own bounding box.
void gi_morton_order(const float* pts, int64_t n, uint32_t* order_out) {
  if (n <= 0) return;
  float lo[3] = {pts[0], pts[1], pts[2]};
  float hi[3] = {pts[0], pts[1], pts[2]};
  for (int64_t i = 1; i < n; ++i)
    for (int k = 0; k < 3; ++k) {
      float v = pts[i * 3 + k];
      if (v < lo[k]) lo[k] = v;
      if (v > hi[k]) hi[k] = v;
    }
  float inv[3];
  for (int k = 0; k < 3; ++k) {
    float ext = hi[k] - lo[k];
    inv[k] = ext > 0.f ? 1.0f / ext : 0.f;
  }
  std::vector<uint64_t> keyed(n);  // (morton << 32) | index
  for (int64_t i = 0; i < n; ++i) {
    uint32_t m = morton3((pts[i * 3 + 0] - lo[0]) * inv[0],
                         (pts[i * 3 + 1] - lo[1]) * inv[1],
                         (pts[i * 3 + 2] - lo[2]) * inv[2]);
    keyed[i] = ((uint64_t)m << 32) | (uint32_t)i;
  }
  std::sort(keyed.begin(), keyed.end());
  for (int64_t i = 0; i < n; ++i) order_out[i] = (uint32_t)keyed[i];
}

// ---------------------------------------------------------------------------
// Binned-SAH BVH
// ---------------------------------------------------------------------------

namespace {

struct BBox {
  float lo[3] = {3.4e38f, 3.4e38f, 3.4e38f};
  float hi[3] = {-3.4e38f, -3.4e38f, -3.4e38f};
  void grow(const float* l, const float* h) {
    for (int k = 0; k < 3; ++k) {
      if (l[k] < lo[k]) lo[k] = l[k];
      if (h[k] > hi[k]) hi[k] = h[k];
    }
  }
  void grow(const BBox& b) { grow(b.lo, b.hi); }
  float area() const {
    float dx = hi[0] - lo[0], dy = hi[1] - lo[1], dz = hi[2] - lo[2];
    if (dx < 0 || dy < 0 || dz < 0) return 0.f;
    return 2.0f * (dx * dy + dy * dz + dz * dx);
  }
};

struct Builder {
  const float* lo;
  const float* hi;
  std::vector<float> cent;     // [n,3]
  std::vector<uint32_t> perm;  // current prim order
  // flat output (DFS preorder)
  float* node_lo;
  float* node_hi;
  int32_t* node_a;   // internal: left child;   leaf: prim start
  int32_t* node_b;   // internal: right child;  leaf: prim count
  int32_t* node_leaf;  // 1 if leaf else 0
  int64_t n_nodes = 0;
  int max_leaf;

  BBox prim_box(uint32_t p) const {
    BBox b;
    b.grow(lo + p * 3, hi + p * 3);
    return b;
  }

  int64_t emit(const BBox& b) {
    int64_t id = n_nodes++;
    for (int k = 0; k < 3; ++k) {
      node_lo[id * 3 + k] = b.lo[k];
      node_hi[id * 3 + k] = b.hi[k];
    }
    return id;
  }

  // build [begin,end) of perm; returns node id
  int64_t build(int64_t begin, int64_t end) {
    BBox bounds, cbounds;
    for (int64_t i = begin; i < end; ++i) {
      bounds.grow(prim_box(perm[i]));
      const float* c = &cent[perm[i] * 3];
      cbounds.grow(c, c);
    }
    int64_t id = emit(bounds);
    int64_t count = end - begin;
    if (count <= max_leaf) {
      node_a[id] = (int32_t)begin;
      node_b[id] = (int32_t)count;
      node_leaf[id] = 1;
      return id;
    }

    // binned SAH over the longest centroid axis
    constexpr int NBINS = 16;
    int axis = 0;
    float ext[3];
    for (int k = 0; k < 3; ++k) ext[k] = cbounds.hi[k] - cbounds.lo[k];
    if (ext[1] > ext[axis]) axis = 1;
    if (ext[2] > ext[axis]) axis = 2;

    int64_t mid;
    if (ext[axis] <= 0.f) {
      mid = begin + count / 2;  // degenerate: all centroids equal
    } else {
      BBox bin_box[NBINS];
      int64_t bin_cnt[NBINS] = {0};
      float scale = NBINS / ext[axis];
      auto bin_of = [&](uint32_t p) {
        int b = (int)((cent[p * 3 + axis] - cbounds.lo[axis]) * scale);
        return b < 0 ? 0 : (b >= NBINS ? NBINS - 1 : b);
      };
      for (int64_t i = begin; i < end; ++i) {
        int b = bin_of(perm[i]);
        bin_box[b].grow(prim_box(perm[i]));
        bin_cnt[b]++;
      }
      // sweep for best split
      BBox right_acc[NBINS];
      BBox acc;
      for (int b = NBINS - 1; b > 0; --b) {
        acc.grow(bin_box[b]);
        right_acc[b] = acc;
      }
      BBox left_acc;
      int64_t left_cnt = 0;
      float best_cost = 3.4e38f;
      int best_split = -1;
      for (int b = 0; b < NBINS - 1; ++b) {
        left_acc.grow(bin_box[b]);
        left_cnt += bin_cnt[b];
        int64_t right_cnt = count - left_cnt;
        if (left_cnt == 0 || right_cnt == 0) continue;
        float cost =
            left_acc.area() * left_cnt + right_acc[b + 1].area() * right_cnt;
        if (cost < best_cost) {
          best_cost = cost;
          best_split = b;
        }
      }
      if (best_split < 0) {
        mid = begin + count / 2;
        std::nth_element(perm.begin() + begin, perm.begin() + mid,
                         perm.begin() + end, [&](uint32_t a, uint32_t b) {
                           return cent[a * 3 + axis] < cent[b * 3 + axis];
                         });
      } else {
        auto it = std::partition(
            perm.begin() + begin, perm.begin() + end,
            [&](uint32_t p) { return bin_of(p) <= best_split; });
        mid = it - perm.begin();
        if (mid == begin || mid == end) mid = begin + count / 2;
      }
    }

    int64_t l = build(begin, mid);
    int64_t r = build(mid, end);
    node_a[id] = (int32_t)l;
    node_b[id] = (int32_t)r;
    node_leaf[id] = 0;
    return id;
  }
};

}  // namespace

// Build a binned-SAH BVH. Inputs: per-prim bounds lo/hi [n,3] f32.
// Outputs (caller-allocated for capacity 2n): prim_order [n] u32, node
// arrays. Returns node count (root = node 0), or -1 on error.
int64_t gi_bvh_build(const float* lo, const float* hi, int64_t n,
                     int32_t max_leaf, uint32_t* prim_order, float* node_lo,
                     float* node_hi, int32_t* node_a, int32_t* node_b,
                     int32_t* node_leaf) {
  if (n <= 0 || max_leaf < 1) return -1;
  Builder b;
  b.lo = lo;
  b.hi = hi;
  b.max_leaf = max_leaf;
  b.cent.resize(n * 3);
  for (int64_t i = 0; i < n * 3; ++i) b.cent[i] = 0.5f * (lo[i] + hi[i]);
  b.perm.resize(n);
  for (int64_t i = 0; i < n; ++i) b.perm[i] = (uint32_t)i;
  b.node_lo = node_lo;
  b.node_hi = node_hi;
  b.node_a = node_a;
  b.node_b = node_b;
  b.node_leaf = node_leaf;
  b.build(0, n);
  std::memcpy(prim_order, b.perm.data(), n * sizeof(uint32_t));
  return b.n_nodes;
}

// ---------------------------------------------------------------------------
// Photon map serialization ("GIPM" v1)
//
// layout: magic "GIPM" | u32 version=1 | u64 count |
//         pos f32[n*3] | power f32[n*3] | dircode u16[n]
// ---------------------------------------------------------------------------

static const char kMagic[4] = {'G', 'I', 'P', 'M'};

int32_t gi_save_photons(const char* path, int64_t n, const float* pos,
                        const float* power, const uint16_t* dircode) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  uint32_t version = 1;
  uint64_t cnt = (uint64_t)n;
  int ok = fwrite(kMagic, 1, 4, f) == 4 &&
           fwrite(&version, 4, 1, f) == 1 && fwrite(&cnt, 8, 1, f) == 1 &&
           (n == 0 || (fwrite(pos, 12, n, f) == (size_t)n &&
                       fwrite(power, 12, n, f) == (size_t)n &&
                       fwrite(dircode, 2, n, f) == (size_t)n));
  fclose(f);
  return ok ? 0 : -2;
}

int64_t gi_photon_count(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char magic[4];
  uint32_t version;
  uint64_t cnt;
  int ok = fread(magic, 1, 4, f) == 4 && memcmp(magic, kMagic, 4) == 0 &&
           fread(&version, 4, 1, f) == 1 && version == 1 &&
           fread(&cnt, 8, 1, f) == 1;
  fclose(f);
  return ok ? (int64_t)cnt : -2;
}

int32_t gi_load_photons(const char* path, float* pos, float* power,
                        uint16_t* dircode) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char magic[4];
  uint32_t version;
  uint64_t cnt;
  int ok = fread(magic, 1, 4, f) == 4 && memcmp(magic, kMagic, 4) == 0 &&
           fread(&version, 4, 1, f) == 1 && version == 1 &&
           fread(&cnt, 8, 1, f) == 1;
  if (ok && cnt > 0) {
    ok = fread(pos, 12, cnt, f) == cnt && fread(power, 12, cnt, f) == cnt &&
         fread(dircode, 2, cnt, f) == cnt;
  }
  fclose(f);
  return ok ? 0 : -2;
}

}  // extern "C"
