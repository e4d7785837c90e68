// Native host-side runtime components for NeuralGaussianSplatting-TPU.
//
// TPU-native counterpart of the reference's CPU-side native code: the device
// compute path is JAX/Pallas (no CUDA port), but the host runtime — bulk
// dataset parsing and the init-time KNN — is C++ like the reference's
// submodules:
//  - COLMAP points3D.bin bulk parser (reference scene/colmap_loader.py:125
//    reads record-by-record in Python; large scenes ship 100s of MB).
//  - Morton-boxed approximate 3-nearest-neighbor mean squared distance
//    (reference submodules/simple-knn/simple_knn.cu:45-220 re-designed for
//    multithreaded CPU: same algorithm family — Morton sort, boxed min/max
//    pruning, K-best insertion — no CUDA constructs).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// COLMAP points3D.bin
// Record: uint64 id, 3x double xyz, 3x uint8 rgb, double error,
//         uint64 track_len, track_len * (int32, int32).
// ---------------------------------------------------------------------------

// Returns the number of points, or -1 on error.
long long colmap_points3d_count(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  unsigned long long n = 0;
  if (std::fread(&n, 8, 1, f) != 1) { std::fclose(f); return -1; }
  std::fclose(f);
  return (long long)n;
}

// Fills xyz (n*3 doubles), rgb (n*3 uint8), err (n doubles).
// Returns number of points read, or -1 on error.
long long colmap_points3d_read(const char* path, double* xyz, uint8_t* rgb,
                               double* err) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  unsigned long long n = 0;
  if (std::fread(&n, 8, 1, f) != 1) { std::fclose(f); return -1; }

  // Bulk-read the whole remainder once, then walk records in memory.
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 8, SEEK_SET);
  std::vector<uint8_t> buf(size - 8);
  if (std::fread(buf.data(), 1, buf.size(), f) != buf.size()) {
    std::fclose(f);
    return -1;
  }
  std::fclose(f);

  const uint8_t* p = buf.data();
  const uint8_t* end = buf.data() + buf.size();
  for (unsigned long long i = 0; i < n; i++) {
    if (p + 43 + 8 > end) return -1;
    p += 8;  // id
    std::memcpy(xyz + i * 3, p, 24);
    p += 24;
    std::memcpy(rgb + i * 3, p, 3);
    p += 3;
    std::memcpy(err + i, p, 8);
    p += 8;
    unsigned long long track = 0;
    std::memcpy(&track, p, 8);
    p += 8 + track * 8;
  }
  return (long long)n;
}

// ---------------------------------------------------------------------------
// Approximate 3-NN mean squared distance (simple-knn equivalent)
// ---------------------------------------------------------------------------

namespace {

inline uint32_t expand_bits(uint32_t v) {
  // 10 -> 30 bit spread (reference simple_knn.cu prepMorton)
  v = (v * 0x00010001u) & 0xFF0000FFu;
  v = (v * 0x00000101u) & 0x0F00F00Fu;
  v = (v * 0x00000011u) & 0xC30C30C3u;
  v = (v * 0x00000005u) & 0x49249249u;
  return v;
}

struct Box {
  float minx, miny, minz, maxx, maxy, maxz;
};

inline float box_dist2(const Box& b, const float* p) {
  float dx = std::max({b.minx - p[0], 0.f, p[0] - b.maxx});
  float dy = std::max({b.miny - p[1], 0.f, p[1] - b.maxy});
  float dz = std::max({b.minz - p[2], 0.f, p[2] - b.maxz});
  return dx * dx + dy * dy + dz * dz;
}

inline void update_kbest(float d2, float* best) {
  // insertion into a 3-slot sorted best list (simple_knn.cu updateKBest<3>)
  for (int j = 0; j < 3; j++) {
    if (d2 < best[j]) {
      std::swap(d2, best[j]);
    }
  }
}

}  // namespace

// points: n*3 float32; out: n float32 mean of squared distances to the 3
// nearest neighbors. Returns 0 on success.
int knn_mean_dist3(const float* points, long long n, float* out,
                   int num_threads) {
  if (n <= 1) {
    for (long long i = 0; i < n; i++) out[i] = 0.f;
    return 0;
  }
  const int BOX_SIZE = 1024;

  float mn[3] = {points[0], points[1], points[2]};
  float mx[3] = {points[0], points[1], points[2]};
  for (long long i = 0; i < n; i++) {
    for (int d = 0; d < 3; d++) {
      mn[d] = std::min(mn[d], points[i * 3 + d]);
      mx[d] = std::max(mx[d], points[i * 3 + d]);
    }
  }

  std::vector<std::pair<uint32_t, uint32_t>> morton(n);
  for (long long i = 0; i < n; i++) {
    uint32_t code = 0;
    uint32_t xs[3];
    for (int d = 0; d < 3; d++) {
      float range = std::max(mx[d] - mn[d], 1e-12f);
      float t = (points[i * 3 + d] - mn[d]) / range;
      xs[d] = (uint32_t)std::min(std::max(t * 1024.f, 0.f), 1023.f);
    }
    code = (expand_bits(xs[0]) << 2) | (expand_bits(xs[1]) << 1)
           | expand_bits(xs[2]);
    morton[i] = {code, (uint32_t)i};
  }
  std::sort(morton.begin(), morton.end());

  long long n_boxes = (n + BOX_SIZE - 1) / BOX_SIZE;
  std::vector<Box> boxes(n_boxes);
  for (long long b = 0; b < n_boxes; b++) {
    Box box = {1e30f, 1e30f, 1e30f, -1e30f, -1e30f, -1e30f};
    for (long long i = b * BOX_SIZE; i < std::min<long long>((b + 1) * BOX_SIZE, n); i++) {
      const float* p = points + morton[i].second * 3;
      box.minx = std::min(box.minx, p[0]);
      box.miny = std::min(box.miny, p[1]);
      box.minz = std::min(box.minz, p[2]);
      box.maxx = std::max(box.maxx, p[0]);
      box.maxy = std::max(box.maxy, p[1]);
      box.maxz = std::max(box.maxz, p[2]);
    }
    boxes[b] = box;
  }

  if (num_threads <= 0)
    num_threads = std::max(1u, std::thread::hardware_concurrency());
  std::atomic<long long> next(0);

  auto worker = [&]() {
    const long long CHUNK = 256;
    while (true) {
      long long start = next.fetch_add(CHUNK);
      if (start >= n) break;
      long long stop = std::min(start + CHUNK, n);
      for (long long si = start; si < stop; si++) {
        const float* p = points + morton[si].second * 3;
        float best[3] = {1e30f, 1e30f, 1e30f};
        // seed reject radius from +-3 sorted neighbors (simple_knn.cu:156)
        for (long long j = std::max<long long>(0, si - 3);
             j <= std::min<long long>(n - 1, si + 3); j++) {
          if (j == si) continue;
          const float* q = points + morton[j].second * 3;
          float dx = p[0] - q[0], dy = p[1] - q[1], dz = p[2] - q[2];
          update_kbest(dx * dx + dy * dy + dz * dz, best);
        }
        // seeds only establish the reject radius; the best list restarts so
        // seed neighbors are not double-counted by the box scan
        float reject = best[2];
        best[0] = best[1] = best[2] = 1e30f;
        for (long long b = 0; b < (long long)boxes.size(); b++) {
          float bd = box_dist2(boxes[b], p);
          if (bd > reject || bd > best[2]) continue;
          for (long long i = b * BOX_SIZE;
               i < std::min<long long>((b + 1) * BOX_SIZE, n); i++) {
            if (i == si) continue;
            const float* q = points + morton[i].second * 3;
            float dx = p[0] - q[0], dy = p[1] - q[1], dz = p[2] - q[2];
            update_kbest(dx * dx + dy * dy + dz * dz, best);
          }
        }
        out[morton[si].second] = (best[0] + best[1] + best[2]) / 3.f;
      }
    }
  };

  std::vector<std::thread> threads;
  for (int t = 0; t < num_threads; t++) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return 0;
}

}  // extern "C"
