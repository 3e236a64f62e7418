// nvrhost — native host-side data-path kernels for instant_nvr_tpu.
//
// The reference's native layer is CUDA compute kernels (torchsearchsorted,
// pointnet2, pytorch3d KNN — see SURVEY.md §2.9); on TPU those live in
// XLA/Pallas.  What remains performance-critical on the *host* is the data
// pipeline feeding the chip: per-item ray generation, AABB intersection and
// weighted pixel sampling run for every training step.  This module
// implements them in C++ (exposed via ctypes, no pybind11 dependency) so the
// prefetch thread can run them without the GIL and without numpy temporary
// churn.
//
//   build: see csrc/build.sh  ->  libnvrhost.so
//   python binding: instant_nvr_tpu/utils/native.py
//
// All functions are plain C ABI over contiguous float/int buffers.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <random>
#include <vector>

extern "C" {

// Pinhole rays for a pixel list.
// K: 3x3 row-major, R: 3x3, T: 3 (world->cam), coords: n x 2 (row, col)
// out_o: n x 3, out_d: n x 3 (normalized)
void ray_dirs(const double* K, const double* R, const double* T,
              const int64_t* coords, int64_t n,
              float* out_o, float* out_d) {
  // camera origin: -R^T T
  double cam_o[3];
  for (int i = 0; i < 3; ++i)
    cam_o[i] = -(R[0 * 3 + i] * T[0] + R[1 * 3 + i] * T[1] + R[2 * 3 + i] * T[2]);

  // inverse of K (upper-triangular pinhole)
  const double fx = K[0], cx = K[2], fy = K[4], cy = K[5];

  for (int64_t i = 0; i < n; ++i) {
    const double py = (double)coords[i * 2 + 0];  // row (y)
    const double px = (double)coords[i * 2 + 1];  // col (x)
    // pixel -> camera
    double xc = (px - cx) / fx;
    double yc = (py - cy) / fy;
    double zc = 1.0;
    // camera -> world direction: R^T * dir
    double dw[3];
    for (int k = 0; k < 3; ++k)
      dw[k] = R[0 * 3 + k] * xc + R[1 * 3 + k] * yc + R[2 * 3 + k] * zc;
    double norm = std::sqrt(dw[0] * dw[0] + dw[1] * dw[1] + dw[2] * dw[2]);
    for (int k = 0; k < 3; ++k) {
      out_o[i * 3 + k] = (float)cam_o[k];
      out_d[i * 3 + k] = (float)(dw[k] / norm);
    }
  }
}

// AABB slab test for n rays. bounds: 2x3. Returns hits; near/far filled for
// hits only when compact=1 (reference get_near_far contract), else per-ray.
int64_t near_far(const float* bounds, const float* ray_o, const float* ray_d,
                 int64_t n, float* near_out, float* far_out, uint8_t* hit_out,
                 int compact) {
  int64_t n_hit = 0;
  for (int64_t i = 0; i < n; ++i) {
    float t1 = -1e30f, t2 = 1e30f;
    float norm = 0.f;
    for (int k = 0; k < 3; ++k) norm += ray_d[i * 3 + k] * ray_d[i * 3 + k];
    norm = std::sqrt(norm);
    for (int k = 0; k < 3; ++k) {
      float v = ray_d[i * 3 + k] / norm;
      if (v >= 0.f && v < 1e-5f) v = 1e-5f;
      if (v < 0.f && v > -1e-5f) v = -1e-5f;
      float lo = (bounds[k] - ray_o[i * 3 + k]) / v;
      float hi = (bounds[3 + k] - ray_o[i * 3 + k]) / v;
      if (lo > hi) std::swap(lo, hi);
      t1 = std::max(t1, lo);
      t2 = std::min(t2, hi);
    }
    const bool hit = t1 < t2;
    hit_out[i] = hit ? 1 : 0;
    const int64_t slot = compact ? n_hit : i;
    if (hit || !compact) {
      near_out[slot] = t1 / norm;
      far_out[slot] = t2 / norm;
    }
    if (hit) ++n_hit;
  }
  return n_hit;
}

// Weighted pixel sampling: draw n_body from {msk==1}, n_face from {msk==13},
// n_rand from {bound_mask==1}; coords written as (row, col) int64 pairs.
// Returns number written (may be < requested if classes are empty).
int64_t sample_pixels(const uint8_t* msk, const uint8_t* bound_mask,
                      int64_t H, int64_t W,
                      int64_t n_body, int64_t n_face, int64_t n_rand,
                      uint64_t seed, int64_t* coords_out) {
  // index lists
  std::vector<int64_t> body, face, box;
  body.reserve(H * W / 8);
  box.reserve(H * W / 4);
  for (int64_t i = 0; i < H * W; ++i) {
    if (msk[i] == 1) body.push_back(i);
    if (msk[i] == 13) face.push_back(i);
    if (bound_mask[i] == 1) box.push_back(i);
  }
  std::mt19937_64 rng(seed);
  int64_t written = 0;
  auto draw = [&](const std::vector<int64_t>& pool, int64_t count) {
    if (pool.empty()) return;
    std::uniform_int_distribution<int64_t> dist(0, (int64_t)pool.size() - 1);
    for (int64_t i = 0; i < count; ++i) {
      int64_t p = pool[dist(rng)];
      coords_out[written * 2 + 0] = p / W;
      coords_out[written * 2 + 1] = p % W;
      ++written;
    }
  };
  int64_t face_extra = face.empty() ? n_face : 0;
  int64_t body_extra = body.empty() ? n_body : 0;
  draw(body, n_body);
  draw(face, n_face);
  draw(box, n_rand + face_extra + body_extra);
  return written;
}

}  // extern "C"
