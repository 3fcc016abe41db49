// fluidnet_native: C++ runtime components for fluidnet_cxx_tpu.
//
// Two roles, mirroring where the reference uses native code:
//  1. Data-loader hot path: Mantaflow .bin parsing into caller-provided
//     buffers (the reference preprocesses .bin via torch in a process pool,
//     ref: pytorch/lib/dataset_load.py:110-127; here parsing is a single
//     fread + scatter, called from Python via ctypes).
//  2. Scalar per-cell oracle kernels (divergence, velocity update, wall BCs,
//     sources, Jacobi, semi-Lagrangian advection) — the fast, obviously
//     correct golden reference for the XLA/Pallas kernels, the role the
//     original FluidNet per-cell code plays in the reference's test harness
//     (ref: solver_cpp/src/fluidnet_implementation/).
//
// All kernels are 2-D over layout: scalars (b, h, w) row-major, velocity
// (b, 2, h, w); flags int32. Built with `make` into libfluidnet_native.so.
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <algorithm>
#include <limits>

extern "C" {

enum CellType : int32_t {
  kFluid = 1,
  kObstacle = 2,
  kEmpty = 4,
};

// ---------------------------------------------------------------- manta io

// Parses a 2-D Manta .bin file. Returns 0 on success, negative error codes
// otherwise. Caller passes buffers of size h*w (p, density, flags) and
// 2*h*w (U); dims must match the header (query first with
// manta_bin_header).
int manta_bin_header(const char* path, int32_t* nx, int32_t* ny, int32_t* nz,
                     int32_t* is3d) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int32_t head[5];
  if (fread(head, 4, 5, f) != 5) { fclose(f); return -2; }
  *nx = head[1]; *ny = head[2]; *nz = head[3]; *is3d = head[4];
  fclose(f);
  return 0;
}

int manta_bin_load2d(const char* path, float* p, float* U, int32_t* flags,
                     float* density, int32_t h, int32_t w) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int32_t head[5];
  if (fread(head, 4, 5, f) != 5) { fclose(f); return -2; }
  const int64_t n = (int64_t)head[1] * head[2] * head[3];
  if (head[4] != 0 || head[1] != w || head[2] != h || head[3] != 1) {
    fclose(f);
    return -3;  // dims mismatch or 3-D file
  }
  // Ux, Uy are stored consecutively; U buffer is already (2, h, w).
  if (fread(U, 4, 2 * n, f) != (size_t)(2 * n)) { fclose(f); return -4; }
  if (fread(p, 4, n, f) != (size_t)n) { fclose(f); return -4; }
  if (fread(flags, 4, n, f) != (size_t)n) { fclose(f); return -4; }
  if (fread(density, 4, n, f) != (size_t)n) { fclose(f); return -4; }
  fclose(f);
  return 0;
}

// 3-D variant. Blob order per the reference reader is Ux, Uy, p, THEN Uz
// (after p) for is3D files, then flags, density
// (ref: pytorch/lib/load_manta_data.py:16-24). Buffers: p/flags/density
// d*h*w, U 3*d*h*w, all (nz, ny, nx) row-major. The leading `transpose`
// header word is read and ignored, exactly like the reference does.
int manta_bin_load3d(const char* path, float* p, float* U, int32_t* flags,
                     float* density, int32_t d, int32_t h, int32_t w) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int32_t head[5];
  if (fread(head, 4, 5, f) != 5) { fclose(f); return -2; }
  const int64_t n = (int64_t)head[1] * head[2] * head[3];
  if (head[4] != 1 || head[1] != w || head[2] != h || head[3] != d) {
    fclose(f);
    return -3;  // dims mismatch or 2-D file
  }
  if (fread(U, 4, 2 * n, f) != (size_t)(2 * n)) { fclose(f); return -4; }
  if (fread(p, 4, n, f) != (size_t)n) { fclose(f); return -4; }
  if (fread(U + 2 * n, 4, n, f) != (size_t)n) { fclose(f); return -4; }
  if (fread(flags, 4, n, f) != (size_t)n) { fclose(f); return -4; }
  if (fread(density, 4, n, f) != (size_t)n) { fclose(f); return -4; }
  fclose(f);
  return 0;
}

// ---------------------------------------------------------------- stencils

#define AT(a, j, i) (a)[(int64_t)(j) * w + (i)]
#define ATC(a, c, j, i) (a)[((int64_t)(c) * h + (j)) * w + (i)]

// rhs = -div(U) per fluid cell (zero on border & obstacles)
// (semantics: pytorch/lib/fluid/velocity_divergence.py:58-73).
void velocity_divergence2d(const float* U, const int32_t* flags, float* out,
                           int32_t h, int32_t w) {
  std::memset(out, 0, sizeof(float) * h * w);
  for (int j = 1; j < h - 1; ++j)
    for (int i = 1; i < w - 1; ++i) {
      if (AT(flags, j, i) == kObstacle) continue;
      AT(out, j, i) = ATC(U, 0, j, i) - ATC(U, 0, j, i + 1) +
                      ATC(U, 1, j, i) - ATC(U, 1, j + 1, i);
    }
}

// U -= grad(p) with Bridson BC treatment
// (semantics: pytorch/lib/fluid/velocity_update.py:47-149).
void velocity_update2d(const float* p, float* U, const int32_t* flags,
                       int32_t h, int32_t w) {
  for (int j = 1; j < h - 1; ++j)
    for (int i = 1; i < w - 1; ++i) {
      const int32_t f = AT(flags, j, i);
      const int jm[2] = {j, j - 1};
      const int im[2] = {i - 1, i};
      for (int c = 0; c < 2; ++c) {
        const int32_t fm = AT(flags, jm[c], im[c]);
        float v = ATC(U, c, j, i);
        if (f == kFluid && fm == kFluid)
          v -= AT(p, j, i) - AT(p, jm[c], im[c]);
        else if (f == kFluid && fm == kEmpty)
          v -= AT(p, j, i);
        else if (f == kEmpty && fm == kFluid)
          v += AT(p, jm[c], im[c]);
        else
          v = 0.f;
        ATC(U, c, j, i) = v;
      }
    }
}

// Free-slip wall BCs (semantics: pytorch/lib/fluid/set_wall_bcs.py:47-78).
void set_wall_bcs2d(float* U, const int32_t* flags, int32_t h, int32_t w) {
  for (int j = 0; j < h; ++j)
    for (int i = 0; i < w; ++i) {
      const int32_t f = AT(flags, j, i);
      if (f != kFluid && f != kObstacle) continue;
      const int il = std::max(i - 1, 0), jl = std::max(j - 1, 0);
      if (AT(flags, j, il) == kObstacle ||
          (f == kObstacle && AT(flags, j, il) == kFluid))
        ATC(U, 0, j, i) = 0.f;
      if (AT(flags, jl, i) == kObstacle ||
          (f == kObstacle && AT(flags, jl, i) == kFluid))
        ATC(U, 1, j, i) = 0.f;
    }
}

// Boussinesq buoyancy (semantics: pytorch/lib/fluid/source_terms.py:6-116).
void add_buoyancy2d(float* U, const int32_t* flags, const float* density,
                    const float* gravity, float rho_star, float dt,
                    int32_t h, int32_t w) {
  const float sx = gravity[0] * dt, sy = gravity[1] * dt;
  for (int j = 1; j < h - 1; ++j)
    for (int i = 1; i < w - 1; ++i) {
      if (AT(flags, j, i) != kFluid) continue;
      if (AT(flags, j, i - 1) == kFluid)
        ATC(U, 0, j, i) +=
            sx * (0.5f * (AT(density, j, i) + AT(density, j, i - 1)) -
                  rho_star);
      if (AT(flags, j - 1, i) == kFluid)
        ATC(U, 1, j, i) +=
            sy * (0.5f * (AT(density, j, i) + AT(density, j - 1, i)) -
                  rho_star);
    }
}

// Body force on fluid/empty faces
// (semantics: pytorch/lib/fluid/source_terms.py:122-219).
void add_gravity2d(float* U, const int32_t* flags, const float* gravity,
                   float dt, int32_t h, int32_t w) {
  const float fx = gravity[0] * dt, fy = gravity[1] * dt;
  for (int j = 1; j < h - 1; ++j)
    for (int i = 1; i < w - 1; ++i) {
      const int32_t cur = AT(flags, j, i);
      if (cur != kFluid && cur != kEmpty) continue;
      const int32_t fxm = AT(flags, j, i - 1);
      const int32_t fym = AT(flags, j - 1, i);
      if (fxm == kFluid || (fxm == kEmpty && cur == kFluid))
        ATC(U, 0, j, i) += fx;
      if (fym == kFluid || (fym == kEmpty && cur == kFluid))
        ATC(U, 1, j, i) += fy;
    }
}

// Jacobi pressure solve, fixed iterations, p0=0
// (semantics: pytorch/lib/fluid/cpp/fluids_init.cpp:858-994). Returns the
// final ||p - p_prev||_2 residual.
float solve_jacobi2d(const int32_t* flags, const float* div, float* p_out,
                     int32_t iters, int32_t h, int32_t w) {
  const int64_t n = (int64_t)h * w;
  float* scratch = new float[n];
  float* cur = p_out;    // newest iterate
  float* prev = scratch;
  std::memset(cur, 0, sizeof(float) * n);
  std::memset(prev, 0, sizeof(float) * n);
  float res = 0.f;
  for (int it = 0; it < iters; ++it) {
    std::swap(cur, prev);  // prev <- last iterate
    double acc = 0.0;
    for (int j = 0; j < h; ++j)
      for (int i = 0; i < w; ++i) {
        float v = 0.f;
        if (j >= 1 && j < h - 1 && i >= 1 && i < w - 1 &&
            AT(flags, j, i) != kObstacle) {
          const int jj[4] = {j, j, j - 1, j + 1};
          const int ii[4] = {i - 1, i + 1, i, i};
          float s = AT(div, j, i);
          for (int k = 0; k < 4; ++k)
            s += (AT(flags, jj[k], ii[k]) == kObstacle)
                     ? AT(prev, j, i)
                     : AT(prev, jj[k], ii[k]);
          v = 0.25f * s;
        }
        AT(cur, j, i) = v;
        const double d = (double)v - AT(prev, j, i);
        acc += d * d;
      }
    res = (float)std::sqrt(acc);
  }
  if (cur != p_out) std::memcpy(p_out, cur, sizeof(float) * n);
  delete[] scratch;
  return res;
}

// ------------------------------------------------------------- advection

static inline float interpol2d(const float* s, float px, float py,
                               int32_t h, int32_t w) {
  // pos-0.5 corner convention (semantics: pytorch/lib/fluid/cpp/grid.cpp:13-76)
  const float qx = px - 0.5f, qy = py - 0.5f;
  int x0 = (int)qx, y0 = (int)qy;  // trunc toward zero
  float s1 = std::min(std::max(qx - x0, 0.f), 1.f);
  float t1 = std::min(std::max(qy - y0, 0.f), 1.f);
  x0 = std::min(std::max(x0, 0), w - 2);
  y0 = std::min(std::max(y0, 0), h - 2);
  const float s0 = 1.f - s1, t0 = 1.f - t1;
  return (AT(s, y0, x0) * t0 + AT(s, y0 + 1, x0) * t1) * s0 +
         (AT(s, y0, x0 + 1) * t0 + AT(s, y0 + 1, x0 + 1) * t1) * s1;
}

static inline float interpol_fluid2d(const float* s, const int32_t* flags,
                                     float px, float py, int32_t h,
                                     int32_t w) {
  const float qx = px - 0.5f, qy = py - 0.5f;
  int x0 = (int)qx, y0 = (int)qy;
  float s1 = std::min(std::max(qx - x0, 0.f), 1.f);
  float t1 = std::min(std::max(qy - y0, 0.f), 1.f);
  x0 = std::min(std::max(x0, 0), w - 2);
  y0 = std::min(std::max(y0, 0), h - 2);
  const float s0 = 1.f - s1, t0 = 1.f - t1;
  const bool fa = AT(flags, y0, x0) == kFluid;
  const bool fb = AT(flags, y0 + 1, x0) == kFluid;
  const bool fc = AT(flags, y0, x0 + 1) == kFluid;
  const bool fd = AT(flags, y0 + 1, x0 + 1) == kFluid;
  auto comb = [](float va, bool ba, float vb, bool bb, float ta, float tb,
                 bool* ok) -> float {
    if (!ba && !bb) { *ok = false; return 0.f; }
    *ok = true;
    if (!ba) return vb;
    if (!bb) return va;
    return va * ta + vb * tb;
  };
  bool oab, ocd, ov;
  const float vab =
      comb(AT(s, y0, x0), fa, AT(s, y0 + 1, x0), fb, t0, t1, &oab);
  const float vcd =
      comb(AT(s, y0, x0 + 1), fc, AT(s, y0 + 1, x0 + 1), fd, t0, t1, &ocd);
  const float v = comb(vab, oab, vcd, ocd, s0, s1, &ov);
  if (!ov) return interpol2d(s, px, py, h, w);
  return v;
}

// MacCormack scalar advection with straight back-trace (line_trace=false
// variant; the traced variant is exercised through the Python oracle).
void advect_scalar2d(float dt, const float* src, const float* U,
                     const int32_t* flags, float* out, float strength,
                     int32_t sample_outside, int32_t h, int32_t w) {
  const int64_t n = (int64_t)h * w;
  float* fwd = new float[n];
  float* bwd = new float[n];
  float* ccx = new float[n];
  float* ccy = new float[n];
  std::memset(ccx, 0, 4 * n);
  std::memset(ccy, 0, 4 * n);
  for (int j = 1; j < h - 1; ++j)
    for (int i = 1; i < w - 1; ++i) {
      AT(ccx, j, i) = 0.5f * (ATC(U, 0, j, i) + ATC(U, 0, j, i + 1));
      AT(ccy, j, i) = 0.5f * (ATC(U, 1, j, i) + ATC(U, 1, j + 1, i));
    }
  auto sl = [&](const float* field, float sdt, float* dst) {
    for (int j = 0; j < h; ++j)
      for (int i = 0; i < w; ++i) {
        if (AT(flags, j, i) != kFluid) { AT(dst, j, i) = AT(field, j, i); continue; }
        const float px = i + 0.5f - sdt * AT(ccx, j, i);
        const float py = j + 0.5f - sdt * AT(ccy, j, i);
        AT(dst, j, i) = sample_outside
                            ? interpol2d(field, px, py, h, w)
                            : interpol_fluid2d(field, flags, px, py, h, w);
      }
    for (int j = 0; j < h; ++j)
      for (int i = 0; i < w; ++i)
        if (j == 0 || j == h - 1 || i == 0 || i == w - 1) AT(dst, j, i) = 0.f;
  };
  sl(src, dt, fwd);
  sl(fwd, -dt, bwd);
  for (int j = 0; j < h; ++j)
    for (int i = 0; i < w; ++i) {
      float v = AT(fwd, j, i);
      if (AT(flags, j, i) == kFluid)
        v += strength * 0.5f * (AT(src, j, i) - AT(bwd, j, i));
      AT(out, j, i) = v;
    }
  // clamp to 3x3 fluid neighbourhood of the fwd landing cell
  for (int j = 1; j < h - 1; ++j)
    for (int i = 1; i < w - 1; ++i) {
      const float px = i + 0.5f - dt * AT(ccx, j, i);
      const float py = j + 0.5f - dt * AT(ccy, j, i);
      const bool is_fl = AT(flags, j, i) == kFluid;
      const float bx = is_fl ? px : i + 0.5f;
      const float by = is_fl ? py : j + 0.5f;
      int i0 = std::min(std::max((int)bx, 0), w - 1);
      int j0 = std::min(std::max((int)by, 0), h - 1);
      float mn = std::numeric_limits<float>::infinity(), mx = -mn;
      int cnt = 0;
      for (int dj = -1; dj <= 1; ++dj)
        for (int di = -1; di <= 1; ++di) {
          const int ii = i0 + di, jj = j0 + dj;
          if (ii < 0 || ii >= w || jj < 0 || jj >= h) continue;
          if (AT(flags, jj, ii) == kFluid || sample_outside) {
            mn = std::min(mn, AT(src, jj, ii));
            mx = std::max(mx, AT(src, jj, ii));
            ++cnt;
          }
        }
      AT(out, j, i) = cnt >= 1
                          ? std::max(mn, std::min(mx, AT(out, j, i)))
                          : AT(fwd, j, i);
    }
  delete[] fwd; delete[] bwd; delete[] ccx; delete[] ccy;
}

}  // extern "C"
