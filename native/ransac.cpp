// Native robust two-view estimator: essential-matrix RANSAC (8-point, MSAC
// scoring, local optimization) + pose recovery by cheirality voting.
//
// This is the framework's C++ counterpart of the native machinery the
// reference delegates to OpenCV C++ / PoseLib (reference
// romatch/utils/utils.py:31-76, benchmarks/*_poselib.py). Self-contained:
// fixed-size Jacobi eigen/SVD in linalg.h, no external dependencies.
// Exposed through a C ABI consumed via ctypes (roma_tpu/estimation/native.py).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libransac.so ransac.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

#include "linalg.h"

namespace {

using rt::det3;
using rt::jacobi_eigen;
using rt::matmul3;
using rt::nullvec4;
using rt::svd3;
using rt::transpose3;

struct Pt {
  double x, y;
};

// Hartley normalization: returns transform T s.t. q = T p (homogeneous).
void normalize_pts(const Pt* p, const int* idx, int k, Pt* out, double T[9]) {
  double mx = 0, my = 0;
  for (int i = 0; i < k; ++i) {
    mx += p[idx[i]].x;
    my += p[idx[i]].y;
  }
  mx /= k;
  my /= k;
  double d = 0;
  for (int i = 0; i < k; ++i) {
    double dx = p[idx[i]].x - mx, dy = p[idx[i]].y - my;
    d += std::sqrt(dx * dx + dy * dy);
  }
  d /= k;
  double s = std::sqrt(2.0) / std::max(d, 1e-12);
  for (int i = 0; i < k; ++i) {
    out[i].x = s * (p[idx[i]].x - mx);
    out[i].y = s * (p[idx[i]].y - my);
  }
  T[0] = s; T[1] = 0; T[2] = -s * mx;
  T[3] = 0; T[4] = s; T[5] = -s * my;
  T[6] = 0; T[7] = 0; T[8] = 1;
}

// Normalized 8-point on k >= 8 correspondences; E projected to the
// essential manifold after denormalization.
bool eight_point(const Pt* p0, const Pt* p1, const int* idx, int k,
                 double E[9]) {
  std::vector<Pt> n0(k), n1(k);
  double T0[9], T1[9];
  normalize_pts(p0, idx, k, n0.data(), T0);
  normalize_pts(p1, idx, k, n1.data(), T1);

  // accumulate A^T A for rows a = [x1x0, x1y0, x1, y1x0, y1y0, y1, x0, y0, 1]
  double ATA[81] = {0};
  for (int i = 0; i < k; ++i) {
    double a[9] = {n1[i].x * n0[i].x, n1[i].x * n0[i].y, n1[i].x,
                   n1[i].y * n0[i].x, n1[i].y * n0[i].y, n1[i].y,
                   n0[i].x,           n0[i].y,           1.0};
    for (int r = 0; r < 9; ++r)
      for (int c = 0; c < 9; ++c) ATA[r * 9 + c] += a[r] * a[c];
  }
  double w[9], V[81];
  jacobi_eigen<9>(ATA, w, V);
  double F[9];
  for (int i = 0; i < 9; ++i) F[i] = V[i * 9 + 8];  // smallest eigenvalue

  // denormalize F = T1^T F T0
  double T1t[9], tmp[9];
  transpose3(T1, T1t);
  matmul3(T1t, F, tmp);
  matmul3(tmp, T0, F);

  // project to essential manifold
  double U[9], s[3], Vt[9], Vm[9];
  svd3(F, U, s, Vm);
  double sm = 0.5 * (s[0] + s[1]);
  double S[9] = {sm, 0, 0, 0, sm, 0, 0, 0, 0};
  transpose3(Vm, Vt);
  matmul3(U, S, tmp);
  matmul3(tmp, Vt, E);
  return true;
}

double sampson_sq(const double E[9], const Pt& a, const Pt& b) {
  double Fx0[3] = {E[0] * a.x + E[1] * a.y + E[2],
                   E[3] * a.x + E[4] * a.y + E[5],
                   E[6] * a.x + E[7] * a.y + E[8]};
  double Ftx1[3] = {E[0] * b.x + E[3] * b.y + E[6],
                    E[1] * b.x + E[4] * b.y + E[7],
                    E[2] * b.x + E[5] * b.y + E[8]};
  double e = b.x * Fx0[0] + b.y * Fx0[1] + Fx0[2];
  double denom =
      Fx0[0] * Fx0[0] + Fx0[1] * Fx0[1] + Ftx1[0] * Ftx1[0] + Ftx1[1] * Ftx1[1];
  return e * e / std::max(denom, 1e-12);
}

// MSAC score over all points; fills inlier flags.
double score_model(const double E[9], const Pt* p0, const Pt* p1, int n,
                   double t2, uint8_t* inl) {
  double score = 0;
  for (int i = 0; i < n; ++i) {
    double r2 = sampson_sq(E, p0[i], p1[i]);
    if (r2 < t2) {
      score += r2;
      if (inl) inl[i] = 1;
    } else {
      score += t2;
      if (inl) inl[i] = 0;
    }
  }
  return score;
}

void triangulate_point(const double R[9], const double t[3], const Pt& a,
                       const Pt& b, double X[3]) {
  // P0 = [I|0], P1 = [R|t]; DLT rows
  double A[16] = {
      -1, 0,  a.x, 0,
      0,  -1, a.y, 0,
      b.x * R[6] - R[0], b.x * R[7] - R[1], b.x * R[8] - R[2], b.x * t[2] - t[0],
      b.y * R[6] - R[3], b.y * R[7] - R[4], b.y * R[8] - R[5], b.y * t[2] - t[1]};
  double x4[4];
  nullvec4(A, x4);
  double wv = (std::fabs(x4[3]) < 1e-12) ? 1e-12 : x4[3];
  X[0] = x4[0] / wv;
  X[1] = x4[1] / wv;
  X[2] = x4[2] / wv;
}

// Decompose E into 4 (R, t) candidates and pick by cheirality.
int recover_pose(const double E[9], const Pt* p0, const Pt* p1, int n,
                 const uint8_t* inl, double R_out[9], double t_out[3]) {
  double U[9], s[3], V[9];
  svd3(E, U, s, V);
  if (det3(U) < 0)
    for (int i = 0; i < 9; ++i) U[i] = -U[i];
  if (det3(V) < 0)
    for (int i = 0; i < 9; ++i) V[i] = -V[i];
  double W[9] = {0, -1, 0, 1, 0, 0, 0, 0, 1};
  double Wt[9];
  transpose3(W, Wt);
  double Vt[9];
  transpose3(V, Vt);
  double R1[9], R2[9], tmp[9];
  matmul3(U, W, tmp);
  matmul3(tmp, Vt, R1);
  matmul3(U, Wt, tmp);
  matmul3(tmp, Vt, R2);
  double tv[3] = {U[2], U[5], U[8]};

  const double* Rs[4] = {R1, R1, R2, R2};
  double ts[4][3] = {{tv[0], tv[1], tv[2]},
                     {-tv[0], -tv[1], -tv[2]},
                     {tv[0], tv[1], tv[2]},
                     {-tv[0], -tv[1], -tv[2]}};
  int best_good = -1, best_i = 0;
  // subsample inliers for the vote
  std::vector<int> sel;
  for (int i = 0; i < n && (int)sel.size() < 512; ++i)
    if (!inl || inl[i]) sel.push_back(i);
  for (int c = 0; c < 4; ++c) {
    int good = 0;
    for (int i : sel) {
      double X[3];
      triangulate_point(Rs[c], ts[c], p0[i], p1[i], X);
      double z0 = X[2];
      double z1 = Rs[c][6] * X[0] + Rs[c][7] * X[1] + Rs[c][8] * X[2] + ts[c][2];
      if (z0 > 0 && z1 > 0 && z0 < 50 && z1 < 50) ++good;
    }
    if (good > best_good) {
      best_good = good;
      best_i = c;
    }
  }
  std::memcpy(R_out, Rs[best_i], 9 * sizeof(double));
  std::memcpy(t_out, ts[best_i], 3 * sizeof(double));
  return best_good;
}

}  // namespace

extern "C" {

// Essential-matrix RANSAC + pose recovery on K-normalized correspondences.
// p0, p1: (n, 2) row-major doubles. Returns number of inliers (0 on failure).
// Outputs: E (9), R (9), t (3), inliers (n bytes).
int estimate_essential_ransac(const double* p0_raw, const double* p1_raw,
                              int n, double threshold, int max_iters,
                              uint64_t seed, double* E_out, double* R_out,
                              double* t_out, uint8_t* inliers_out) {
  if (n < 8) return 0;
  const Pt* p0 = reinterpret_cast<const Pt*>(p0_raw);
  const Pt* p1 = reinterpret_cast<const Pt*>(p1_raw);
  double t2 = threshold * threshold;
  std::mt19937_64 rng(seed);
  std::uniform_int_distribution<int> uni(0, n - 1);

  double best_score = 1e300;
  double best_E[9];
  std::vector<uint8_t> inl(n), best_inl(n);

  int idx[8];
  for (int it = 0; it < max_iters; ++it) {
    // sample 8 distinct indices
    for (int i = 0; i < 8; ++i) {
      bool dup;
      do {
        idx[i] = uni(rng);
        dup = false;
        for (int j = 0; j < i; ++j) dup |= (idx[j] == idx[i]);
      } while (dup);
    }
    double E[9];
    if (!eight_point(p0, p1, idx, 8, E)) continue;
    double sc = score_model(E, p0, p1, n, t2, inl.data());
    if (sc < best_score) {
      best_score = sc;
      std::memcpy(best_E, E, sizeof(best_E));
      best_inl = inl;
    }
  }
  if (best_score >= 1e300) return 0;

  // local optimization: iterated re-fit on inliers (capped)
  for (int lo = 0; lo < 2; ++lo) {
    std::vector<int> ii;
    for (int i = 0; i < n; ++i)
      if (best_inl[i]) ii.push_back(i);
    if ((int)ii.size() <= 8) break;
    if ((int)ii.size() > 4096) {
      std::shuffle(ii.begin(), ii.end(), rng);
      ii.resize(4096);
    }
    double E[9];
    if (!eight_point(p0, p1, ii.data(), (int)ii.size(), E)) break;
    double sc = score_model(E, p0, p1, n, t2, inl.data());
    if (sc < best_score) {
      best_score = sc;
      std::memcpy(best_E, E, sizeof(best_E));
      best_inl = inl;
    } else {
      break;
    }
  }

  std::memcpy(E_out, best_E, sizeof(best_E));
  if (inliers_out) std::memcpy(inliers_out, best_inl.data(), n);
  int ngood = recover_pose(best_E, p0, p1, n, best_inl.data(), R_out, t_out);
  int count = 0;
  for (int i = 0; i < n; ++i) count += best_inl[i];
  return ngood > 0 ? count : 0;
}

}  // extern "C"
