// Coarse-to-fine variational optical flow (Ce Liu's method), C++ core.
//
// Native equivalent of the reference's pyflow.so (SURVEY.md C20): the
// classical IRLS formulation with robust (Charbonnier) data and smoothness
// penalties, solved by SOR (omega = 1.8) inside inner/outer fixed-point
// loops over a Gaussian pyramid. Same knobs and defaults as the reference
// call site (post_processing/generate_soft_score_from_buffer.py:130-138):
// alpha=0.012, ratio=0.75, minWidth=20, nOuter=7, nInner=1, nSOR=30,
// colType=0 (RGB).
//
// Exposed through a plain C ABI; Python binds via ctypes
// (unsupervised_detection_tpu/native/pyflow.py).

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Img {
  int h = 0, w = 0, c = 0;
  std::vector<double> d;  // interleaved channels, row-major

  Img() = default;
  Img(int h_, int w_, int c_) : h(h_), w(w_), c(c_), d((size_t)h_ * w_ * c_, 0.0) {}
  double* px(int y, int x) { return &d[((size_t)y * w + x) * c]; }
  const double* px(int y, int x) const { return &d[((size_t)y * w + x) * c]; }
};

inline int clampi(int v, int lo, int hi) { return v < lo ? lo : (v > hi ? hi : v); }

// Bilinear sample with border replication.
void bilinear_sample(const Img& im, double x, double y, double* out) {
  int x0 = (int)std::floor(x), y0 = (int)std::floor(y);
  double ax = x - x0, ay = y - y0;
  int x1 = x0 + 1, y1 = y0 + 1;
  x0 = clampi(x0, 0, im.w - 1); x1 = clampi(x1, 0, im.w - 1);
  y0 = clampi(y0, 0, im.h - 1); y1 = clampi(y1, 0, im.h - 1);
  const double* p00 = im.px(y0, x0);
  const double* p01 = im.px(y0, x1);
  const double* p10 = im.px(y1, x0);
  const double* p11 = im.px(y1, x1);
  for (int k = 0; k < im.c; k++) {
    double top = p00[k] + ax * (p01[k] - p00[k]);
    double bot = p10[k] + ax * (p11[k] - p10[k]);
    out[k] = top + ay * (bot - top);
  }
}

// Separable convolution with a symmetric 1-D kernel, replicate borders.
void filter_1d(const Img& src, Img& dst, const double* f, int r, bool horizontal) {
  dst = Img(src.h, src.w, src.c);
  for (int y = 0; y < src.h; y++) {
    for (int x = 0; x < src.w; x++) {
      double* o = dst.px(y, x);
      for (int t = -r; t <= r; t++) {
        int yy = horizontal ? y : clampi(y + t, 0, src.h - 1);
        int xx = horizontal ? clampi(x + t, 0, src.w - 1) : x;
        const double* p = src.px(yy, xx);
        double wgt = f[t + r];
        for (int k = 0; k < src.c; k++) o[k] += wgt * p[k];
      }
    }
  }
}

void filter_hv(const Img& src, Img& dst, const double* f, int r) {
  Img tmp;
  filter_1d(src, tmp, f, r, true);
  filter_1d(tmp, dst, f, r, false);
}

// 5-point derivative filter [1,-8,0,8,-1]/12 (the "advanced" filter).
void derivative(const Img& src, Img& dst, bool horizontal) {
  static const double f[5] = {1.0 / 12, -8.0 / 12, 0.0, 8.0 / 12, -1.0 / 12};
  filter_1d(src, dst, f, 2, horizontal);
}

void gaussian_smooth(const Img& src, Img& dst, double sigma) {
  int r = (int)(sigma * 3);
  if (r < 1) { dst = src; return; }
  std::vector<double> f(2 * r + 1);
  double s = 0;
  for (int i = -r; i <= r; i++) { f[i + r] = std::exp(-(double)i * i / (2 * sigma * sigma)); s += f[i + r]; }
  for (auto& v : f) v /= s;
  filter_hv(src, dst, f.data(), r);
}

void resize_bilinear(const Img& src, Img& dst, int nw, int nh) {
  dst = Img(nh, nw, src.c);
  double rx = (double)src.w / nw, ry = (double)src.h / nh;
  // Half-pixel-center mapping: measured closest to the reference binary
  // (tests/test_pyflow_reference_binary.py; corner mapping doubles the EPE).
  std::vector<double> buf(src.c);
  for (int y = 0; y < nh; y++)
    for (int x = 0; x < nw; x++) {
      bilinear_sample(src, (x + 0.5) * rx - 0.5, (y + 0.5) * ry - 0.5, buf.data());
      std::memcpy(dst.px(y, x), buf.data(), sizeof(double) * src.c);
    }
}

void desaturate(const Img& src, Img& dst) {
  dst = Img(src.h, src.w, 1);
  for (int i = 0; i < src.h * src.w; i++) {
    const double* p = &src.d[(size_t)i * 3];
    dst.d[i] = 0.299 * p[0] + 0.587 * p[1] + 0.114 * p[2];
  }
}

// Feature images: gray -> [I, Ix, Iy]; RGB -> [gray, gx, gy, g-r, g-b].
void im2feature(const Img& im, Img& feat) {
  if (im.c == 1) {
    Img dx, dy;
    derivative(im, dx, true);
    derivative(im, dy, false);
    feat = Img(im.h, im.w, 3);
    for (int i = 0; i < im.h * im.w; i++) {
      feat.d[(size_t)i * 3] = im.d[i];
      feat.d[(size_t)i * 3 + 1] = dx.d[i];
      feat.d[(size_t)i * 3 + 2] = dy.d[i];
    }
  } else {
    Img gray, dx, dy;
    desaturate(im, gray);
    derivative(gray, dx, true);
    derivative(gray, dy, false);
    feat = Img(im.h, im.w, 5);
    for (int i = 0; i < im.h * im.w; i++) {
      const double* p = &im.d[(size_t)i * 3];
      double* o = &feat.d[(size_t)i * 5];
      o[0] = gray.d[i];
      o[1] = dx.d[i];
      o[2] = dy.d[i];
      o[3] = p[1] - p[0];
      o[4] = p[1] - p[2];
    }
  }
}

// Warp im2 by flow; out-of-bounds pixels take im1's value.
void warp_fl(const Img& im1, const Img& im2, const std::vector<double>& u,
             const std::vector<double>& v, Img& out) {
  out = Img(im2.h, im2.w, im2.c);
  std::vector<double> buf(im2.c);
  for (int y = 0; y < im2.h; y++)
    for (int x = 0; x < im2.w; x++) {
      size_t i = (size_t)y * im2.w + x;
      double xx = x + u[i], yy = y + v[i];
      if (xx < 0 || xx > im2.w - 1 || yy < 0 || yy > im2.h - 1) {
        std::memcpy(out.px(y, x), im1.px(y, x), sizeof(double) * im2.c);
      } else {
        bilinear_sample(im2, xx, yy, buf.data());
        std::memcpy(out.px(y, x), buf.data(), sizeof(double) * im2.c);
      }
    }
}

// Blended, pre-smoothed derivatives (getDxs): smooth both frames with
// [0.02, 0.11, 0.74, 0.11, 0.02], blend 0.4*im1 + 0.6*warped, derive.
void get_dxs(const Img& im1, const Img& warp2, Img& imdx, Img& imdy, Img& imdt) {
  static const double gf[5] = {0.02, 0.11, 0.74, 0.11, 0.02};
  Img s1, s2, blend;
  filter_hv(im1, s1, gf, 2);
  filter_hv(warp2, s2, gf, 2);
  blend = Img(im1.h, im1.w, im1.c);
  for (size_t i = 0; i < blend.d.size(); i++) blend.d[i] = 0.4 * s1.d[i] + 0.6 * s2.d[i];
  derivative(blend, imdx, true);
  derivative(blend, imdy, false);
  imdt = Img(im1.h, im1.w, im1.c);
  for (size_t i = 0; i < imdt.d.size(); i++) imdt.d[i] = s2.d[i] - s1.d[i];
}

// IRLS + SOR solver for the flow increment at one pyramid level.
void smooth_flow_sor(const Img& im1feat, const Img& im2feat, Img& warp2,
                     std::vector<double>& u, std::vector<double>& v,
                     double alpha, int n_outer, int n_inner, int n_sor) {
  const int h = im1feat.h, w = im1feat.w, c = im1feat.c;
  const size_t n = (size_t)h * w;
  const double eps_data = 1e-6;   // varepsilon_psi = 0.001^2
  const double eps_smooth = 1e-6; // varepsilon_phi = 0.001^2
  const double omega = 1.8;

  std::vector<double> du(n), dv(n);
  std::vector<double> psi(n * c), phi(n);
  std::vector<double> A11(n), A12(n), A22(n), b1(n), b2(n);

  const bool dbg = std::getenv("PYFLOW_DEBUG") != nullptr;
  for (int outer = 0; outer < n_outer; outer++) {
    Img imdx, imdy, imdt;
    get_dxs(im1feat, warp2, imdx, imdy, imdt);
    std::fill(du.begin(), du.end(), 0.0);
    std::fill(dv.begin(), dv.end(), 0.0);
    if (dbg) {
      double mdt = 0, mw = 0;
      for (size_t i = 0; i < imdt.d.size(); i++) mdt = std::max(mdt, std::fabs(imdt.d[i]));
      for (size_t i = 0; i < warp2.d.size(); i++) mw = std::max(mw, std::fabs(warp2.d[i]));
      std::fprintf(stderr, "  [outer %d] max|It|=%.4f max|warp2|=%.4f\n", outer, mdt, mw);
    }

    for (int inner = 0; inner < n_inner; inner++) {
      // robust data weights psi' = 0.5 / sqrt(r^2 + eps), per channel
      for (size_t i = 0; i < n; i++)
        for (int k = 0; k < c; k++) {
          double r = imdt.d[i * c + k] + imdx.d[i * c + k] * du[i] + imdy.d[i * c + k] * dv[i];
          psi[i * c + k] = 0.5 / std::sqrt(r * r + eps_data);
        }
      // robust smoothness weights phi' from gradients of (u+du, v+dv)
      for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++) {
          size_t i = (size_t)y * w + x;
          double ux = 0, uy = 0, vx = 0, vy = 0;
          if (x < w - 1) {
            ux = (u[i + 1] + du[i + 1]) - (u[i] + du[i]);
            vx = (v[i + 1] + dv[i + 1]) - (v[i] + dv[i]);
          }
          if (y < h - 1) {
            uy = (u[i + w] + du[i + w]) - (u[i] + du[i]);
            vy = (v[i + w] + dv[i + w]) - (v[i] + dv[i]);
          }
          phi[i] = 0.5 / std::sqrt(ux * ux + uy * uy + vx * vx + vy * vy + eps_smooth);
        }

      // Normal-equation coefficients, collapsed over feature channels by
      // MEAN (Ce Liu's Image::collapse). Summing instead (a natural-looking
      // alternative) effectively weakens the smoothness term by the channel
      // count and diverges from the reference binary by 150x EPE
      // (tests/test_pyflow_reference_binary.py).
      const double collapse = 1.0 / c;
      for (size_t i = 0; i < n; i++) {
        double a11 = 0, a12 = 0, a22 = 0, r1 = 0, r2 = 0;
        for (int k = 0; k < c; k++) {
          double wgt = psi[i * c + k];
          double ix = imdx.d[i * c + k], iy = imdy.d[i * c + k], it = imdt.d[i * c + k];
          a11 += wgt * ix * ix;
          a12 += wgt * ix * iy;
          a22 += wgt * iy * iy;
          r1 -= wgt * ix * it;
          r2 -= wgt * iy * it;
        }
        A11[i] = a11 * collapse; A12[i] = a12 * collapse; A22[i] = a22 * collapse;
        b1[i] = r1 * collapse; b2[i] = r2 * collapse;
      }

      if (dbg) {
        double ma = 0, mb = 0, mp = 0, sp = 0;
        for (size_t i = 0; i < n; i++) {
          ma = std::max(ma, A11[i]);
          mb = std::max(mb, std::fabs(b1[i]));
          mp = std::max(mp, phi[i]);
          sp += phi[i];
        }
        std::fprintf(stderr, "    maxA11=%.3f maxb1=%.3f maxphi=%.3f meanphi=%.3f\n",
                     ma, mb, mp, sp / n);
      }
      if (const char* dump = std::getenv("PYFLOW_DUMP")) {
        char path[512];
        std::snprintf(path, sizeof(path), "%s/system_outer%d.bin", dump, outer);
        FILE* fh = std::fopen(path, "wb");
        if (fh) {
          int hw2[2] = {h, w};
          std::fwrite(hw2, sizeof(int), 2, fh);
          for (const auto* arr : {&A11, &A12, &A22, &b1, &b2, &phi, &u, &v}) {
            std::fwrite(arr->data(), sizeof(double), n, fh);
          }
          std::fclose(fh);
        }
      }
      // SOR sweeps on the coupled (du, dv) system
      for (int it = 0; it < n_sor; it++) {
        if (dbg) {
          double m = 0;
          for (size_t i = 0; i < n; i++) m = std::max(m, std::fabs(du[i]));
          std::fprintf(stderr, "    sweep %d: max|du|=%.5f\n", it, m);
        }
        for (int y = 0; y < h; y++)
          for (int x = 0; x < w; x++) {
            size_t i = (size_t)y * w + x;
            // edge weights follow Ce Liu's convention: the weight of the
            // edge (p, p+1) is phi at p.
            double coeff = 0, su = 0, sv = 0;
            if (x > 0) {
              double wgt = phi[i - 1];
              coeff += wgt;
              su += wgt * ((u[i - 1] + du[i - 1]) - u[i]);
              sv += wgt * ((v[i - 1] + dv[i - 1]) - v[i]);
            }
            if (x < w - 1) {
              double wgt = phi[i];
              coeff += wgt;
              su += wgt * ((u[i + 1] + du[i + 1]) - u[i]);
              sv += wgt * ((v[i + 1] + dv[i + 1]) - v[i]);
            }
            if (y > 0) {
              double wgt = phi[i - w];
              coeff += wgt;
              su += wgt * ((u[i - w] + du[i - w]) - u[i]);
              sv += wgt * ((v[i - w] + dv[i - w]) - v[i]);
            }
            if (y < h - 1) {
              double wgt = phi[i];
              coeff += wgt;
              su += wgt * ((u[i + w] + du[i + w]) - u[i]);
              sv += wgt * ((v[i + w] + dv[i + w]) - v[i]);
            }
            double diag_u = A11[i] + alpha * coeff + alpha * 0.05;
            double diag_v = A22[i] + alpha * coeff + alpha * 0.05;
            // Gauss-Seidel ordering within the 2x2 (du, dv) block: dv must
            // see the freshly updated du, or the block update degenerates
            // to Jacobi and over-relaxation (omega = 1.8) diverges.
            double rhs_u = b1[i] - A12[i] * dv[i] + alpha * su;
            du[i] = (1 - omega) * du[i] + omega * rhs_u / diag_u;
            double rhs_v = b2[i] - A12[i] * du[i] + alpha * sv;
            dv[i] = (1 - omega) * dv[i] + omega * rhs_v / diag_v;
          }
      }
    }
    if (dbg) {
      double mdu = 0;
      for (size_t i = 0; i < n; i++) mdu = std::max(mdu, std::max(std::fabs(du[i]), std::fabs(dv[i])));
      std::fprintf(stderr, "  [outer %d] max|du|=%.4f\n", outer, mdu);
    }
    for (size_t i = 0; i < n; i++) { u[i] += du[i]; v[i] += dv[i]; }
    warp_fl(im1feat, im2feat, u, v, warp2);
  }
}

}  // namespace

extern "C" {

// im1, im2: interleaved (h, w, c) doubles in [0, 1]; outputs u, v (h*w) and
// warped im2 (h*w*c). Returns 0 on success.
int coarse2fine_flow(const double* im1_data, const double* im2_data,
                     int h, int w, int c,
                     double alpha, double ratio, int min_width,
                     int n_outer, int n_inner, int n_sor, int col_type,
                     double* u_out, double* v_out, double* warped_out) {
  if (h <= 0 || w <= 0 || (c != 1 && c != 3)) return 1;
  (void)col_type;  // channel count decides the feature layout

  Img im1(h, w, c), im2(h, w, c);
  std::memcpy(im1.d.data(), im1_data, im1.d.size() * sizeof(double));
  std::memcpy(im2.d.data(), im2_data, im2.d.size() * sizeof(double));

  // --- Gaussian pyramids ------------------------------------------------
  int n_levels = (int)(std::log((double)min_width / w) / std::log(ratio)) + 1;
  if (n_levels < 1) n_levels = 1;
  std::vector<Img> pyr1(n_levels), pyr2(n_levels);
  pyr1[0] = im1;
  pyr2[0] = im2;
  double base_sigma = (1.0 / ratio - 1.0);
  int n_small = (int)(std::log(0.25) / std::log(ratio));
  double n_sigma = base_sigma * n_small;
  for (int k = 1; k < n_levels; k++) {
    for (auto pyr : {&pyr1, &pyr2}) {
      Img smoothed;
      double rate;
      const Img* src;
      if (k <= n_small) {
        double sigma = base_sigma * k;
        gaussian_smooth((*pyr)[0], smoothed, sigma);
        rate = std::pow(ratio, k);
        src = &(*pyr)[0];
      } else {
        gaussian_smooth((*pyr)[k - n_small], smoothed, n_sigma);
        rate = std::pow(ratio, k) * w / (*pyr)[k - n_small].w;
        src = &(*pyr)[k - n_small];
      }
      (void)src;
      int nw = (int)(smoothed.w * rate + 0.5);
      int nh = (int)(smoothed.h * rate + 0.5);
      // rate is relative to the smoothed source for k > n_small
      if (k > n_small) {
        nw = (int)((*pyr)[k - n_small].w * rate + 0.5);
        nh = (int)((*pyr)[k - n_small].h * rate + 0.5);
      }
      resize_bilinear(smoothed, (*pyr)[k], std::max(nw, 1), std::max(nh, 1));
    }
  }

  // --- coarse-to-fine ----------------------------------------------------
  std::vector<double> u, v;
  for (int k = n_levels - 1; k >= 0; k--) {
    Img feat1, feat2;
    im2feature(pyr1[k], feat1);
    im2feature(pyr2[k], feat2);
    int lw = pyr1[k].w, lh = pyr1[k].h;

    Img warp2;
    if (k == n_levels - 1) {
      u.assign((size_t)lw * lh, 0.0);
      v.assign((size_t)lw * lh, 0.0);
      warp2 = feat2;
    } else {
      // upsample flow to this level, scaling magnitudes
      int pw = pyr1[k + 1].w, ph = pyr1[k + 1].h;
      Img uv(ph, pw, 2);
      for (int i = 0; i < pw * ph; i++) { uv.d[(size_t)i * 2] = u[i]; uv.d[(size_t)i * 2 + 1] = v[i]; }
      Img uv_up;
      resize_bilinear(uv, uv_up, lw, lh);
      double sx = (double)lw / pw, sy = (double)lh / ph;
      u.assign((size_t)lw * lh, 0.0);
      v.assign((size_t)lw * lh, 0.0);
      for (int i = 0; i < lw * lh; i++) {
        u[i] = uv_up.d[(size_t)i * 2] * sx;
        v[i] = uv_up.d[(size_t)i * 2 + 1] * sy;
      }
      warp_fl(feat1, feat2, u, v, warp2);
    }

    // Coarser levels get extra outer (+k) and SOR (+3k) iterations, like the
    // reference (measured marginally closer to the binary with +3k).
    smooth_flow_sor(feat1, feat2, warp2, u, v, alpha, n_outer + k, n_inner,
                    n_sor + k * 3);

    if (std::getenv("PYFLOW_DEBUG")) {
      double mx = 0, su = 0;
      for (size_t i = 0; i < u.size(); i++) {
        mx = std::max(mx, std::max(std::fabs(u[i]), std::fabs(v[i])));
        su += u[i];
      }
      std::fprintf(stderr, "[pyflow] level %d (%dx%d): max|flow|=%.3f mean_u=%.3f\n",
                   k, lw, lh, mx, su / u.size());
    }
  }

  std::memcpy(u_out, u.data(), u.size() * sizeof(double));
  std::memcpy(v_out, v.data(), v.size() * sizeof(double));

  Img warped;
  warp_fl(im1, im2, u, v, warped);
  std::memcpy(warped_out, warped.d.data(), warped.d.size() * sizeof(double));
  return 0;
}

}  // extern "C"
