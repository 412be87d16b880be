// CPU baseline harness: measures hpmvs-style per-patch optimization
// throughput on this machine's CPU, for bench.py's vs_baseline denominator.
//
// The reference binary itself is not buildable in this sandbox (no system
// Eigen/gflags/glog/CImg toolchain), so this harness re-creates the
// reference's hot path faithfully (BASELINE.md: "the CPU baseline must be
// measured, not quoted"):
//   - the same objective: mean robustified 1-NCC over <=K views of 7x7x3
//     bilinearly sampled, normalized patch textures
//     (PatchOptimizer.cpp:286-311, 476-529; Patch2d.hpp:37-84)
//   - the same optimizer: the reference's own vendored nlopt BOBYQA
//     (LN_BOBYQA, xtol_rel 1e-7, maxeval 1000, angle bounds +-23.99999,
//     PatchOptimizer.cpp:322-364), compiled from
//     /root/reference/thirdLibs/nlopt-2.4.2 -- see build_baseline.sh
//   - the same surrounding per-patch pipeline cost: 3 NCC filter passes and
//     the K^2 setRefImage scan (PatchOptimizer.cpp:48-76,154-181)
//   - OpenMP over patches, like the reference's parallel loops
//     (Scene.cpp:114, main.cpp:150)
// Scene setup mirrors bench.py: 7 cameras on an arc viewing a smooth random
// textured plane, 512x512 images, 6 pyramid levels, 8-view patches.

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>
#include <random>
#include <chrono>
#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {
#include "bobyqa.h"
}

static const int IMG = 512;
static const int LEVELS = 6;
static const int NCAM = 7;
static const int K = 8;          // view slots (bench.py MAX_VIEWS)
static const int PS = 7;         // patch size
static const double MAXLEVEL = 5;

struct Vec3 { double x, y, z; };
static Vec3 sub(Vec3 a, Vec3 b) { return {a.x-b.x, a.y-b.y, a.z-b.z}; }
static Vec3 add(Vec3 a, Vec3 b) { return {a.x+b.x, a.y+b.y, a.z+b.z}; }
static Vec3 mul(Vec3 a, double s) { return {a.x*s, a.y*s, a.z*s}; }
static double dot(Vec3 a, Vec3 b) { return a.x*b.x + a.y*b.y + a.z*b.z; }
static Vec3 cross(Vec3 a, Vec3 b) {
  return {a.y*b.z - a.z*b.y, a.z*b.x - a.x*b.z, a.x*b.y - a.y*b.x};
}
static Vec3 norm3(Vec3 a) {
  double n = std::sqrt(dot(a, a)); return {a.x/n, a.y/n, a.z/n};
}

struct Camera {
  double P[LEVELS][3][4];   // per-level projection (Camera.cpp:34-63)
  Vec3 center, xaxis, yaxis, zaxis;
  double fsum;
};

struct Image {
  std::vector<float> lv[LEVELS];  // interleaved rgb per level
  int w[LEVELS], h[LEVELS];
};

static Camera cams[NCAM];
static Image imgs[NCAM];

// smooth random texture on the plane z=0, world [-1,1]^2 (testing.py analog)
static const int TG = 256;
static float texgrid[TG + 1][TG + 1][3];

static void tex_at(double x, double y, float* rgb) {
  double u = (x * 0.5 + 0.5) * TG, v = (y * 0.5 + 0.5) * TG;
  u = u < 0 ? 0 : (u > TG - 1e-3 ? TG - 1e-3 : u);
  v = v < 0 ? 0 : (v > TG - 1e-3 ? TG - 1e-3 : v);
  int iu = (int)u, iv = (int)v;
  double fu = u - iu, fv = v - iv;
  for (int c = 0; c < 3; c++) {
    rgb[c] = (float)(texgrid[iv][iu][c] * (1-fu) * (1-fv)
             + texgrid[iv][iu+1][c] * fu * (1-fv)
             + texgrid[iv+1][iu][c] * (1-fu) * fv
             + texgrid[iv+1][iu+1][c] * fu * fv);
  }
}

static void build_scene(std::mt19937& rng) {
  std::uniform_real_distribution<double> U(30.0, 225.0);
  for (int i = 0; i <= TG; i++)
    for (int j = 0; j <= TG; j++)
      for (int c = 0; c < 3; c++) texgrid[i][j][c] = (float)U(rng);

  double f = IMG * 1.2;
  for (int ci = 0; ci < NCAM; ci++) {
    double a = (-27.5 + 55.0 * ci / (NCAM - 1)) * M_PI / 180.0;
    Vec3 eye = {3.5 * std::sin(a), 0.4 * std::sin(2.3 * a),
                -3.5 * std::cos(a)};
    // lookat rotation rows (right, down, fwd)
    Vec3 fwd = norm3(mul(eye, -1.0));
    Vec3 up = {0, 1, 0};
    Vec3 right = norm3(cross(fwd, up));
    Vec3 down = cross(fwd, right);
    double R[3][3] = {{right.x, right.y, right.z},
                      {down.x, down.y, down.z},
                      {fwd.x, fwd.y, fwd.z}};
    // K [R | -RC] with principal point at the image center
    double Rt[3][4];
    for (int r = 0; r < 3; r++) {
      for (int c = 0; c < 3; c++) Rt[r][c] = R[r][c];
      Rt[r][3] = -(R[r][0]*eye.x + R[r][1]*eye.y + R[r][2]*eye.z);
    }
    double Km[3][3] = {{f, 0, IMG/2.0}, {0, f, IMG/2.0}, {0, 0, 1}};
    for (int r = 0; r < 3; r++)
      for (int c = 0; c < 4; c++) {
        cams[ci].P[0][r][c] = Km[r][0]*Rt[0][c] + Km[r][1]*Rt[1][c]
                            + Km[r][2]*Rt[2][c];
      }
    for (int lv = 1; lv < LEVELS; lv++)
      for (int r = 0; r < 3; r++)
        for (int c = 0; c < 4; c++)
          cams[ci].P[lv][r][c] = cams[ci].P[lv-1][r][c] / (r < 2 ? 2.0 : 1.0);
    cams[ci].center = eye;
    cams[ci].fsum = 2.0 * f;
    cams[ci].zaxis = fwd;
    cams[ci].xaxis = {cams[ci].P[0][0][0], cams[ci].P[0][0][1],
                      cams[ci].P[0][0][2]};
    Vec3 y = norm3(cross(cams[ci].zaxis, cams[ci].xaxis));
    cams[ci].yaxis = y;
    cams[ci].xaxis = norm3(cross(y, cams[ci].zaxis));

    // render level 0 by plane intersection, then 2x2-mean pyramid
    imgs[ci].w[0] = IMG; imgs[ci].h[0] = IMG;
    imgs[ci].lv[0].resize(IMG * IMG * 3);
    for (int py = 0; py < IMG; py++)
      for (int px = 0; px < IMG; px++) {
        double dc[3] = {(px - IMG/2.0)/f, (py - IMG/2.0)/f, 1.0};
        Vec3 dw = {R[0][0]*dc[0] + R[1][0]*dc[1] + R[2][0]*dc[2],
                   R[0][1]*dc[0] + R[1][1]*dc[1] + R[2][1]*dc[2],
                   R[0][2]*dc[0] + R[1][2]*dc[1] + R[2][2]*dc[2]};
        double t = -eye.z / dw.z;
        float rgb[3] = {8, 8, 8};
        if (t > 0) {
          double wx = eye.x + t * dw.x, wy = eye.y + t * dw.y;
          if (std::fabs(wx) <= 1 && std::fabs(wy) <= 1) tex_at(wx, wy, rgb);
        }
        for (int c = 0; c < 3; c++)
          imgs[ci].lv[0][(py * IMG + px) * 3 + c] = rgb[c];
      }
    for (int lv = 1; lv < LEVELS; lv++) {
      int w = imgs[ci].w[lv-1] / 2, h = imgs[ci].h[lv-1] / 2;
      imgs[ci].w[lv] = w; imgs[ci].h[lv] = h;
      imgs[ci].lv[lv].resize(w * h * 3);
      for (int py = 0; py < h; py++)
        for (int px = 0; px < w; px++)
          for (int c = 0; c < 3; c++) {
            const std::vector<float>& up_ = imgs[ci].lv[lv-1];
            int W = imgs[ci].w[lv-1];
            imgs[ci].lv[lv][(py*w+px)*3+c] = 0.25f *
              (up_[((2*py)*W + 2*px)*3+c] + up_[((2*py)*W + 2*px+1)*3+c]
               + up_[((2*py+1)*W + 2*px)*3+c] + up_[((2*py+1)*W+2*px+1)*3+c]);
          }
    }
  }
}

// bilinear fetch (Image.h:89-115)
static inline void fetch(const Image& im, int lv, double x, double y,
                         float* rgb) {
  int lx = (int)x, ly = (int)y;
  double dx1 = x - lx, dy1 = y - ly;
  double f00 = (1-dx1)*(1-dy1), f01 = (1-dx1)*dy1;
  double f10 = dx1*(1-dy1), f11 = dx1*dy1;
  const float* p0 = &im.lv[lv][(ly * im.w[lv] + lx) * 3];
  const float* p1 = p0 + im.w[lv] * 3;
  for (int c = 0; c < 3; c++)
    rgb[c] = (float)(p0[c]*f00 + p1[c]*f01 + p0[3+c]*f10 + p1[3+c]*f11);
}

struct PatchCtx {
  Vec3 ref_center, ref_ray;    // setOptimizationFields (:384-399)
  Vec3 ax, ay, az;             // ref camera axes
  double scale;
  int views[K];
  int nviews;
  long evals;
};

// sampleTexture + normalize (PatchOptimizer.cpp:476-529, Patch2d.hpp:46-84)
static bool sample_tex(const PatchCtx& pc, Vec3 center, Vec3 normal,
                       int cam_idx, float* out) {
  const Camera& cam = cams[cam_idx];
  const Image& im = imgs[cam_idx];
  Vec3 ray = norm3(sub(cam.center, center));
  Vec3 z = norm3(normal);
  if (dot(ray, z) < 0.5) return false;  // cos(60 deg)
  // patch axes (calculatePatchAxis :532-548) from the *ref* camera are
  // passed in via pc; per-view level selection (getLeveli)
  double fz = std::sqrt(dot(sub(center, cam.center), sub(center, cam.center)));
  double lvf = std::log2(pc.scale * cam.fsum / (2.0 * fz));
  int lv = (int)std::lround(lvf);
  lv = lv < 0 ? 0 : (lv > (int)MAXLEVEL - 1 ? (int)MAXLEVEL - 1 : lv);

  Vec3 y0 = norm3(cross(z, pc.ax));
  Vec3 x0 = norm3(cross(y0, z));
  Vec3 xs = mul(x0, pc.scale);
  Vec3 ys = mul(y0, pc.scale);
  ys = mul(ys, dot(y0, pc.ay));

  auto proj = [&](Vec3 p, double* uv) {
    const double (*P)[4] = cam.P[lv];
    double u = P[0][0]*p.x + P[0][1]*p.y + P[0][2]*p.z + P[0][3];
    double v = P[1][0]*p.x + P[1][1]*p.y + P[1][2]*p.z + P[1][3];
    double w = P[2][0]*p.x + P[2][1]*p.y + P[2][2]*p.z + P[2][3];
    uv[0] = u / w; uv[1] = v / w;
    return w > 0;
  };
  double c2[2], dx[2], dy[2], t[2];
  if (!proj(center, c2)) return false;
  proj(add(center, xs), dx); dx[0] -= c2[0]; dx[1] -= c2[1];
  proj(add(center, ys), dy); dy[0] -= c2[0]; dy[1] -= c2[1];
  double half = PS / 2.0;
  double mnx = 1e30, mny = 1e30, mxx = -1e30, mxy = -1e30;
  for (int sx = -1; sx <= 1; sx += 2)
    for (int sy = -1; sy <= 1; sy += 2) {
      double px = c2[0] + sx*half*dx[0] + sy*half*dy[0];
      double py = c2[1] + sx*half*dx[1] + sy*half*dy[1];
      mnx = std::min(mnx, px); mxx = std::max(mxx, px);
      mny = std::min(mny, py); mxy = std::max(mxy, py);
    }
  if (mnx < 3 || mny < 3 || mxx >= im.w[lv]-3 || mxy >= im.h[lv]-3)
    return false;
  t[0] = c2[0] - half*dx[0] - half*dy[0];
  t[1] = c2[1] - half*dx[1] - half*dy[1];
  float* o = out;
  for (int yy = 0; yy < PS; yy++)
    for (int xx = 0; xx < PS; xx++) {
      fetch(im, lv, t[0] + xx*dx[0] + yy*dy[0],
            t[1] + xx*dx[1] + yy*dy[1], o);
      o += 3;
    }
  // normalize (Patch2d.hpp:46-84)
  double ave[3] = {0, 0, 0};
  for (int i = 0; i < PS*PS; i++)
    for (int c = 0; c < 3; c++) ave[c] += out[i*3+c];
  for (int c = 0; c < 3; c++) ave[c] /= PS*PS;
  double var = 0;
  for (int i = 0; i < PS*PS; i++)
    for (int c = 0; c < 3; c++) {
      double d = out[i*3+c] - ave[c]; var += d * d;
    }
  double stdv = std::sqrt(var / (PS*PS*3));
  if (stdv == 0) stdv = 1;
  for (int i = 0; i < PS*PS; i++)
    for (int c = 0; c < 3; c++)
      out[i*3+c] = (float)((out[i*3+c] - ave[c]) / stdv);
  return true;
}

static double ncc(const float* a, const float* b) {
  double s = 0;
  for (int i = 0; i < PS*PS*3; i++) s += a[i] * b[i];
  return s / (PS*PS*3);
}
static double robustincc(double x) { return x / (1.0 + 3.0 * x); }

// objective_fn via setCenterNorm (PatchOptimizer.cpp:286-320, 401-414)
static double objective(unsigned n, const double* x, double* grad, void* d) {
  (void)n; (void)grad;
  PatchCtx* pc = (PatchCtx*)d;
  pc->evals++;
  Vec3 center = add(pc->ref_center, mul(pc->ref_ray, x[0]));
  double angle_scale = M_PI / 48.0;
  double a1 = x[1] * angle_scale, a2 = x[2] * angle_scale;
  double fx = std::sin(a1)*std::cos(a2), fy = std::sin(a2);
  double fzc = -std::cos(a1)*std::cos(a2);
  Vec3 normal = add(add(mul(pc->ax, fx), mul(pc->ay, fy)), mul(pc->az, fzc));

  float ref_tex[PS*PS*3], tex[PS*PS*3];
  if (!sample_tex(*pc, center, normal, pc->views[0], ref_tex)) return 2.0;
  double val = 0; int cnt = 0;
  for (int i = 1; i < pc->nviews; i++) {
    if (!sample_tex(*pc, center, normal, pc->views[i], tex)) continue;
    val += robustincc(1.0 - ncc(ref_tex, tex));
    cnt++;
  }
  if (cnt < 2) return 2.0;  // MIN_IMAGES_PER_PATCH - 1
  return val / cnt;
}

int main(int argc, char** argv) {
  int B = argc > 1 ? atoi(argv[1]) : 512;
  std::mt19937 rng(0);
  build_scene(rng);

  // patches on the plane, like bench.py seeds (8 views each)
  std::uniform_real_distribution<double> U(-0.7, 0.7);
  std::normal_distribution<double> Nz(0.0, 0.002);
  std::vector<PatchCtx> patches(B);
  std::vector<Vec3> centers(B);
  double f = IMG * 1.2;
  for (int i = 0; i < B; i++) {
    centers[i] = {U(rng), U(rng), Nz(rng)};
    PatchCtx& pc = patches[i];
    pc.nviews = 0;
    for (int ci = 0; ci < NCAM && pc.nviews < K; ci++)
      pc.views[pc.nviews++] = (ci + i) % NCAM;
    int ref = pc.views[0];
    double fz = std::sqrt(dot(sub(centers[i], cams[ref].center),
                              sub(centers[i], cams[ref].center)));
    pc.scale = 2.0 * fz * 4.0 / (2.0 * f);  // START_LEVEL=2 footprint
    pc.ref_center = centers[i];
    pc.ref_ray = norm3(sub(centers[i], cams[ref].center));
    pc.ax = cams[ref].xaxis; pc.ay = cams[ref].yaxis; pc.az = cams[ref].zaxis;
    pc.evals = 0;
  }

  long total_evals = 0;
  int n_ok = 0;
  auto t0 = std::chrono::steady_clock::now();
#pragma omp parallel for schedule(dynamic) reduction(+:total_evals, n_ok)
  for (int i = 0; i < B; i++) {
    PatchCtx& pc = patches[i];

    // filterImagesNCC x3 + setRefImage K^2 pass (runOptimization's fixed
    // per-patch overhead, PatchOptimizer.cpp:48-76)
    float ref_tex[PS*PS*3], tex[PS*PS*3];
    Vec3 nrm = mul(pc.ref_ray, -1.0);
    for (int pass = 0; pass < 3; pass++)
      if (sample_tex(pc, pc.ref_center, nrm, pc.views[0], ref_tex))
        for (int v = 1; v < pc.nviews; v++)
          if (sample_tex(pc, pc.ref_center, nrm, pc.views[v], tex))
            (void)ncc(ref_tex, tex);
    for (int r = 0; r < pc.nviews; r++)
      if (sample_tex(pc, pc.ref_center, nrm, pc.views[r], ref_tex))
        for (int v = 0; v < pc.nviews; v++)
          if (v != r && sample_tex(pc, pc.ref_center, nrm, pc.views[v], tex))
            (void)robustincc(1.0 - ncc(ref_tex, tex));

    // the BOBYQA solve (PatchOptimizer.cpp:322-364)
    double x[3] = {0, 0, 0};
    double lb[3] = {-HUGE_VAL, -23.99999, -23.99999};
    double ub[3] = {HUGE_VAL, 23.99999, 23.99999};
    double dx_init[3] = {pc.scale, 1.0, 1.0};
    double minf = 0;
    nlopt_stopping stop;
    memset(&stop, 0, sizeof(stop));
    int forced = 0;
    double xtol_abs[3] = {0, 0, 0};
    stop.n = 3; stop.xtol_rel = 1e-7; stop.maxeval = 1000;
    stop.minf_max = -HUGE_VAL; stop.ftol_rel = 0; stop.ftol_abs = 0;
    stop.maxtime = 0; stop.force_stop = &forced;
    stop.xtol_abs = xtol_abs;
    nlopt_result r = bobyqa(3, 2*3+1, x, lb, ub, dx_init, &stop, &minf,
                            objective, &pc);
    if (r > 0) n_ok++;
    total_evals += pc.evals;
  }
  auto t1 = std::chrono::steady_clock::now();
  double dt = std::chrono::duration<double>(t1 - t0).count();
  int threads = 1;
#ifdef _OPENMP
  threads = omp_get_max_threads();
#endif
  printf("{\"patches_per_sec\": %.1f, \"patches\": %d, \"seconds\": %.2f, "
         "\"mean_bobyqa_evals\": %.1f, \"ok\": %d, \"threads\": %d}\n",
         B / dt, B, dt, (double)total_evals / B, n_ok, threads);
  return 0;
}
