// CPU FULL-LOOP baseline: the reference hpmvs algorithm end-to-end on this
// host's CPU, measured on the same on-disk NVM scenes the TPU pipeline runs
// (bench/export_scene.py). This extends bench/cpu_baseline.cpp (per-patch
// optimizer only) with the reference's complete runtime:
//
//   NVM load -> image pyramids -> covisibility -> seed patches + optimize
//   (Scene.cpp:42-208) -> pointer octree + >=100 subtree split
//   (main.cpp:50-96) -> OpenMP priority loop with the cell state machine
//   filter/extend/regularize/branch (CellProcessor.cpp:43-420) + border
//   queues (:487-540) -> per-level histogram + final PLY (main.cpp:144-202)
//
// Every function is a from-scratch transcription of the cited reference
// behavior (this file shares no code with the GPL reference); the BOBYQA
// optimizer is the reference's own vendored nlopt bobyqa.c, linked from
// /root/reference/thirdLibs/nlopt-2.4.2 (see build_fullloop.sh), with
// nlopt's default initial-step heuristic (nlopt api/options.c:686-727).
//
// Output: one JSON line with init/loop wall-clock, optimize-call count,
// final patch count, per-level cell histogram, plus patches-final.ply.

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <functional>
#include <limits>
#include <memory>
#include <mutex>
#include <queue>
#include <set>
#include <sstream>
#include <string>
#include <vector>
#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {
#include "bobyqa.h"
}

// ---------------------------------------------------------------- options
// (HpmvsOptions.h:29-58 defaults; HPMVS_* env overrides let the
// progressive head-to-head run the SAME non-default config as the TPU
// engine's stress scenes, bench/progressive_study.py)
static int env_int(const char* k, int d) {
  const char* v = getenv(k);
  return v ? atoi(v) : d;
}
static const int MAXLEVEL = env_int("HPMVS_MAXLEVEL", 5);
static const int MINLEVEL = 0;
static const int START_LEVEL = env_int("HPMVS_START_LEVEL", 4);
static const double MAX_ANGLE = 60.0 * M_PI / 180.0;
static const double MIN_ANGLE = 10.0 * M_PI / 180.0;
static const int PATCH_INIT_MAXLEVEL = env_int("HPMVS_PATCH_INIT_MAXLEVEL", 9);
static const int MAX_TREE_LEVEL = env_int("HPMVS_MAX_TREE_LEVEL", 20);
static const int PATCH_FINAL_MINLEVEL =
    env_int("HPMVS_PATCH_FINAL_MINLEVEL", 8);
static const int MAX_IMAGES_PER_PATCH = 6;
static const int MIN_IMAGES_PER_PATCH = 3;
static const double NCC_ALPHA_1 = 0.4;
static const double NCC_ALPHA_2 = 0.5;
static const double DEPTH_TEST_FACTOR = 1.0;
static const int COVIS_MIN = env_int("HPMVS_COVIS_MIN", 50);  // Scene.cpp:272
static const int DEPTH_SUBSAMPLE = 2;     // Scene.h:78
static const float MAX_DEPTH = 1000.0f;   // Scene.cpp:33
static const int PS = 7;                  // PatchTex (Patch2d.hpp:88)

// ---------------------------------------------------------------- vec3
struct V3 { double x, y, z; };
static V3 operator-(V3 a, V3 b) { return {a.x-b.x, a.y-b.y, a.z-b.z}; }
static V3 operator+(V3 a, V3 b) { return {a.x+b.x, a.y+b.y, a.z+b.z}; }
static V3 operator*(V3 a, double s) { return {a.x*s, a.y*s, a.z*s}; }
static double dot(V3 a, V3 b) { return a.x*b.x + a.y*b.y + a.z*b.z; }
static V3 cross(V3 a, V3 b) {
  return {a.y*b.z - a.z*b.y, a.z*b.x - a.x*b.z, a.x*b.y - a.y*b.x};
}
static double norm(V3 a) { return std::sqrt(dot(a, a)); }
static V3 unit(V3 a) { double n = norm(a); return {a.x/n, a.y/n, a.z/n}; }

// ---------------------------------------------------------------- NVM
struct NvmCam { std::string file; double f, q[4], c[3], r; };
struct NvmMeas { int img, feat; double x, y; };
struct NvmPt { double xyz[3]; double rgb[3]; std::vector<NvmMeas> meas; };

static bool read_nvm(const std::string& path, std::vector<NvmCam>& cams,
                     std::vector<NvmPt>& pts) {
  std::ifstream fh(path);
  if (!fh) return false;
  std::string tag; fh >> tag;
  if (tag != "NVM_V3") return false;
  int ncam = 0; fh >> ncam;
  cams.resize(ncam);
  for (int i = 0; i < ncam; i++) {
    NvmCam& c = cams[i];
    int zero;
    fh >> c.file >> c.f >> c.q[0] >> c.q[1] >> c.q[2] >> c.q[3]
       >> c.c[0] >> c.c[1] >> c.c[2] >> c.r >> zero;
  }
  int npt = 0; fh >> npt;
  pts.resize(npt);
  for (int i = 0; i < npt; i++) {
    NvmPt& p = pts[i];
    int nm = 0;
    fh >> p.xyz[0] >> p.xyz[1] >> p.xyz[2]
       >> p.rgb[0] >> p.rgb[1] >> p.rgb[2] >> nm;
    p.meas.resize(nm);
    for (int j = 0; j < nm; j++)
      fh >> p.meas[j].img >> p.meas[j].feat >> p.meas[j].x >> p.meas[j].y;
  }
  return true;
}

// ---------------------------------------------------------------- camera
// (Camera.cpp:34-99: K[R|t] from quaternion+center, rows 0,1 halved per
// level; scale/level formulas)
struct Camera {
  std::vector<std::array<std::array<double,4>,3>> P;  // per level
  V3 center, xaxis, yaxis, zaxis;
  double fsum;
  int levels() const { return (int)P.size(); }

  void init(const NvmCam& cam, int width, int height, int maxLevel) {
    double w = cam.q[0], x = cam.q[1], y = cam.q[2], z = cam.q[3];
    double R[3][3] = {
      {1-2*(y*y+z*z), 2*(x*y-z*w),   2*(x*z+y*w)},
      {2*(x*y+z*w),   1-2*(x*x+z*z), 2*(y*z-x*w)},
      {2*(x*z-y*w),   2*(y*z+x*w),   1-2*(x*x+y*y)}};
    double K[3][3] = {{cam.f, 0, width/2.0}, {0, cam.f, height/2.0},
                      {0, 0, 1}};
    double Rt[3][4];
    for (int r = 0; r < 3; r++) {
      for (int c2 = 0; c2 < 3; c2++) Rt[r][c2] = R[r][c2];
      Rt[r][3] = -(R[r][0]*cam.c[0] + R[r][1]*cam.c[1] + R[r][2]*cam.c[2]);
    }
    P.resize(maxLevel + 1);
    for (int r = 0; r < 3; r++)
      for (int c2 = 0; c2 < 4; c2++)
        P[0][r][c2] = K[r][0]*Rt[0][c2] + K[r][1]*Rt[1][c2]
                    + K[r][2]*Rt[2][c2];
    for (int lv = 1; lv <= maxLevel; lv++)
      for (int r = 0; r < 3; r++)
        for (int c2 = 0; c2 < 4; c2++)
          P[lv][r][c2] = P[lv-1][r][c2] / (r < 2 ? 2.0 : 1.0);
    center = {cam.c[0], cam.c[1], cam.c[2]};
    fsum = 2.0 * cam.f;
    // axes (Camera.cpp:70-77): z from P row 2, x from P row 0,
    // y = (z x x).unit, x = (y x z).unit
    zaxis = unit(V3{P[0][2][0], P[0][2][1], P[0][2][2]});
    V3 xr = {P[0][0][0], P[0][0][1], P[0][0][2]};
    yaxis = unit(cross(zaxis, xr));
    xaxis = unit(cross(yaxis, zaxis));
  }
  // mult: raw P*[p;1] (Camera.h:76-78)
  V3 mult(V3 p, int lv) const {
    const auto& M = P[lv];
    return {M[0][0]*p.x + M[0][1]*p.y + M[0][2]*p.z + M[0][3],
            M[1][0]*p.x + M[1][1]*p.y + M[1][2]*p.z + M[1][3],
            M[2][0]*p.x + M[2][1]*p.y + M[2][2]*p.z + M[2][3]};
  }
  // project: divide, behind-camera flagged (Camera.h:45-62)
  bool project(V3 p, int lv, double* uv) const {
    V3 h = mult(p, lv);
    if (h.z <= 0) { uv[0] = -0xffff; uv[1] = -0xffff; return false; }
    uv[0] = h.x / h.z; uv[1] = h.y / h.z;
    return true;
  }
  double getScale(V3 p, int level) const {   // Camera.cpp:83-90
    double fz = norm(p - center);
    return 2.0 * fz * (double)(1 << level) / fsum;
  }
  double getLevel(V3 p, double scale) const {  // Camera.cpp:92-95
    double fz = norm(p - center);
    return std::log2(scale * fsum / (2.0 * fz));
  }
  int getLeveli(V3 p, double scale, int maxLevel) const {  // :97-99
    int lv = (int)std::lround(getLevel(p, scale));
    return std::max(0, std::min(maxLevel, lv));
  }
};

// ---------------------------------------------------------------- image
// pyramid of uint8 RGB; bilinear fetch (Image.h:89-115); 2x2-mean half
// resize (the CImg get_resize_halfXY equivalent, Image.cpp:56-57, matching
// hpmvs_tpu/image/pyramid.build_pyramid's uint8 rounding)
struct Img {
  std::vector<std::vector<unsigned char>> lv;
  std::vector<int> w, h;
  bool load_hpi(const std::string& path, int maxLevel) {
    std::ifstream fh(path, std::ios::binary);
    if (!fh) return false;
    char magic[4]; fh.read(magic, 4);
    if (std::memcmp(magic, "HPI1", 4) != 0) return false;
    int W = 0, H = 0;
    fh.read((char*)&W, 4); fh.read((char*)&H, 4);
    lv.resize(maxLevel + 1); w.resize(maxLevel + 1); h.resize(maxLevel + 1);
    lv[0].resize((size_t)W * H * 3); w[0] = W; h[0] = H;
    fh.read((char*)lv[0].data(), (std::streamsize)lv[0].size());
    for (int l = 1; l <= maxLevel; l++) {
      int w2 = std::max(1, w[l-1] / 2), h2 = std::max(1, h[l-1] / 2);
      w[l] = w2; h[l] = h2;
      lv[l].resize((size_t)w2 * h2 * 3);
      const auto& up = lv[l-1];
      int W1 = w[l-1];
      for (int y = 0; y < h2; y++)
        for (int x = 0; x < w2; x++)
          for (int c = 0; c < 3; c++) {
            int s = (up[((2*y)*W1 + 2*x)*3 + c] + up[((2*y)*W1+2*x+1)*3 + c]
                   + up[((2*y+1)*W1+2*x)*3 + c] + up[((2*y+1)*W1+2*x+1)*3+c]);
            lv[l][((size_t)y*w2 + x)*3 + c] =
                (unsigned char)std::min(255, (s + 2) / 4);
          }
    }
    return true;
  }
  void color(double x, double y, int level, float* rgb) const {
    int lx = (int)x, ly = (int)y;
    double dx1 = x - lx, dy1 = y - ly;
    double f00 = (1-dx1)*(1-dy1), f01 = (1-dx1)*dy1;
    double f10 = dx1*(1-dy1), f11 = dx1*dy1;
    const unsigned char* p0 = &lv[level][((size_t)ly * w[level] + lx) * 3];
    const unsigned char* p1 = p0 + (size_t)w[level] * 3;
    for (int c = 0; c < 3; c++)
      rgb[c] = (float)(p0[c]*f00 + p1[c]*f01 + p0[3+c]*f10 + p1[3+c]*f11);
  }
};

// ---------------------------------------------------------------- patch
struct Patch {
  V3 center, normal;
  double scale = 0;
  std::vector<int> images;   // [0] = reference
  float flatness = -1.0f;
  int prioRed = 0;
  bool expanded = false;
  float color[3] = {0, 0, 0};
};
typedef std::shared_ptr<Patch> PPatch;

// ---------------------------------------------------------------- octree
// pointer octree with the reference semantics (doctree.h:122-523):
// Branch always has 8 children; at() walks by sign; add(e,width) splits
// until leaf.width/2 <= width; addConditional requires empty & not finer;
// remove collapses empty branches; nodeLevel = log2(rootW/cellW)+rootLevel.
struct OctCell {
  bool isLeaf;
  OctCell* parent;
  int parentIdx;
  V3 c;
  double width;
  std::vector<PPatch> data;   // leaf payload
  OctCell* children[8] = {nullptr,nullptr,nullptr,nullptr,
                          nullptr,nullptr,nullptr,nullptr};
  OctCell(V3 cc, double w, bool leaf, OctCell* par, int idx)
      : isLeaf(leaf), parent(par), parentIdx(idx), c(cc), width(w) {}
  ~OctCell() { for (auto* ch : children) delete ch; }
  bool contains(V3 p) const {   // cell AABB (doctree.cpp:28-42)
    double hw = width / 2.0;
    return p.x >= c.x-hw && p.x <= c.x+hw && p.y >= c.y-hw && p.y <= c.y+hw
        && p.z >= c.z-hw && p.z <= c.z+hw;
  }
  // child octant center offsets: idx bit0=x, bit1=y, bit2=z (doctree.h at():
  // idx = (z>cz)<<2 | (y>cy)<<1 | (x>cx))
  void makeChildren(bool leaves) {
    double q = width / 4.0;
    for (int i = 0; i < 8; i++) {
      V3 cc = {c.x + ((i & 1) ? q : -q), c.y + ((i & 2) ? q : -q),
               c.z + ((i & 4) ? q : -q)};
      children[i] = new OctCell(cc, width / 2.0, leaves, this, i);
    }
  }
  OctCell* at(V3 p) {   // deepest leaf containing p (doctree.h:250-255)
    OctCell* cur = this;
    while (!cur->isLeaf) {
      int idx = ((p.z > cur->c.z) << 2) | ((p.y > cur->c.y) << 1)
              | (p.x > cur->c.x);
      cur = cur->children[idx];
    }
    return cur;
  }
  // split a leaf into a branch of 8 leaves; existing data is handed back
  // to the caller for re-insertion (Leaf::split semantics)
  OctCell* split(std::vector<PPatch>& out) {
    out.swap(data);
    isLeaf = false;
    makeChildren(true);
    return this;
  }
  size_t nrLeafs() const {   // nonempty leaves (doctree.h:236-247)
    if (isLeaf) return data.empty() ? 0 : 1;
    size_t n = 0;
    for (auto* ch : children) n += ch->nrLeafs();
    return n;
  }
  void collect(std::vector<OctCell*>& out) {
    if (isLeaf) { if (!data.empty()) out.push_back(this); return; }
    for (auto* ch : children) ch->collect(out);
  }
};

struct OctTree {
  OctCell* root;
  int rootLevel;
  OctTree(OctCell* r, int rl) : root(r), rootLevel(rl) {}
  int nodeLevel(const OctCell* n) const {   // doctree.h:459-462
    return (int)std::log2(root->width / n->width) + rootLevel;
  }
  // add with target width: split down until leaf.width/2 <= width,
  // re-inserting any buffered occupants (doctree.h:378-394)
  OctCell* add(PPatch e, double width) {
    OctCell* leaf = root->at(e->center);
    std::vector<PPatch> buf;
    while (leaf->width / 2.0 > width) {
      OctCell* br = leaf->split(buf);
      for (auto& b : buf) br->at(b->center)->data.push_back(b);
      buf.clear();
      leaf = br->at(e->center);
    }
    leaf->data.push_back(e);
    return leaf;
  }
  // addConditional: only into an empty leaf not finer than width
  // (doctree.h:396-419)
  bool addConditional(PPatch e, double width, OctCell** out) {
    OctCell* leaf = root->at(e->center);
    if (!leaf->data.empty() || leaf->width < width) { *out = leaf; return false; }
    std::vector<PPatch> buf;
    while (leaf->width / 2.0 > width) {
      OctCell* br = leaf->split(buf);   // buf stays empty (leaf was empty)
      leaf = br->at(e->center);
    }
    leaf->data.push_back(e);
    *out = leaf;
    return true;
  }
  // remove: clear the leaf; collapse now-empty parent branches
  // (doctree.h:421-450). The pointer-octree "collapse" replaces an empty
  // branch by a leaf; we keep the branch (empty leaves cost nothing here
  // and subtree views stay valid) -- occupancy semantics are identical.
  void remove(OctCell* leaf) { leaf->data.clear(); }
};

// ---------------------------------------------------------------- scene
struct Scene {
  std::vector<Camera> cams;
  std::vector<Img> imgs;
  std::vector<std::vector<int>> covis;
  // depth pyramid per (img, level), subsampled by 2 (Scene.cpp:74-81)
  std::vector<std::vector<std::vector<float>>> depths;
  std::vector<std::vector<int>> dw, dh;
  std::vector<std::vector<std::unique_ptr<std::mutex>>> dmtx;

  void initDepths() {
    size_t n = cams.size();
    depths.resize(n); dw.resize(n); dh.resize(n); dmtx.resize(n);
    for (size_t i = 0; i < n; i++) {
      int L = cams[i].levels();
      depths[i].resize(L); dw[i].resize(L); dh[i].resize(L);
      for (int l = 0; l < L; l++) {
        dw[i][l] = imgs[i].w[l] / DEPTH_SUBSAMPLE;
        dh[i][l] = imgs[i].h[l] / DEPTH_SUBSAMPLE;
        depths[i][l].assign((size_t)dw[i][l] * dh[i][l], MAX_DEPTH);
        dmtx[i].emplace_back(new std::mutex);
      }
    }
  }
  // Scene::setDepths (Scene.cpp:350-381)
  void setDepths(const Patch& p, bool subtract) {
    for (int idx : p.images) {
      int level = cams[idx].getLeveli(p.center, p.scale,
                                      cams[idx].levels() - 1);
      V3 h = cams[idx].mult(p.center, level);
      int x = (int)(h.x / h.z + 0.5) / DEPTH_SUBSAMPLE;
      int y = (int)(h.y / h.z + 0.5) / DEPTH_SUBSAMPLE;
      float d = (float)h.z;
      if (x < 0 || x >= dw[idx][level] || y < 0 || y >= dh[idx][level])
        continue;
      std::lock_guard<std::mutex> lock(*dmtx[idx][level]);
      float& cell = depths[idx][level][(size_t)y * dw[idx][level] + x];
      if (cell == d && subtract) cell = MAX_DEPTH;
      else if (!subtract && d < cell) cell = d;
    }
  }
  float depthAtLevel(int img, int xx, int yy, int level) const {
    int x = xx / DEPTH_SUBSAMPLE, y = yy / DEPTH_SUBSAMPLE;
    if (x < 0 || x >= dw[img][level] || y < 0 || y >= dh[img][level])
      return MAX_DEPTH;
    return depths[img][level][(size_t)y * dw[img][level] + x];
  }
  // min over the pyramid (Scene.cpp:406-431; unlocked read like :565)
  float fullDepth(int img, int xx, int yy) const {
    float d = MAX_DEPTH;
    int x = xx / DEPTH_SUBSAMPLE, y = yy / DEPTH_SUBSAMPLE;
    for (int l = 0; l < cams[img].levels(); l++) {
      if (x < 0 || x >= dw[img][l] || y < 0 || y >= dh[img][l]) return d;
      d = std::min(d, depths[img][l][(size_t)y * dw[img][l] + x]);
      x /= 2; y /= 2;
    }
    return d;
  }
  // inner depth test (Scene.cpp:558-582)
  bool depthTest1(const Patch& p, int ix, int iy, float depth, int img,
                  double margin, bool viewBlock) const {
    if (depth < 0 || ix < 0 || ix >= imgs[img].w[0] || iy < 0
        || iy >= imgs[img].h[0])
      return false;
    float imgDepth = fullDepth(img, ix, iy);
    if (imgDepth >= MAX_DEPTH) return !viewBlock;
    V3 ray = unit(p.center - cams[img].center);
    double diff = imgDepth - depth;
    double factor = std::min(2.0, 2.0 + dot(ray, p.normal));
    if (!viewBlock)
      return std::fabs(diff) < p.scale * margin * factor * 2.0;
    return diff > p.scale * margin * factor * 2.0;
  }
  // 3x3 neighborhood at level 0 (Scene.cpp:534-556)
  bool depthTest(const Patch& p, int img, double margin, bool viewBlock) const {
    V3 h = cams[img].mult(p.center, 0);
    int ix = (int)(h.x / h.z + 0.5), iy = (int)(h.y / h.z + 0.5);
    ix--; iy--;
    for (int yy = 0; yy < 3; yy++)
      for (int xx = 0; xx < 3; xx++)
        if (!depthTest1(p, ix + xx, iy + yy, (float)h.z, img, margin,
                        viewBlock))
          return false;
    return true;
  }
  int depthTests(const Patch& p, double margin) const {  // :518-524
    int n = 0;
    for (int img : p.images) if (depthTest(p, img, margin, false)) n++;
    return n;
  }
  int viewBlockTest(const Patch& p, double margin) const {  // :610-644
    int n = 0;
    for (size_t img = 0; img < imgs.size(); img++) {
      int level = (int)std::lround(cams[img].getLevel(p.center, p.scale));
      if (level < 0 || level > cams[img].levels() - 1) continue;
      double uv[2];
      cams[img].project(p.center, level, uv);
      if (uv[0] < 0 || uv[0] > imgs[img].w[level] || uv[1] < 0
          || uv[1] > imgs[img].h[level])
        continue;
      if (depthTest(p, (int)img, margin, true)) n++;
    }
    return n;
  }
  bool pixelFreeTest(const Patch& p, int img) const {  // :592-608
    int level = (int)std::lround(cams[img].getLevel(p.center, p.scale));
    if (level < 0 || level >= cams[img].levels()) return false;
    double uv[2];
    cams[img].project(p.center, level, uv);
    int ix = (int)(uv[0] + 0.5), iy = (int)(uv[1] + 0.5);
    if (ix < 0 || ix >= imgs[img].w[level] || iy < 0
        || iy >= imgs[img].h[level])
      return false;
    return depthAtLevel(img, ix, iy, level) == MAX_DEPTH;
  }
  int pixelFreeTests(const Patch& p) const {
    int n = 0;
    for (int img : p.images) if (pixelFreeTest(p, img)) n++;
    return n;
  }
  int levelSupport(const Patch& p, int minLevel) const {  // :335-344
    int n = 0;
    for (int img : p.images)
      if (std::lround(cams[img].getLevel(p.center, p.scale)) > minLevel) n++;
    return n;
  }
  // median-by-norm patch color w/ white-pixel case (Scene.cpp:300-327)
  void patchColor(Patch& p) const {
    std::vector<std::array<float,3>> colors;
    for (int img : p.images) {
      int level = cams[img].getLeveli(p.center, p.scale,
                                      cams[img].levels() - 1);
      double uv[2];
      cams[img].project(p.center, level, uv);
      std::array<float,3> c{};
      // clamp inside for the raw bilinear fetch (the reference reads
      // unchecked; our synthetic patches project in-bounds anyway)
      double x = std::max(0.0, std::min((double)imgs[img].w[level] - 2, uv[0]));
      double y = std::max(0.0, std::min((double)imgs[img].h[level] - 2, uv[1]));
      imgs[img].color(x, y, level, c.data());
      colors.push_back(c);
    }
    if (colors.empty()) return;
    auto nrm = [](const std::array<float,3>& c) {
      return std::sqrt(c[0]*c[0] + c[1]*c[1] + c[2]*c[2]); };
    std::sort(colors.begin(), colors.end(),
              [&](const std::array<float,3>& a, const std::array<float,3>& b)
              { return nrm(a) < nrm(b); });
    const auto& med = colors[colors.size() / 2];
    const auto& pick = (nrm(med) > 250.0) ? colors.front() : med;
    p.color[0] = pick[0]; p.color[1] = pick[1]; p.color[2] = pick[2];
  }
};

// ---------------------------------------------------------------- optimizer
// full view-selection + BOBYQA pipeline (PatchOptimizer.cpp:48-548)
struct Optimizer {
  const Scene* sc;
  // working patch fields
  V3 pCenter, pNormal;
  double pScale;
  std::vector<int> pImages;
  // optimization frame
  V3 refCenter, refRay, ax, ay, az;
  float refTex[PS*PS*3], comTex[PS*PS*3];
  V3 pXaxis, pYaxis, pZaxis;
  long evals = 0;
  long optimizeCalls = 0;

  static double robustincc(double x) { return x / (1.0 + 3.0 * x); }
  static double ncc(const float* a, const float* b) {
    double s = 0;
    for (int i = 0; i < PS*PS*3; i++) s += a[i] * b[i];
    return s / (PS*PS*3);
  }

  // calculatePatchAxis (PatchOptimizer.cpp:532-548)
  void patchAxis(int refIdx, V3 c, V3 n, double scale) {
    const Camera& rc = sc->cams[refIdx];
    V3 z = unit(n);
    V3 y = unit(cross(z, rc.xaxis));
    V3 x = unit(cross(y, z));
    x = x * scale;
    y = y * scale;
    y = y * dot(unit(y), unit(rc.yaxis));
    pXaxis = x; pYaxis = y; pZaxis = z;
  }

  // sampleTexture + normalize (PatchOptimizer.cpp:476-529, Patch2d.hpp:46-84)
  bool sampleTex(V3 center, V3 zaxis, int cam, float* out) const {
    const Camera& C = sc->cams[cam];
    const Img& I = sc->imgs[cam];
    if (dot(unit(C.center - center), zaxis) < std::cos(MAX_ANGLE))
      return false;
    int lv = C.getLeveli(center, pScale, MAXLEVEL - 1);
    double c2[2], dx[2], dy[2];
    if (!C.project(center, lv, c2)) return false;
    double t1[2], t2[2];
    if (!C.project(center + pXaxis, lv, t1)) return false;
    if (!C.project(center + pYaxis, lv, t2)) return false;
    dx[0] = t1[0] - c2[0]; dx[1] = t1[1] - c2[1];
    dy[0] = t2[0] - c2[0]; dy[1] = t2[1] - c2[1];
    double half = PS / 2.0;
    double mnx = 1e30, mny = 1e30, mxx = -1e30, mxy = -1e30;
    for (int sx = -1; sx <= 1; sx += 2)
      for (int sy = -1; sy <= 1; sy += 2) {
        double px = c2[0] + sx*half*dx[0] + sy*half*dy[0];
        double py = c2[1] + sx*half*dx[1] + sy*half*dy[1];
        mnx = std::min(mnx, px); mxx = std::max(mxx, px);
        mny = std::min(mny, py); mxy = std::max(mxy, py);
      }
    const int m = 3;   // safety margin (:503)
    if (mnx < m || mny < m || mxx >= I.w[lv] - m || mxy >= I.h[lv] - m)
      return false;
    double l0[2] = {c2[0] - half*dx[0] - half*dy[0],
                    c2[1] - half*dx[1] - half*dy[1]};
    float* o = out;
    for (int yy = 0; yy < PS; yy++) {
      double cx = l0[0] + yy*dy[0], cy = l0[1] + yy*dy[1];
      for (int xx = 0; xx < PS; xx++) {
        I.color(cx, cy, lv, o);
        o += 3;
        cx += dx[0]; cy += dx[1];
      }
    }
    // normalize: per-channel mean, global std (Patch2d.hpp:46-84)
    double ave[3] = {0,0,0};
    for (int i = 0; i < PS*PS; i++)
      for (int c = 0; c < 3; c++) ave[c] += out[i*3+c];
    for (int c = 0; c < 3; c++) ave[c] /= PS*PS;
    double var = 0;
    for (int i = 0; i < PS*PS; i++)
      for (int c = 0; c < 3; c++) {
        double d = out[i*3+c] - ave[c]; var += d*d;
      }
    double stdv = std::sqrt(var / (PS*PS*3));
    if (stdv == 0) stdv = 1;
    for (int i = 0; i < PS*PS; i++)
      for (int c = 0; c < 3; c++)
        out[i*3+c] = (float)((out[i*3+c] - ave[c]) / stdv);
    return true;
  }

  // setINCCs (PatchOptimizer.cpp:448-474)
  void setINCCs(std::vector<double>& inccs, const std::vector<int>& idx,
                int refIdx, bool robust) {
    inccs.assign(idx.size(), 2.0);
    patchAxis(idx[refIdx], pCenter, pNormal, pScale);
    // reference passes pNormal as the zaxis here (:456)
    if (!sampleTex(pCenter, pNormal, idx[refIdx], refTex)) return;
    for (size_t i = 0; i < idx.size(); i++) {
      if ((int)i == refIdx) inccs[i] = 0.0;
      else if (!sampleTex(pCenter, pNormal, idx[i], comTex)) inccs[i] = 2.0;
      else if (robust) inccs[i] = robustincc(1.0 - ncc(refTex, comTex));
      else inccs[i] = 1.0 - ncc(refTex, comTex);
    }
  }

  // addImages: covisibility growth with angle/level/in-bounds gates
  // (PatchOptimizer.cpp:225-258)
  bool addImages() {
    if (pImages.empty()) return false;
    int ref = pImages[0];
    std::set<int> have(pImages.begin(), pImages.end());
    for (int cv : sc->covis[ref]) {
      if (have.count(cv)) continue;
      if (dot(unit(sc->cams[cv].center - pCenter), pNormal)
          < std::cos(MAX_ANGLE))
        continue;
      int lv = (int)std::lround(sc->cams[cv].getLevel(pCenter, pScale));
      if (lv < MINLEVEL || lv >= MAXLEVEL - 2) continue;
      double uv[2];
      sc->cams[cv].project(pCenter, lv, uv);
      if (uv[0] < 0 || uv[0] >= sc->imgs[cv].w[lv] - 1 || uv[1] < 0
          || uv[1] >= sc->imgs[cv].h[lv] - 1)
        continue;
      pImages.push_back(cv);
    }
    return (int)pImages.size() >= MIN_IMAGES_PER_PATCH;
  }

  bool filterImagesNCC(double thr) {   // :138-152
    std::vector<double> inccs;
    setINCCs(inccs, pImages, 0, false);
    std::vector<int> keep;
    keep.push_back(pImages[0]);
    for (size_t i = 1; i < pImages.size(); i++)
      if (inccs[i] < 1.0 - thr) keep.push_back(pImages[i]);
    pImages.swap(keep);
    return (int)pImages.size() >= MIN_IMAGES_PER_PATCH;
  }

  bool filterImagesByAngle() {   // :125-136
    std::vector<int> keep;
    for (int img : pImages)
      if (dot(unit(sc->cams[img].center - pCenter), pNormal)
          > std::cos(MAX_ANGLE))
        keep.push_back(img);
    pImages.swap(keep);
    return (int)pImages.size() >= MIN_IMAGES_PER_PATCH;
  }

  bool assureImageAngles() {   // :105-123
    std::vector<V3> rays;
    for (int img : pImages) rays.push_back(unit(sc->cams[img].center - pCenter));
    int n = (int)pImages.size();
    for (int i = 0; i < n - 1; i++)
      for (int j = i + 1; j < n; j++) {
        double a = std::acos(std::max(-1.0, std::min(1.0, dot(rays[i], rays[j]))));
        if (a < MAX_ANGLE && a > MIN_ANGLE) return true;
      }
    return false;
  }

  // angle-weighted-scale greedy sort with 5-degree suppression (:183-223
  // + getAngleWeightedScales :260-284)
  bool sortImages() {
    const double threshold = 1.0 - std::cos(10.0 * M_PI / 180.0);
    std::vector<int> idx;
    std::vector<double> wsc;
    std::vector<V3> rays;
    if (pImages.empty()) return false;
    int refLevel = std::max(0, std::min(MAXLEVEL - 1,
        (int)std::lround(sc->cams[pImages[0]].getLevel(pCenter, pScale))));
    for (int img : pImages) {
      V3 ray = unit(sc->cams[img].center - pCenter);
      double cosa = dot(ray, unit(pNormal));
      if (cosa > 0) {
        idx.push_back(img);
        rays.push_back(ray);
        wsc.push_back(sc->cams[img].getScale(pCenter, refLevel) / cosa);
      }
    }
    pImages.clear();
    if (idx.size() < 2) return false;
    wsc[0] = 0.0;   // keep the reference image (:195)
    while (!idx.empty()) {
      size_t k = std::min_element(wsc.begin(), wsc.end()) - wsc.begin();
      pImages.push_back(idx[k]);
      std::vector<int> idx2;
      std::vector<double> wsc2;
      std::vector<V3> rays2;
      for (size_t j = 0; j < rays.size(); j++) {
        if (j == k) continue;
        idx2.push_back(idx[j]);
        rays2.push_back(rays[j]);
        double ftmp = std::min(threshold,
            std::max(threshold / 2.0, 1.0 - dot(rays[k], rays[j])));
        wsc2.push_back(wsc[j] * (threshold / ftmp));
      }
      idx.swap(idx2); wsc.swap(wsc2); rays.swap(rays2);
    }
    return (int)pImages.size() >= MIN_IMAGES_PER_PATCH;
  }

  void setRefImage() {   // :154-181
    if (pImages.size() <= 1) return;
    std::vector<double> incc;
    int best = -1;
    double bestSum = std::numeric_limits<double>::max();
    for (size_t i = 0; i < pImages.size(); i++) {
      setINCCs(incc, pImages, (int)i, true);
      double sum = 0;
      for (double v : incc) sum += v;
      if (sum < bestSum) { bestSum = sum; best = (int)i; }
    }
    std::swap(pImages[0], pImages[best]);
  }

  // objective_fn (:286-311) via setCenterNorm (:401-414)
  double objective(const double* x) {
    evals++;
    pCenter = refCenter + refRay * x[0];
    double a1 = x[1] * (M_PI / 48.0), a2 = x[2] * (M_PI / 48.0);
    double fx = std::sin(a1) * std::cos(a2);
    double fy = std::sin(a2);
    double fz = -std::cos(a1) * std::cos(a2);
    pNormal = ax * fx + ay * fy + az * fz;

    patchAxis(pImages[0], pCenter, pNormal, pScale);
    if (!sampleTex(pCenter, pZaxis, pImages[0], refTex)) return 2.0;
    double val = 0; int n = 0;
    for (size_t i = 1; i < pImages.size(); i++) {
      if (!sampleTex(pCenter, pZaxis, pImages[i], comTex)) continue;
      val += robustincc(1.0 - ncc(refTex, comTex));
      n++;
    }
    if (n < MIN_IMAGES_PER_PATCH - 1) return 2.0;
    return val / n;
  }
  static double static_obj(unsigned n, const double* x, double* grad,
                           void* d) {
    (void)n; (void)grad;
    return ((Optimizer*)d)->objective(x);
  }

  bool optimizePatch() {   // :322-382
    if ((int)pImages.size() < MIN_IMAGES_PER_PATCH) return false;
    // frame (:384-399)
    const Camera& rc = sc->cams[pImages[0]];
    ax = unit(rc.xaxis); ay = unit(rc.yaxis); az = unit(rc.zaxis);
    refCenter = pCenter;
    refRay = unit(refCenter - rc.center);

    double lb[3] = {-HUGE_VAL, -23.99999, -23.99999};
    double ub[3] = {HUGE_VAL, 23.99999, 23.99999};
    // initial x from the current center/normal (:416-446)
    double x[3];
    x[0] = dot(pCenter - refCenter, refRay);
    {
      double fx = dot(ax, unit(pNormal)), fy = dot(ay, unit(pNormal)),
             fz = dot(az, unit(pNormal));
      x[2] = std::asin(std::max(-1.0, std::min(1.0, fy)));
      double cosb = std::cos(x[2]);
      if (cosb == 0) x[1] = 0;
      else {
        double sina = fx / cosb, cosa = -fz / cosb;
        x[1] = std::acos(std::max(-1.0, std::min(1.0, cosa)));
        if (sina < 0) x[1] = -x[1];
      }
      x[1] /= (M_PI / 48.0);
      x[2] /= (M_PI / 48.0);
      for (int i = 0; i < 3; i++)
        x[i] = std::min(ub[i], std::max(lb[i], x[i]));
    }
    // nlopt default initial step (api/options.c:686-727): bounded dims
    // min(0.25*(ub-lb), 0.75*(ub-x), 0.75*(x-lb)); unbounded: |x| or 1
    double dx[3];
    for (int i = 0; i < 3; i++) {
      double step = HUGE_VAL;
      if (std::isfinite(ub[i]) && std::isfinite(lb[i]))
        step = std::min(step, (ub[i] - lb[i]) * 0.25);
      if (std::isfinite(ub[i]) && ub[i] > x[i])
        step = std::min(step, (ub[i] - x[i]) * 0.75);
      if (std::isfinite(lb[i]) && x[i] > lb[i])
        step = std::min(step, (x[i] - lb[i]) * 0.75);
      if (!std::isfinite(step) || step == 0) step = x[i];
      if (!std::isfinite(step) || step == 0) step = 1.0;
      dx[i] = step;
    }
    nlopt_stopping stop;
    std::memset(&stop, 0, sizeof(stop));
    int forced = 0;
    double xtol_abs[3] = {0, 0, 0};
    stop.n = 3; stop.xtol_rel = 1e-7; stop.maxeval = 1000;
    stop.minf_max = -HUGE_VAL;
    stop.maxtime = 0; stop.force_stop = &forced;
    stop.xtol_abs = xtol_abs;
    double minf = 0;
    nlopt_result r = bobyqa(3, 2*3+1, x, lb, ub, dx, &stop, &minf,
                            static_obj, this);
    if (r <= 0) return false;
    // write back via setCenterNorm (:374-375)
    pCenter = refCenter + refRay * x[0];
    double a1 = x[1] * (M_PI / 48.0), a2 = x[2] * (M_PI / 48.0);
    pNormal = ax * (std::sin(a1) * std::cos(a2)) + ay * std::sin(a2)
            + az * (-std::cos(a1) * std::cos(a2));
    return true;
  }

  // PatchOptimizer::optimize (:78-103) with runOptimization (:48-76)
  bool optimize(Patch& p) {
    optimizeCalls++;
    pCenter = p.center; pNormal = p.normal; pScale = p.scale;
    pImages = p.images;
    if (!addImages()) return false;
    if (!filterImagesNCC(NCC_ALPHA_1)) return false;
    if (!sortImages()) return false;
    if (!assureImageAngles()) return false;
    if (!optimizePatch()) return false;
    if (!addImages()) return false;
    if (!filterImagesNCC(NCC_ALPHA_2)) return false;
    if (!filterImagesByAngle()) return false;
    if (!assureImageAngles()) return false;
    setRefImage();
    if (!filterImagesNCC(NCC_ALPHA_2)) return false;
    p.center = pCenter; p.normal = pNormal; p.scale = pScale;
    p.images = pImages;
    sc->patchColor(p);
    return true;
  }
};

// ---------------------------------------------------------------- processor
// CellProcessor (CellProcessor.cpp:43-544)
struct CellProcessor {
  Scene* sc;
  OctTree* tree = nullptr;
  Optimizer* opt = nullptr;
  typedef std::pair<float, OctCell*> PQItem;
  struct Cmp {   // min-heap on priority (CellProcessor.h:37-46)
    bool operator()(const PQItem& a, const PQItem& b) const {
      return a.first > b.first;
    }
  };
  std::priority_queue<PQItem, std::vector<PQItem>, Cmp> queue;
  std::queue<std::pair<float, PPatch>> borderQueue;
  std::mutex borderMtx;
  std::function<void(PPatch, float)>* borderFn = nullptr;

  void initFromTree(OctTree* t, std::function<void(PPatch, float)>* bfn) {
    tree = t;
    borderFn = bfn;
    std::vector<OctCell*> leaves;
    t->root->collect(leaves);
    for (OctCell* l : leaves)
      queue.push({(float)(t->nodeLevel(l) * 10), l});
  }

  // filter: keep best-signed-plane-support patch (CellProcessor.cpp:43-82)
  void filter(OctCell* cell) {
    int n = (int)cell->data.size();
    if (n <= 1) return;
    double bestDist = std::numeric_limits<double>::max();
    PPatch best;
    for (int i = 0; i < n; i++) {
      V3 nn = unit(cell->data[i]->normal);
      V3 x0 = cell->data[i]->center;
      double d = 0;
      for (int j = 0; j < n; j++) {
        if (i == j) continue;
        d += dot(nn, cell->data[j]->center - x0);
      }
      d /= (n - 1);
      if (d < bestDist) { bestDist = d; best = cell->data[i]; }
    }
    for (auto& p : cell->data)
      if (p != best) sc->setDepths(*p, true);
    cell->data.clear();
    cell->data.push_back(best);
  }

  // extend: 6 lateral candidates + all gates (CellProcessor.cpp:84-178)
  void extend(OctCell* cell) {
    if (cell->data.empty()) return;
    PPatch p = cell->data[0];
    if (p->expanded) return;
    V3 n = p->normal;
    V3 imgX = sc->cams[p->images[0]].xaxis;
    V3 yax = unit(cross(n, imgX));
    V3 xax = cross(yax, n);
    const int N = 6;
    double ext = cell->width;
    for (int i = 0; i < N; i++) {
      double a = 2.0 * M_PI / N * i;
      double dx = std::cos(a), dy = std::sin(a);
      PPatch np(new Patch(*p));
      np->center = p->center + (xax * dx + yax * dy) * ext;
      np->scale = cell->width * 0.9 / 2.0;
      np->expanded = false;
      np->flatness = -1.0f;
      bool inside = tree->root->contains(np->center);
      OctCell* leaf = tree->root->at(np->center);
      if (inside && (!leaf->data.empty() || leaf->width < cell->width))
        continue;
      bool good = opt->optimize(*np);
      good = good && np->scale * 2.0 < cell->width
                  && np->scale * 2.0 > cell->width / 2.0;
      good = good && norm(np->center - p->center) < cell->width * 1.5;
      good = good && sc->depthTests(*np, DEPTH_TEST_FACTOR)
                     >= MIN_IMAGES_PER_PATCH;
      good = good && sc->viewBlockTest(*np, DEPTH_TEST_FACTOR)
                     < MIN_IMAGES_PER_PATCH;
      int freePix = sc->pixelFreeTests(*np);
      good = good && freePix >= MIN_IMAGES_PER_PATCH - 1
                  && freePix * 1.0 / np->images.size() > 0.75;
      if (!good) continue;
      if (!tree->root->contains(np->center)) {
        if (borderFn)   // border patch -> other processor (:147-153)
          (*borderFn)(np, (float)((tree->nodeLevel(cell) + p->prioRed) * 10));
      } else if (tree->addConditional(np, cell->width * 0.9, &leaf)) {
        sc->setDepths(*np, false);
        queue.push({(float)((tree->nodeLevel(leaf) + p->prioRed) * 10), leaf});
      }
    }
    p->expanded = true;
  }

  // regularize: 5x5 tangent-plane neighbor flatness (CellProcessor.cpp:309-367)
  void regularize(OctCell* cell) {
    if (cell->data.empty()) return;
    PPatch p = cell->data[0];
    if (!p->expanded) return;
    V3 n = p->normal;
    V3 imgX = sc->cams[p->images[0]].xaxis;
    V3 yax = unit(cross(n, imgX));
    V3 xax = cross(yax, n);
    int hwin = 2;
    std::set<OctCell*> neigh;
    for (int yy = -hwin; yy <= hwin; yy++)
      for (int xx = -hwin; xx <= hwin; xx++) {
        if (xx == 0 && yy == 0) continue;
        V3 ce = p->center + (xax * (double)xx + yax * (double)yy) * cell->width;
        OctCell* l = tree->root->at(ce);
        if (!l->data.empty()) neigh.insert(l);
      }
    int nc = (int)neigh.size();
    if (nc < 1) { p->flatness = 2.6f; return; }
    if (nc < 4) { p->flatness = 2.5f; return; }
    double dist = 0;
    V3 nu = unit(n);
    for (OctCell* l : neigh) {
      double e = dot(nu, l->data[0]->center - p->center);
      dist += e * e;
    }
    p->flatness = (float)(std::sqrt(dist / nc) / cell->width);
  }

  // branch: 4 diagonal children + split (CellProcessor.cpp:210-307)
  void branch(OctCell* cell) {
    if (cell->data.empty()) return;
    PPatch p = cell->data[0];
    if (sc->levelSupport(*p, MINLEVEL) < 1) return;   // exhausted (:221)
    V3 n = p->normal;
    V3 imgX = sc->cams[p->images[0]].xaxis;
    V3 yax = unit(cross(n, imgX));
    V3 xax = cross(yax, n);
    const int N = 4;
    double ext = cell->width / 4.0;
    std::vector<PPatch> kids;
    for (int i = 0; i < N; i++) {
      double a = 2.0 * M_PI / N * i + M_PI / 4.0;
      double dx = std::cos(a), dy = std::sin(a);
      PPatch np(new Patch(*p));
      np->center = p->center + (xax * dx + yax * dy) * ext;
      np->scale = cell->width * 0.45 / 2.0;
      np->expanded = false;
      np->flatness = -1.0f;
      if (!cell->contains(np->center)) continue;
      if (!opt->optimize(*np)) continue;
      if (!cell->contains(np->center)) continue;   // may have moved (:262)
      kids.push_back(np);
    }
    if (tree->nodeLevel(cell) >= PATCH_FINAL_MINLEVEL && kids.empty())
      return;   // keep the lowres patch (:271)
    std::vector<PPatch> old;
    OctCell* br = cell->split(old);
    for (auto& op : old) sc->setDepths(*op, true);
    std::set<OctCell*> newCells;
    for (auto& np : kids) {
      OctCell* leaf = br->at(np->center);
      leaf->data.push_back(np);
      sc->setDepths(*np, false);
      newCells.insert(leaf);
    }
    for (OctCell* l : newCells)
      queue.push({(float)((tree->nodeLevel(l) + l->data[0]->prioRed) * 10), l});
  }

  // processCell state machine (CellProcessor.cpp:369-420)
  void processCell(OctCell* cell, float prio) {
    if (cell->data.empty()) return;
    if (prio >= (MAX_TREE_LEVEL + 1) * 10) return;
    if (cell->data.size() > 1) filter(cell);
    if (!cell->data[0]->expanded) {
      extend(cell);
      queue.push({(float)((tree->nodeLevel(cell) + cell->data[0]->prioRed)
                          * 10 + 1), cell});
      return;
    }
    float flat = cell->data[0]->flatness;
    if (flat < 0) {
      regularize(cell);
      cell->data[0]->prioRed = 0;   // :399
      queue.push({(float)((tree->nodeLevel(cell) + cell->data[0]->prioRed)
                          * 10 + 2), cell});
      return;
    }
    if (flat > 2.4f) {
      sc->setDepths(*cell->data[0], true);
      tree->remove(cell);
    } else {
      branch(cell);
    }
  }

  bool insertBorderCell(PPatch p, float prio) {   // :487-498
    if (!tree || !tree->root->contains(p->center)) return false;
    std::lock_guard<std::mutex> lock(borderMtx);
    borderQueue.push({prio, p});
    return true;
  }
  bool processBorderQueue() {   // :500-531
    std::lock_guard<std::mutex> lock(borderMtx);
    int added = 0;
    while (!borderQueue.empty()) {
      float prio = borderQueue.front().first;
      PPatch np = borderQueue.front().second;
      borderQueue.pop();
      OctCell* leaf;
      if (tree->addConditional(np, np->scale * 2.0, &leaf)) {
        np->flatness = 0;   // prevent regularization (:514)
        sc->setDepths(*np, false);
        queue.push({prio, leaf});
        added++;
      }
    }
    return added > 0;
  }
  bool processQueue(Optimizer* o, float maxPrio) {   // :457-485
    opt = o;
    if (!tree) return false;
    bool borderAdded = processBorderQueue();
    if (queue.empty()) return borderAdded;
    float cur = queue.top().first;
    int processed = 0;
    // NOTE: checks the PREVIOUSLY popped priority, reproducing the
    // reference's one-cell-past-maxPriority leak (:469-482)
    while (!queue.empty() && cur <= maxPrio) {
      cur = queue.top().first;
      OctCell* cell = queue.top().second;
      queue.pop();
      processCell(cell, cur);
      processed++;
    }
    return borderAdded || processed > 0;
  }
  bool haveWork() {
    return !borderQueue.empty() || !queue.empty();
  }
};

// ---------------------------------------------------------------- main
int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s scene.nvm [out.ply] [max_minutes]\n",
                 argv[0]);
    return 1;
  }
  std::string nvmPath = argv[1];
  std::string outPly = argc > 2 ? argv[2] : "";
  double maxMinutes = argc > 3 ? atof(argv[3]) : 30.0;

  std::vector<NvmCam> nvmCams;
  std::vector<NvmPt> nvmPts;
  if (!read_nvm(nvmPath, nvmCams, nvmPts)) {
    std::fprintf(stderr, "cannot read %s\n", nvmPath.c_str());
    return 1;
  }

  auto t0 = std::chrono::steady_clock::now();
  Scene sc;
  int ncam = (int)nvmCams.size();
  sc.cams.resize(ncam);
  sc.imgs.resize(ncam);
  // addCameras (Scene.cpp:42-88)
#ifdef _OPENMP
#pragma omp parallel for
#endif
  for (int i = 0; i < ncam; i++) {
    if (!sc.imgs[i].load_hpi(nvmCams[i].file, MAXLEVEL)) {
      std::fprintf(stderr, "cannot read image %s\n", nvmCams[i].file.c_str());
      exit(1);
    }
    sc.cams[i].init(nvmCams[i], sc.imgs[i].w[0], sc.imgs[i].h[0], MAXLEVEL);
  }
  sc.initDepths();

  // extractCoVisiblilty: pairs sharing >= 50 SfM points (Scene.cpp:241-298)
  std::vector<std::vector<int>> visCount(ncam, std::vector<int>(ncam, 0));
  for (const auto& pt : nvmPts)
    for (size_t a = 0; a < pt.meas.size(); a++)
      for (size_t b = 0; b < pt.meas.size(); b++)
        if (a != b) visCount[pt.meas[a].img][pt.meas[b].img]++;
  sc.covis.resize(ncam);
  for (int i = 0; i < ncam; i++)
    for (int j = 0; j < ncam; j++)
      if (i != j && visCount[i][j] >= COVIS_MIN) sc.covis[i].push_back(j);

  // initPatches (Scene.cpp:90-208)
  int nthreads = 1;
#ifdef _OPENMP
  nthreads = omp_get_max_threads();
#endif
  std::vector<Optimizer> opts(nthreads);
  for (auto& o : opts) o.sc = &sc;

  std::vector<PPatch> seeds;
  std::mutex seedMtx;
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int ii = 0; ii < (int)nvmPts.size(); ii++) {
    const NvmPt& pt = nvmPts[ii];
    if ((int)pt.meas.size() < MIN_IMAGES_PER_PATCH) continue;
    PPatch p(new Patch);
    p->center = {pt.xyz[0], pt.xyz[1], pt.xyz[2]};
    const int margin = 2;   // cSize (Scene.cpp:91,144)
    for (const auto& m : pt.meas) {
      int idx = m.img;
      if (idx < 0) continue;
      double uv[2];
      if (!sc.cams[idx].project(p->center, START_LEVEL, uv)) continue;
      if (uv[0] < margin || uv[1] < margin
          || uv[0] >= sc.imgs[idx].w[START_LEVEL] - margin
          || uv[1] >= sc.imgs[idx].h[START_LEVEL] - margin)
        continue;
      p->images.push_back(idx);
    }
    if (p->images.size() < 2) continue;
    // normal toward the FIRST camera (Scene.cpp:158-159)
    p->normal = unit(sc.cams[p->images[0]].center - p->center);
    p->scale = sc.cams[p->images[0]].getScale(p->center, START_LEVEL);
    int tid = 0;
#ifdef _OPENMP
    tid = omp_get_thread_num();
#endif
    if (!opts[tid].optimize(*p)) continue;
    V3 orig = {pt.xyz[0], pt.xyz[1], pt.xyz[2]};
    if (norm(p->center - orig) > p->scale * 2) continue;   // :171
    std::lock_guard<std::mutex> lock(seedMtx);
    seeds.push_back(p);
  }
  auto t1 = std::chrono::steady_clock::now();
  double initSec = std::chrono::duration<double>(t1 - t0).count();
  std::fprintf(stderr, "created %zu initPatches out of %zu points (%.1fs)\n",
               seeds.size(), nvmPts.size(), initSec);

  // bounding cube + tree build (Scene.cpp:186-199)
  if (seeds.empty()) { std::fprintf(stderr, "no seeds\n"); return 1; }
  V3 mn = seeds[0]->center, mx = seeds[0]->center;
  for (auto& p : seeds) {
    mn.x = std::min(mn.x, p->center.x); mx.x = std::max(mx.x, p->center.x);
    mn.y = std::min(mn.y, p->center.y); mx.y = std::max(mx.y, p->center.y);
    mn.z = std::min(mn.z, p->center.z); mx.z = std::max(mx.z, p->center.z);
  }
  double width = std::max(mx.x - mn.x, std::max(mx.y - mn.y, mx.z - mn.z));
  OctCell* rootCell = new OctCell((mn + mx) * 0.5, width, false, nullptr, 0);
  rootCell->makeChildren(true);
  OctTree tree(rootCell, 0);
  for (auto& p : seeds) {
    p->scale = std::max(p->scale, width / (1 << (PATCH_INIT_MAXLEVEL + 1)));
    tree.add(p, p->scale);
    sc.setDepths(*p, false);
  }

  // subtree split (main.cpp:50-96): split the leaf-richest subtree until
  // >= 100 subtrees (or the largest has < 100 leaves)
  std::vector<std::unique_ptr<OctTree>> subTrees;
  for (auto* ch : rootCell->children)
    if (!ch->isLeaf)
      subTrees.emplace_back(new OctTree(ch, 1));
  if (subTrees.empty())   // degenerate tiny tree: whole root as one subtree
    subTrees.emplace_back(new OctTree(rootCell, 0));
  const int minTrees = 100;
  while ((int)subTrees.size() < minTrees) {
    int maxIdx = -1;
    size_t maxLeafs = 0;
    for (size_t i = 0; i < subTrees.size(); i++) {
      size_t nl = subTrees[i]->root->nrLeafs();
      if (nl > maxLeafs) { maxLeafs = nl; maxIdx = (int)i; }
    }
    if (maxIdx < 0 || maxLeafs < 100) break;
    OctTree* big = subTrees[maxIdx].get();
    std::vector<std::unique_ptr<OctTree>> next;
    for (auto* ch : big->root->children)
      if (!ch->isLeaf)
        next.emplace_back(new OctTree(ch, big->rootLevel + 1));
    if (next.empty()) break;
    for (size_t i = 0; i < subTrees.size(); i++)
      if ((int)i != maxIdx) next.emplace_back(std::move(subTrees[i]));
    subTrees.swap(next);
  }
  std::fprintf(stderr, "split to %zu subtrees\n", subTrees.size());

  // cell processors + border distribution (main.cpp:127-139)
  std::vector<std::unique_ptr<CellProcessor>> procs;
  std::function<void(PPatch, float)> borderFn = [&](PPatch p, float prio) {
    for (auto& cp : procs)
      if (cp->insertBorderCell(p, prio)) return;
  };
  for (auto& st : subTrees) {
    procs.emplace_back(new CellProcessor);
    procs.back()->sc = &sc;
    procs.back()->initFromTree(st.get(), &borderFn);
  }

  // progressive snapshots (HPMVS_SNAPSHOT_SECONDS="300,900,..."): the
  // reference's own headline is quality-vs-time (README.md:5-8); each
  // crossing dumps <outPly>.<sec>s.ply + one JSON line on stdout
  std::vector<double> snapAt;
  if (const char* sv = getenv("HPMVS_SNAPSHOT_SECONDS")) {
    std::istringstream ss(sv);
    std::string tok;
    while (std::getline(ss, tok, ',')) snapAt.push_back(atof(tok.c_str()));
    std::sort(snapAt.begin(), snapAt.end());
  }
  size_t snapIdx = 0;
  auto writeSnapshot = [&](const std::string& path, double el) {
    std::vector<OctCell*> lf;
    rootCell->collect(lf);
    size_t np = 0;
    std::vector<int> hs;
    for (OctCell* l : lf) {
      int lv = tree.nodeLevel(l);
      if (lv >= (int)hs.size()) hs.resize(lv + 1, 0);
      hs[lv]++;
      np += l->data.size();
    }
    std::ofstream ply(path);
    ply << "ply\nformat ascii 1.0\nelement vertex " << np << "\n"
        << "property float x\nproperty float y\nproperty float z\n"
        << "end_header\n";
    for (OctCell* l : lf)
      for (auto& p : l->data)
        ply << (float)p->center.x << " " << (float)p->center.y << " "
            << (float)p->center.z << "\n";
    std::ostringstream hj2;
    hj2 << "[";
    for (size_t i = 0; i < hs.size(); i++) hj2 << (i ? "," : "") << hs[i];
    hj2 << "]";
    std::printf("{\"snapshot_s\": %.0f, \"elapsed_s\": %.1f, "
                "\"patches\": %zu, \"hist\": %s, \"ply\": \"%s\"}\n",
                snapAt.empty() ? el : snapAt[snapIdx], el, np,
                hj2.str().c_str(), path.c_str());
    std::fflush(stdout);
  };

  // priority loop (main.cpp:144-181)
  auto t2 = std::chrono::steady_clock::now();
  const int maxPrio = (MAX_TREE_LEVEL + 1) * 10;
  int lastPrio = 0;
  bool timedOut = false;
  for (int prio = 0; prio < maxPrio; prio++) {
    std::atomic<uint32_t> changed(0);
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
    for (int i = 0; i < (int)procs.size(); i++) {
      int tid = 0;
#ifdef _OPENMP
      tid = omp_get_thread_num();
#endif
      if (procs[i]->processQueue(&opts[tid], (float)prio)) changed++;
    }
    lastPrio = prio;
    bool more = false;
    for (auto& cp : procs) more |= cp->haveWork();
    double el = std::chrono::duration<double>(
        std::chrono::steady_clock::now() - t2).count();
    while (snapIdx < snapAt.size() && el >= snapAt[snapIdx]) {
      writeSnapshot(outPly + "." + std::to_string((int)snapAt[snapIdx])
                    + "s.ply", el);
      snapIdx++;
    }
    if (!more) break;
    if (el > maxMinutes * 60.0) { timedOut = true; break; }
  }
  auto t3 = std::chrono::steady_clock::now();
  double loopSec = std::chrono::duration<double>(t3 - t2).count();

  // histogram + final patches (doctree.h:493-511)
  std::vector<OctCell*> leaves;
  rootCell->collect(leaves);
  std::vector<int> hist;
  size_t nPatches = 0;
  for (OctCell* l : leaves) {
    int lv = tree.nodeLevel(l);
    if (lv >= (int)hist.size()) hist.resize(lv + 1, 0);
    hist[lv]++;
    nPatches += l->data.size();
  }
  long optCalls = 0, evals = 0;
  for (auto& o : opts) { optCalls += o.optimizeCalls; evals += o.evals; }

  if (!outPly.empty()) {
    std::ofstream ply(outPly);
    ply << "ply\nformat ascii 1.0\nelement vertex " << nPatches << "\n";
    ply << "property float x\nproperty float y\nproperty float z\n";
    ply << "property float nx\nproperty float ny\nproperty float nz\n";
    ply << "property uchar diffuse_red\nproperty uchar diffuse_green\n"
        << "property uchar diffuse_blue\nproperty float scalar_scale\n"
        << "end_header\n";
    for (OctCell* l : leaves)
      for (auto& p : l->data) {
        ply << (float)p->center.x << " " << (float)p->center.y << " "
            << (float)p->center.z << " " << (float)p->normal.x << " "
            << (float)p->normal.y << " " << (float)p->normal.z << " "
            << (int)p->color[0] << " " << (int)p->color[1] << " "
            << (int)p->color[2] << " " << (float)p->scale << "\n";
      }
  }

  std::ostringstream hj;
  hj << "[";
  for (size_t i = 0; i < hist.size(); i++)
    hj << (i ? "," : "") << hist[i];
  hj << "]";
  std::printf("{\"init_seconds\": %.2f, \"loop_seconds\": %.2f, "
              "\"seeds\": %zu, \"final_patches\": %zu, "
              "\"optimize_calls\": %ld, \"optimize_calls_per_sec\": %.1f, "
              "\"mean_bobyqa_evals\": %.1f, \"last_prio\": %d, "
              "\"timed_out\": %s, \"threads\": %d, \"hist\": %s}\n",
              initSec, loopSec, seeds.size(), nPatches, optCalls,
              optCalls / std::max(initSec + loopSec, 1e-9),
              (double)evals / std::max(optCalls, 1L), lastPrio,
              timedOut ? "true" : "false", nthreads, hj.str().c_str());
  return 0;
}
