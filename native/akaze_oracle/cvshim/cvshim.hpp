// Minimal OpenCV-API shim for compiling the reference's vendored AKAZE
// detector (/root/reference/src/thirdparty/akaze/lib) OUT-OF-TREE as a
// correctness oracle + measured CPU baseline.  Same methodology as the
// round-2 LIOP golden vectors: only this shim and the oracle's *outputs*
// (tests/data/akaze_golden.npz) are committed — no reference source enters
// the repo; build.sh reads the AKAZE sources from the read-only reference
// checkout at build time.
//
// Implements exactly the cv:: surface the detector path touches: Mat
// (float/uchar/int, row views), separable filtering (sepFilter2D /
// GaussianBlur / getDerivKernels-Scharr), INTER_AREA / INTER_LINEAR resize,
// elementwise exp, fastAtan2, a 2x2 LU solve, tick counters, and the small
// value types (KeyPoint, Point_, Size, Scalar, Matx22f, Vec2f, DMatch).
// Drawing/IO entry points (imwrite, line, circle) are stubs: the harness
// never enables the save/draw paths.
#pragma once

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <memory>
#include <string>
#include <vector>

#define CV_PI 3.1415926535897932384626433832795

// OpenCV type ids (depth only; single channel throughout this code base)
#define CV_8U 0
#define CV_8UC1 0
#define CV_32FC1 5
#define CV_Assert(x) do { if (!(x)) abort(); } while (0)
#define CV_16U 2
#define CV_32S 4
#define CV_32F 5
#define CV_64F 6

namespace cv {

inline int _elem_size(int type) {
  switch (type) {
    case CV_8U: return 1;
    case CV_16U: return 2;
    case CV_32S: return 4;
    case CV_32F: return 4;
    case CV_64F: return 8;
  }
  return 4;
}

struct Size {
  int width = 0, height = 0;
  Size() {}
  Size(int w, int h) : width(w), height(h) {}
  bool operator==(const Size& o) const {
    return width == o.width && height == o.height;
  }
};

template <typename T>
struct Point_ {
  T x = 0, y = 0;
  Point_() {}
  Point_(T x_, T y_) : x(x_), y(y_) {}
};
typedef Point_<float> Point2f;
typedef Point_<int> Point;

struct Scalar {
  double v[4] = {0, 0, 0, 0};
  Scalar() {}
  Scalar(double v0, double v1 = 0, double v2 = 0, double v3 = 0) {
    v[0] = v0; v[1] = v1; v[2] = v2; v[3] = v3;
  }
};

struct KeyPoint {
  Point2f pt;
  float size = 0.f;
  float angle = -1.f;
  float response = 0.f;
  int octave = 0;
  int class_id = -1;
  KeyPoint() {}
  KeyPoint(Point2f p, float s) : pt(p), size(s) {}
};

struct DMatch {
  int queryIdx = -1, trainIdx = -1, imgIdx = -1;
  float distance = 0.f;
};

struct Vec2f {
  float v[2] = {0, 0};
  Vec2f() {}
  Vec2f(float a, float b) { v[0] = a; v[1] = b; }
  float& operator()(int i) { return v[i]; }
  const float& operator()(int i) const { return v[i]; }
};

struct Matx22f {
  float a[4] = {0, 0, 0, 0};
  Matx22f() {}
  Matx22f(float m00, float m01, float m10, float m11) {
    a[0] = m00; a[1] = m01; a[2] = m10; a[3] = m11;
  }
  float& operator()(int r, int c) { return a[r * 2 + c]; }
  const float& operator()(int r, int c) const { return a[r * 2 + c]; }
};

class Mat {
 public:
  int rows = 0, cols = 0;
  size_t step = 0;              // bytes per row
  uint8_t* data = nullptr;

  Mat() {}
  Mat(int r, int c, int type) { create(r, c, type); }
  Mat(Size s, int type) { create(s.height, s.width, type); }
  Mat(int r, int c, int type, void* external) {
    rows = r; cols = c; type_ = type;
    step = (size_t)c * _elem_size(type);
    data = (uint8_t*)external;   // non-owning (OpenCV parity)
  }

  int type() const { return type_; }
  int channels() const { return 1; }
  bool empty() const { return data == nullptr || rows == 0 || cols == 0; }
  Size size() const { return Size(cols, rows); }
  size_t total() const { return (size_t)rows * cols; }

  void create(int r, int c, int type) {
    if (data && rows == r && cols == c && type_ == type) return;
    rows = r; cols = c; type_ = type;
    step = (size_t)c * _elem_size(type);
    buf_ = std::make_shared<std::vector<uint8_t>>((size_t)r * step, 0);
    data = buf_->data();
  }
  void create(Size s, int type) { create(s.height, s.width, type); }

  static Mat zeros(int r, int c, int type) { return Mat(r, c, type); }

  template <typename T>
  T* ptr(int y = 0) { return (T*)(data + (size_t)y * step); }
  template <typename T>
  const T* ptr(int y = 0) const { return (const T*)(data + (size_t)y * step); }

  template <typename T>
  T& at(int y, int x) { return ((T*)(data + (size_t)y * step))[x]; }
  template <typename T>
  const T& at(int y, int x) const {
    return ((const T*)(data + (size_t)y * step))[x];
  }

  Mat row(int y) const {
    Mat m;
    m.rows = 1; m.cols = cols; m.type_ = type_; m.step = step;
    m.buf_ = buf_;
    m.data = data + (size_t)y * step;
    return m;
  }
  Mat rowRange(int a, int b) const {
    Mat m;
    m.rows = b - a; m.cols = cols; m.type_ = type_; m.step = step;
    m.buf_ = buf_;
    m.data = data + (size_t)a * step;
    return m;
  }

  void copyTo(Mat& dst) const {
    dst.create(rows, cols, type_);
    for (int y = 0; y < rows; y++)
      std::memcpy(dst.data + (size_t)y * dst.step, data + (size_t)y * step,
                  (size_t)cols * _elem_size(type_));
  }
  Mat clone() const {
    Mat m;
    copyTo(m);
    return m;
  }

  void convertTo(Mat& dst, int rtype, double alpha = 1.0,
                 double beta = 0.0) const {
    dst.create(rows, cols, rtype);
    for (int y = 0; y < rows; y++)
      for (int x = 0; x < cols; x++) {
        double v = _get(y, x) * alpha + beta;
        dst._set(y, x, v);
      }
  }

  double _get(int y, int x) const {
    switch (type_) {
      case CV_8U: return at<uint8_t>(y, x);
      case CV_32S: return at<int32_t>(y, x);
      case CV_32F: return at<float>(y, x);
      case CV_64F: return at<double>(y, x);
    }
    return 0.0;
  }
  void _set(int y, int x, double v) {
    switch (type_) {
      case CV_8U:
        at<uint8_t>(y, x) =
            (uint8_t)std::min(255.0, std::max(0.0, std::round(v)));
        break;
      case CV_32S: at<int32_t>(y, x) = (int32_t)std::lround(v); break;
      case CV_32F: at<float>(y, x) = (float)v; break;
      case CV_64F: at<double>(y, x) = v; break;
    }
  }

 protected:
  int type_ = CV_32F;
  std::shared_ptr<std::vector<uint8_t>> buf_;
};

template <typename T>
int _cv_type_of();
template <> inline int _cv_type_of<float>() { return CV_32F; }
template <> inline int _cv_type_of<int>() { return CV_32S; }
template <> inline int _cv_type_of<uint8_t>() { return CV_8U; }

template <typename T>
class Mat_ : public Mat {
 public:
  Mat_() {}
  Mat_(int r, int c) { create(r, c, _cv_type_of<T>()); }
  Mat_(const Mat& m) : Mat(m) {}
  static Mat_ zeros(int r, int c) {
    Mat_ m(r, c);
    return m;
  }
  T& operator()(int y, int x) { return this->template at<T>(y, x); }
  const T& operator()(int y, int x) const {
    return this->template at<T>(y, x);
  }
  Mat_& operator=(const Mat& m) {
    Mat::operator=(m);
    return *this;
  }
  Mat_& operator=(T v) {            // fill (Mat_<int> m = 0; style)
    for (int y = 0; y < this->rows; y++)
      for (int x = 0; x < this->cols; x++) this->template at<T>(y, x) = v;
    return *this;
  }
};

// OutputArray: pointer-to-Mat wrapper (enough for compute_derivative_kernels)
class OutputArray {
 public:
  OutputArray(Mat& m) : m_(&m) {}
  void create(int r, int c, int type, int i = -1, bool transposed = false) {
    (void)i; (void)transposed;
    m_->create(r, c, type);
  }
  Mat& getMat() const { return *m_; }
  operator Mat&() const { return *m_; }
 private:
  Mat* m_;
};
typedef const OutputArray& InputArray;

// Minimal float-Mat arithmetic used by the diffusivity functions
inline Mat operator-(double a, const Mat& m) {
  Mat out(m.rows, m.cols, CV_32F);
  for (int y = 0; y < m.rows; y++) {
    const float* s = m.ptr<float>(y);
    float* d = out.ptr<float>(y);
    for (int x = 0; x < m.cols; x++) d[x] = (float)a - s[x];
  }
  return out;
}

// ---------------------------------------------------------------------------
// Border handling
// ---------------------------------------------------------------------------
enum {
  BORDER_REPLICATE = 1,
  BORDER_REFLECT_101 = 4,
  BORDER_DEFAULT = 4,
};

inline int _border_idx(int i, int n, int border) {
  if (i >= 0 && i < n) return i;
  if (border == BORDER_REPLICATE) return std::min(std::max(i, 0), n - 1);
  // reflect-101: -1 -> 1, n -> n-2
  while (i < 0 || i >= n) {
    if (i < 0) i = -i;
    if (i >= n) i = 2 * n - 2 - i;
  }
  return i;
}

// ---------------------------------------------------------------------------
// Filtering (float, single channel; correlation convention like OpenCV)
// ---------------------------------------------------------------------------
inline void _sep_filter_f32(const Mat& src, Mat& dst,
                            const std::vector<float>& kx,
                            const std::vector<float>& ky, int border) {
  const int H = src.rows, W = src.cols;
  const int rx = (int)kx.size() / 2, ry = (int)ky.size() / 2;
  Mat tmp(H, W, CV_32F);
  // horizontal pass (kx along x)
  for (int y = 0; y < H; y++) {
    const float* s = src.ptr<float>(y);
    float* t = tmp.ptr<float>(y);
    for (int x = 0; x < W; x++) {
      float acc = 0.f;
      for (int k = 0; k < (int)kx.size(); k++)
        acc += kx[k] * s[_border_idx(x + k - rx, W, border)];
      t[x] = acc;
    }
  }
  Mat out(H, W, CV_32F);
  // vertical pass (ky along y)
  for (int y = 0; y < H; y++) {
    float* d = out.ptr<float>(y);
    for (int k = 0; k < (int)ky.size(); k++) {
      const float* t = tmp.ptr<float>(_border_idx(y + k - ry, H, border));
      const float kv = ky[k];
      for (int x = 0; x < W; x++) d[x] += kv * t[x];
    }
  }
  out.copyTo(dst);   // safe when dst aliases src
}

inline std::vector<float> _col_kernel(const Mat& k) {
  std::vector<float> v((size_t)k.rows * k.cols);
  for (int i = 0; i < k.rows; i++)
    for (int j = 0; j < k.cols; j++) v[i * k.cols + j] = k.at<float>(i, j);
  return v;
}

inline void sepFilter2D(const Mat& src, Mat& dst, int ddepth, const Mat& kx,
                        const Mat& ky) {
  (void)ddepth;
  _sep_filter_f32(src, dst, _col_kernel(kx), _col_kernel(ky),
                  BORDER_DEFAULT);
}

inline void GaussianBlur(const Mat& src, Mat& dst, Size ksize, double sigmaX,
                         double sigmaY = 0.0, int border = BORDER_DEFAULT) {
  (void)sigmaY;
  int n = ksize.width;
  if (n <= 0) n = (int)(std::ceil(sigmaX * 6)) | 1;
  std::vector<float> k(n);
  double c = (n - 1) / 2.0, sum = 0.0;
  for (int i = 0; i < n; i++) {
    double v = std::exp(-(i - c) * (i - c) / (2.0 * sigmaX * sigmaX));
    k[i] = (float)v;
    sum += v;
  }
  for (int i = 0; i < n; i++) k[i] = (float)(k[i] / sum);
  _sep_filter_f32(src, dst, k, k, border);
}

// getDerivKernels with ksize=0 => 3x3 Scharr (the only use in this code
// base); normalize=true scales the smoothing kernel by 1/32 (OpenCV parity)
inline void getDerivKernels(OutputArray kx_, OutputArray ky_, int dx, int dy,
                            int ksize, bool normalize = false,
                            int ktype = CV_32F) {
  (void)ksize; (void)ktype;
  const float smooth_raw[3] = {3.f, 10.f, 3.f};
  const float deriv[3] = {-1.f, 0.f, 1.f};
  float smooth[3];
  for (int i = 0; i < 3; i++)
    smooth[i] = normalize ? smooth_raw[i] / 32.f : smooth_raw[i];
  kx_.create(3, 1, CV_32F);
  ky_.create(3, 1, CV_32F);
  Mat& kx = kx_.getMat();
  Mat& ky = ky_.getMat();
  for (int i = 0; i < 3; i++) {
    kx.at<float>(i, 0) = dx ? deriv[i] : smooth[i];
    ky.at<float>(i, 0) = dy ? deriv[i] : smooth[i];
  }
}

inline void Scharr(const Mat& src, Mat& dst, int ddepth, int dx, int dy,
                   double scale = 1.0, double delta = 0.0,
                   int border = BORDER_DEFAULT) {
  (void)ddepth; (void)scale; (void)delta;
  Mat kx, ky;
  getDerivKernels(kx, ky, dx, dy, 0, true, CV_32F);
  _sep_filter_f32(src, dst, _col_kernel(kx), _col_kernel(ky), border);
}

enum { INTER_LINEAR = 1, INTER_AREA = 3 };

inline void resize(const Mat& src, Mat& dst, Size dsize, double fx = 0.0,
                   double fy = 0.0, int interpolation = INTER_LINEAR) {
  (void)fx; (void)fy;
  const int SW = src.cols, SH = src.rows;
  const int DW = dsize.width, DH = dsize.height;
  Mat out(DH, DW, CV_32F);
  if (interpolation == INTER_AREA && DW <= SW && DH <= SH) {
    // area-weighted average over the source footprint of each dst pixel
    const double sx = (double)SW / DW, sy = (double)SH / DH;
    for (int y = 0; y < DH; y++) {
      double y0 = y * sy, y1 = (y + 1) * sy;
      float* d = out.ptr<float>(y);
      for (int x = 0; x < DW; x++) {
        double x0 = x * sx, x1 = (x + 1) * sx;
        double acc = 0.0, area = 0.0;
        for (int yy = (int)y0; yy < (int)std::ceil(y1); yy++) {
          double wy = std::min<double>(yy + 1, y1) - std::max<double>(yy, y0);
          const float* s = src.ptr<float>(std::min(yy, SH - 1));
          for (int xx = (int)x0; xx < (int)std::ceil(x1); xx++) {
            double wx =
                std::min<double>(xx + 1, x1) - std::max<double>(xx, x0);
            acc += wx * wy * s[std::min(xx, SW - 1)];
            area += wx * wy;
          }
        }
        d[x] = (float)(acc / area);
      }
    }
  } else {
    // bilinear, center-aligned mapping
    const double sx = (double)SW / DW, sy = (double)SH / DH;
    for (int y = 0; y < DH; y++) {
      double syf = (y + 0.5) * sy - 0.5;
      int y0 = (int)std::floor(syf);
      double wy = syf - y0;
      int y0c = std::min(std::max(y0, 0), SH - 1);
      int y1c = std::min(std::max(y0 + 1, 0), SH - 1);
      float* d = out.ptr<float>(y);
      const float* s0 = src.ptr<float>(y0c);
      const float* s1 = src.ptr<float>(y1c);
      for (int x = 0; x < DW; x++) {
        double sxf = (x + 0.5) * sx - 0.5;
        int x0 = (int)std::floor(sxf);
        double wx = sxf - x0;
        int x0c = std::min(std::max(x0, 0), SW - 1);
        int x1c = std::min(std::max(x0 + 1, 0), SW - 1);
        d[x] = (float)((1 - wy) * ((1 - wx) * s0[x0c] + wx * s0[x1c]) +
                       wy * ((1 - wx) * s1[x0c] + wx * s1[x1c]));
      }
    }
  }
  out.copyTo(dst);
}

inline void exp(const Mat& src, Mat& dst) {
  dst.create(src.rows, src.cols, CV_32F);
  for (int y = 0; y < src.rows; y++) {
    const float* s = src.ptr<float>(y);
    float* d = dst.ptr<float>(y);
    for (int x = 0; x < src.cols; x++) d[x] = std::exp(s[x]);
  }
}

inline float fastAtan2(float y, float x) {
  float a = std::atan2(y, x) * (float)(180.0 / CV_PI);
  if (a < 0) a += 360.f;
  return a;
}

enum { DECOMP_LU = 0 };

inline bool solve(const Matx22f& A, const Vec2f& b, Vec2f& dst,
                  int method = DECOMP_LU) {
  (void)method;
  float det = A(0, 0) * A(1, 1) - A(0, 1) * A(1, 0);
  if (std::fabs(det) < 1e-20f) {
    dst(0) = dst(1) = 0.f;
    return false;
  }
  dst(0) = (b(0) * A(1, 1) - b(1) * A(0, 1)) / det;
  dst(1) = (b(1) * A(0, 0) - b(0) * A(1, 0)) / det;
  return true;
}

inline int64_t getTickCount() {
  return std::chrono::duration_cast<std::chrono::nanoseconds>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}
inline double getTickFrequency() { return 1e9; }

// Stubs for drawing/IO symbols referenced by the (never-called) save paths
inline bool imwrite(const std::string&, const Mat&) { return false; }
inline void line(Mat&, Point, Point, const Scalar&, int = 1) {}
inline void circle(Mat&, Point, int, const Scalar&, int = 1) {}

// RANSAC constants for utils.h declarations (not compiled/used)
enum { RANSAC = 8, FM_RANSAC = 8 };
inline Mat findHomography(const std::vector<Point2f>&,
                          const std::vector<Point2f>&, int = 0,
                          double = 3.0) { return Mat(); }
inline Mat findFundamentalMat(const std::vector<Point2f>&,
                              const std::vector<Point2f>&, int = 8,
                              double = 3.0, double = 0.99) { return Mat(); }

}  // namespace cv
