// Oracle harness: runs the reference's vendored AKAZE detector
// (/root/reference/src/thirdparty/akaze/lib, compiled out-of-tree against
// the cvshim) on a raw float32 image and prints keypoints, or times
// repeated detections (--bench) as the measured CPU feature baseline.
//
// Output line format: x y size angle response octave class_id
// (angle in radians, size = diameter, both post-subpixel — the same
// contract regard3d_tpu.kernels.detect targets; see AKAZE.cpp
// Do_Subpixel_Refinement / Compute_Main_Orientation.)
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

// --dump mode reads the (private) evolution pyramid for scale-space parity
// debugging — oracle tool only, never shipped.  All std headers must be
// included BEFORE the access-override define.
#include <iostream>
#include <sstream>
#include <iomanip>
#include <cmath>
#define private public
#include "AKAZE.h"
#undef private

#ifdef WITH_LIOP
extern "C" {
#include "vl_liop.h"
}

// Reference LIOP stage (Regard3DFeatures.cpp:766-827): inverse-map affine
// patch warp -> Gaussian smooth sigma=1.2 -> r3d_vl_liopdesc_process, with
// an OpenMP parallel-for over keypoints like the reference (P3).
static void describe_liop(const cv::Mat& img,
                          const std::vector<cv::KeyPoint>& kpts,
                          std::vector<float>& descs) {
  const int patchResolution = 20;
  const int patchSize = 2 * patchResolution + 1;
  const float kpSizeFactor = 8.0f;
  descs.assign(kpts.size() * 144, 0.f);
#ifdef _OPENMP
#pragma omp parallel
#endif
  {
    VlLiopDesc* liop = r3d_vl_liopdesc_new_basic((vl_size)patchSize);
    cv::Mat patch(patchSize, patchSize, CV_32F);
    cv::Mat smooth(patchSize, patchSize, CV_32F);
#ifdef _OPENMP
#pragma omp for
#endif
    for (int i = 0; i < (int)kpts.size(); i++) {
      const cv::KeyPoint& kp = kpts[i];
      // kp.angle is radians here; Regard3D's chain (rad->deg + 90 deg fix,
      // then -90-angle_deg, src/Regard3DFeatures.cpp:604-613,771) nets out
      // to theta = -pi - angle_rad
      float angle = -(float)CV_PI - kp.angle;
      float scale = kp.size / patchSize * kpSizeFactor;
      float ca = scale * std::cos(angle), sa = scale * std::sin(angle);
      for (int v = 0; v < patchSize; v++)
        for (int u = 0; u < patchSize; u++) {
          float du = (float)(u - patchResolution);
          float dv = (float)(v - patchResolution);
          float sx = kp.pt.x + ca * du + sa * dv;
          float sy = kp.pt.y - sa * du + ca * dv;
          int x0 = (int)std::floor(sx), y0 = (int)std::floor(sy);
          float wx = sx - x0, wy = sy - y0;
          float acc = 0.f;
          for (int t = 0; t < 4; t++) {
            int xi = x0 + (t & 1), yi = y0 + (t >> 1);
            if (xi < 0 || xi >= img.cols || yi < 0 || yi >= img.rows)
              continue;
            float w = (t & 1 ? wx : 1 - wx) * (t >> 1 ? wy : 1 - wy);
            acc += w * img.at<float>(yi, xi);
          }
          patch.at<float>(v, u) = acc;
        }
      cv::GaussianBlur(patch, smooth, cv::Size(0, 0), 1.2);
      r3d_vl_liopdesc_process(liop, &descs[i * 144],
                              smooth.ptr<float>(0));
    }
    r3d_vl_liopdesc_delete(liop);
  }
}
#endif  // WITH_LIOP

// --- tiny definitions for utils.h symbols AKAZE.cpp's (never-called)
// save/debug paths reference; utils.cpp itself is not compiled.
void compute_min_32F(const cv::Mat& src, float& value) {
  float aux = 1e30f;
  for (int i = 0; i < src.rows; i++)
    for (int j = 0; j < src.cols; j++)
      aux = std::min(aux, src.at<float>(i, j));
  value = aux;
}
void compute_max_32F(const cv::Mat& src, float& value) {
  float aux = -1e30f;
  for (int i = 0; i < src.rows; i++)
    for (int j = 0; j < src.cols; j++)
      aux = std::max(aux, src.at<float>(i, j));
  value = aux;
}
void convert_scale(cv::Mat& src) {
  float mn = 0.f, mx = 0.f;
  compute_min_32F(src, mn);
  compute_max_32F(src, mx);
  float d = std::max(mx - mn, 1e-30f);
  for (int i = 0; i < src.rows; i++)
    for (int j = 0; j < src.cols; j++)
      src.at<float>(i, j) = (src.at<float>(i, j) - mn) / d;
}
void copy_and_convert_scale(const cv::Mat& src, cv::Mat& dst) {
  src.copyTo(dst);
  convert_scale(dst);
}

int main(int argc, char** argv) {
  int W = 0, H = 0, bench = 0;
  float thr = 0.001f;
  const char* in = nullptr;
  const char* out = nullptr;
  const char* dump = nullptr;
  for (int i = 1; i < argc; i++) {
    if (!strcmp(argv[i], "--w")) W = atoi(argv[++i]);
    else if (!strcmp(argv[i], "--h")) H = atoi(argv[++i]);
    else if (!strcmp(argv[i], "--thr")) thr = (float)atof(argv[++i]);
    else if (!strcmp(argv[i], "--bench")) bench = atoi(argv[++i]);
    else if (!strcmp(argv[i], "--in")) in = argv[++i];
    else if (!strcmp(argv[i], "--out")) out = argv[++i];
    else if (!strcmp(argv[i], "--dump")) dump = argv[++i];
  }
  if (!in || W <= 0 || H <= 0) {
    fprintf(stderr,
            "usage: akaze_oracle --in img.f32 --w W --h H [--thr t] "
            "[--bench N] [--out kp.txt]\n");
    return 2;
  }

  cv::Mat img(H, W, CV_32F);
  {
    std::ifstream f(in, std::ios::binary);
    if (!f) { fprintf(stderr, "cannot open %s\n", in); return 2; }
    f.read((char*)img.ptr<float>(0), (size_t)W * H * sizeof(float));
  }

  AKAZEOptions opts;   // AKAZEConfig declares options at global scope
  opts.omin = 0;
  opts.img_width = W;
  opts.img_height = H;
  opts.dthreshold = thr;

  std::vector<cv::KeyPoint> kpts;
  if (bench > 0) {
    double t0 = (double)cv::getTickCount();
    for (int r = 0; r < bench; r++) {
      libAKAZE::AKAZE akaze(opts);
      akaze.Create_Nonlinear_Scale_Space(img);
      kpts.clear();
      akaze.Feature_Detection(kpts);
      for (size_t i = 0; i < kpts.size(); i++)
        akaze.Compute_Main_Orientation(kpts[i]);
#ifdef WITH_LIOP
      std::vector<float> descs;
      describe_liop(img, kpts, descs);
      if (descs.size() > 7) descs[7] += 0.f;   // keep the stage live
#endif
    }
    double dt = ((double)cv::getTickCount() - t0) / cv::getTickFrequency();
    printf("{\"imgs\": %d, \"seconds\": %.6f, \"imgs_per_s\": %.4f, "
           "\"keypoints\": %zu}\n",
           bench, dt, bench / dt, kpts.size());
    return 0;
  }

  libAKAZE::AKAZE akaze(opts);
  akaze.Create_Nonlinear_Scale_Space(img);
  akaze.Feature_Detection(kpts);
  for (size_t i = 0; i < kpts.size(); i++)
    akaze.Compute_Main_Orientation(kpts[i]);

  if (dump) {
    // per-level Lsmooth + Ldet + metadata for pixelwise parity debugging
    char path[1024];
    snprintf(path, sizeof path, "%s_meta.txt", dump);
    FILE* mf = fopen(path, "w");
    fprintf(mf, "kcontrast %.9g\n", akaze.options_.kcontrast);
    for (size_t i = 0; i < akaze.evolution_.size(); i++) {
      TEvolution& ev = akaze.evolution_[i];
      fprintf(mf, "level %zu octave %d sublevel %d esigma %.9g etime %.9g "
              "sigma_size %d rows %d cols %d\n", i, ev.octave, ev.sublevel,
              ev.esigma, ev.etime, ev.sigma_size, ev.Ldet.rows,
              ev.Ldet.cols);
      snprintf(path, sizeof path, "%s_lsm_%zu.f32", dump, i);
      std::ofstream f1(path, std::ios::binary);
      f1.write((const char*)ev.Lsmooth.ptr<float>(0),
               (size_t)ev.Lsmooth.rows * ev.Lsmooth.cols * sizeof(float));
      snprintf(path, sizeof path, "%s_ldet_%zu.f32", dump, i);
      std::ofstream f2(path, std::ios::binary);
      f2.write((const char*)ev.Ldet.ptr<float>(0),
               (size_t)ev.Ldet.rows * ev.Ldet.cols * sizeof(float));
    }
    fclose(mf);
  }

  FILE* fo = out ? fopen(out, "w") : stdout;
  for (size_t i = 0; i < kpts.size(); i++)
    fprintf(fo, "%.6f %.6f %.6f %.6f %.8g %d %d\n", kpts[i].pt.x,
            kpts[i].pt.y, kpts[i].size, kpts[i].angle, kpts[i].response,
            kpts[i].octave, kpts[i].class_id);
  if (out) fclose(fo);
  return 0;
}
