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

#include "AKAZE.h"

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
  for (int i = 1; i < argc; i++) {
    if (!strcmp(argv[i], "--w")) W = atoi(argv[++i]);
    else if (!strcmp(argv[i], "--h")) H = atoi(argv[++i]);
    else if (!strcmp(argv[i], "--thr")) thr = (float)atof(argv[++i]);
    else if (!strcmp(argv[i], "--bench")) bench = atoi(argv[++i]);
    else if (!strcmp(argv[i], "--in")) in = argv[++i];
    else if (!strcmp(argv[i], "--out")) out = argv[++i];
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

  FILE* fo = out ? fopen(out, "w") : stdout;
  for (size_t i = 0; i < kpts.size(); i++)
    fprintf(fo, "%.6f %.6f %.6f %.6f %.8g %d %d\n", kpts[i].pt.x,
            kpts[i].pt.y, kpts[i].size, kpts[i].angle, kpts[i].response,
            kpts[i].octave, kpts[i].class_id);
  if (out) fclose(fo);
  return 0;
}
