// dvt_host: native host-side image pipeline for the TPU framework.
//
// Role: the reference feeds its GPUs with torch DataLoader worker processes
// (PIL decode + torchvision transforms). Our TPU pipeline only needs the
// host to produce normalized base images (crops render on-device), but at
// ImageNet scale (stage 3) JPEG decode + resize is still the host
// bottleneck. This library does decode -> pillow-style antialiased bicubic
// resize -> normalize in C++ with OpenMP batch parallelism, exposed through
// a C ABI consumed via ctypes (dvt_tpu/data/native.py).
//
// Resize matches PIL/torch antialiased bicubic (Keys kernel A=-0.5, window
// truncated+renormalized at borders, support widened by the scale when
// minifying) so outputs are interchangeable with the Python path.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <jpeglib.h>
#include <csetjmp>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode a JPEG file to RGB u8. Returns empty on failure.
std::vector<uint8_t> decode_jpeg(const char* path, int* h, int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return {};
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  std::vector<uint8_t> out;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return {};
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *h = cinfo.output_height;
  *w = cinfo.output_width;
  out.resize(size_t(*h) * (*w) * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out.data() + size_t(cinfo.output_scanline) * (*w) * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return out;
}

inline double cubic_keys(double x) {  // A = -0.5 (pillow/torch-AA kernel)
  const double a = -0.5;
  x = std::fabs(x);
  if (x <= 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

struct ResampleAxis {
  std::vector<int> xmin;          // first source index per output
  std::vector<int> count;         // taps per output
  std::vector<double> weights;    // flattened [out][max_taps]
  int max_taps = 0;
};

ResampleAxis build_axis(int in_size, int out_size) {
  ResampleAxis ax;
  double scale = double(in_size) / out_size;
  double support_scale = std::max(scale, 1.0);
  double support = 2.0 * support_scale;
  ax.max_taps = int(std::ceil(support)) * 2 + 2;
  ax.xmin.resize(out_size);
  ax.count.resize(out_size);
  ax.weights.assign(size_t(out_size) * ax.max_taps, 0.0);
  for (int i = 0; i < out_size; ++i) {
    double center = (i + 0.5) * scale;
    int lo = std::max(int(center - support + 0.5), 0);
    int hi = std::min(int(center + support + 0.5), in_size);
    double sum = 0.0;
    for (int j = lo; j < hi; ++j)
      sum += cubic_keys((j - center + 0.5) / support_scale);
    ax.xmin[i] = lo;
    ax.count[i] = hi - lo;
    for (int j = lo; j < hi; ++j) {
      double wgt = cubic_keys((j - center + 0.5) / support_scale);
      ax.weights[size_t(i) * ax.max_taps + (j - lo)] =
          (sum != 0.0) ? wgt / sum : 0.0;
    }
  }
  return ax;
}

// u8 HWC -> f32 HWC resize (separable, pillow-style)
void resize_bicubic(const uint8_t* src, int h, int w, float* dst, int oh,
                    int ow) {
  ResampleAxis ay = build_axis(h, oh);
  ResampleAxis axx = build_axis(w, ow);
  std::vector<float> tmp(size_t(oh) * w * 3);
  for (int i = 0; i < oh; ++i) {
    for (int x = 0; x < w; ++x) {
      double acc[3] = {0, 0, 0};
      for (int k = 0; k < ay.count[i]; ++k) {
        double wgt = ay.weights[size_t(i) * ay.max_taps + k];
        const uint8_t* p = src + (size_t(ay.xmin[i] + k) * w + x) * 3;
        acc[0] += wgt * p[0];
        acc[1] += wgt * p[1];
        acc[2] += wgt * p[2];
      }
      float* q = tmp.data() + (size_t(i) * w + x) * 3;
      q[0] = float(acc[0]);
      q[1] = float(acc[1]);
      q[2] = float(acc[2]);
    }
  }
  for (int i = 0; i < oh; ++i) {
    for (int j = 0; j < ow; ++j) {
      double acc[3] = {0, 0, 0};
      for (int k = 0; k < axx.count[j]; ++k) {
        double wgt = axx.weights[size_t(j) * axx.max_taps + k];
        const float* p = tmp.data() + (size_t(i) * w + (axx.xmin[j] + k)) * 3;
        acc[0] += wgt * p[0];
        acc[1] += wgt * p[1];
        acc[2] += wgt * p[2];
      }
      float* q = dst + (size_t(i) * ow + j) * 3;
      q[0] = float(acc[0]);
      q[1] = float(acc[1]);
      q[2] = float(acc[2]);
    }
  }
}

}  // namespace

extern "C" {

// Load one JPEG -> normalized f32 (out_h, out_w, 3). Returns 0 on success.
int dvt_load_image(const char* path, int out_h, int out_w, const float* mean,
                   const float* stddev, float* out) {
  int h = 0, w = 0;
  std::vector<uint8_t> rgb = decode_jpeg(path, &h, &w);
  if (rgb.empty()) return 1;
  std::vector<float> resized(size_t(out_h) * out_w * 3);
  resize_bicubic(rgb.data(), h, w, resized.data(), out_h, out_w);
  for (size_t i = 0; i < resized.size(); i += 3) {
    out[i + 0] = (resized[i + 0] / 255.0f - mean[0]) / stddev[0];
    out[i + 1] = (resized[i + 1] / 255.0f - mean[1]) / stddev[1];
    out[i + 2] = (resized[i + 2] / 255.0f - mean[2]) / stddev[2];
  }
  return 0;
}

// Batch variant with OpenMP. status[i]=0 on success per image.
void dvt_load_batch(const char** paths, int n, int out_h, int out_w,
                    const float* mean, const float* stddev, float* out,
                    int* status) {
#pragma omp parallel for schedule(dynamic)
  for (int i = 0; i < n; ++i) {
    status[i] = dvt_load_image(paths[i], out_h, out_w, mean, stddev,
                               out + size_t(i) * out_h * out_w * 3);
  }
}

// Resize-only entry (u8 in, f32 0-255 out) for tests.
void dvt_resize_bicubic(const uint8_t* src, int h, int w, float* dst, int oh,
                        int ow) {
  resize_bicubic(src, h, w, dst, oh, ow);
}

}  // extern "C"
