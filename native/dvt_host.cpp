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
// Resize matches torch antialias=True bicubic (Keys kernel A=-0.5, window
// truncated+renormalized at borders, support widened by the scale when
// minifying) to ~1e-2 u8 levels, measured. PIL.Image.resize(BICUBIC) is
// NOT float-exact: its 8bpc path quantizes the horizontal pass to uint8
// before the vertical pass (fixed-point two-pass), deviating up to
// ~26/255 from the float kernel on high-frequency content - this library
// is the more accurate of the two (tools/ab_loader.py isolates it).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
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

// Inner decode with the setjmp region. The output buffer is a REFERENCE
// parameter (caller's frame), not a local: a non-volatile local modified
// between setjmp and longjmp has indeterminate value after the jump
// (C 7.13.2.1), so destructing a local vector on the error path would be
// UB (libjpeg example.c documents the same trap).
bool decode_jpeg_into(const char* path, std::vector<uint8_t>& out,
                      int* h, int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
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
  return true;
}

// Decode a JPEG file to RGB u8. Returns empty on failure.
std::vector<uint8_t> decode_jpeg(const char* path, int* h, int* w) {
  std::vector<uint8_t> out;
  if (!decode_jpeg_into(path, out, h, w)) out.clear();
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

// u8 HWC -> f32 HWC resize (separable, pillow-style).
//
// Vectorization-oriented layout: the vertical pass is an axpy over whole
// rows (w*3 contiguous floats - gcc auto-vectorizes it), the horizontal
// pass runs a fixed max_taps-length inner loop (weights are zero-padded,
// tmp gets max_taps guard columns so padded taps read in-bounds) so the
// 3-channel FMAs unroll without per-tap branches. Float accumulation:
// renormalized u8-input taps round off ~1e-4 levels, far below the fp32
// AA reference itself (validated vs torch antialias=True at 1e-2 levels,
// tools/ab_loader.py).
void resize_bicubic(const uint8_t* src, int h, int w, float* dst, int oh,
                    int ow) {
  ResampleAxis ay = build_axis(h, oh);
  ResampleAxis axx = build_axis(w, ow);
  const int row_elems = w * 3;
  // float weights once, outside the hot loops
  std::vector<float> wy(ay.weights.begin(), ay.weights.end());
  std::vector<float> wx(axx.weights.begin(), axx.weights.end());
  std::vector<float> tmp(size_t(oh) * (w + axx.max_taps) * 3, 0.0f);
  const int tmp_row = (w + axx.max_taps) * 3;
  for (int i = 0; i < oh; ++i) {
    float* out_row = tmp.data() + size_t(i) * tmp_row;
    std::fill(out_row, out_row + row_elems, 0.0f);
    const float* wrow = wy.data() + size_t(i) * ay.max_taps;
    for (int k = 0; k < ay.count[i]; ++k) {
      const float wgt = wrow[k];
      const uint8_t* p = src + size_t(ay.xmin[i] + k) * row_elems;
      for (int t = 0; t < row_elems; ++t) out_row[t] += wgt * p[t];
    }
  }
  for (int i = 0; i < oh; ++i) {
    const float* in_row = tmp.data() + size_t(i) * tmp_row;
    float* out_row = dst + size_t(i) * ow * 3;
    for (int j = 0; j < ow; ++j) {
      const float* wrow = wx.data() + size_t(j) * axx.max_taps;
      const float* p = in_row + size_t(axx.xmin[j]) * 3;
      float a0 = 0.0f, a1 = 0.0f, a2 = 0.0f;
      for (int k = 0; k < axx.max_taps; ++k) {
        a0 += wrow[k] * p[k * 3 + 0];
        a1 += wrow[k] * p[k * 3 + 1];
        a2 += wrow[k] * p[k * 3 + 2];
      }
      out_row[j * 3 + 0] = a0;
      out_row[j * 3 + 1] = a1;
      out_row[j * 3 + 2] = a2;
    }
  }
}

// ---- minimal .npy reader (stage-2 feature pairs) ----
//
// Stage 1 writes features with np.save(float32) (dvt_tpu/engine.py
// save_features); stage 2 re-reads two such files per sample
// (reference dvt/dataset/paired_list_dataset.py:39-44). Parsing the
// header here lets the whole paired sample load run under one OpenMP
// region with the GIL released.

inline float half_to_float(uint16_t h) {
  uint32_t sign = uint32_t(h & 0x8000u) << 16;
  uint32_t exp = (h >> 10) & 0x1f;
  uint32_t man = h & 0x3ffu;
  uint32_t bits;
  if (exp == 0) {
    if (man == 0) {
      bits = sign;  // +-0
    } else {        // subnormal: normalize
      int e = -1;
      do {
        ++e;
        man <<= 1;
      } while ((man & 0x400u) == 0);
      bits = sign | uint32_t(127 - 15 - e) << 23 | (man & 0x3ffu) << 13;
    }
  } else if (exp == 0x1f) {
    bits = sign | 0x7f800000u | man << 13;  // inf/nan
  } else {
    bits = sign | (exp - 15 + 127) << 23 | man << 13;
  }
  float f;
  std::memcpy(&f, &bits, 4);
  return f;
}

// Read a C-order little-endian <f4 or <f2 .npy file; writes exactly
// expected_elems floats. Returns 0 ok, nonzero on any mismatch.
int load_npy_f32(const char* path, float* out, int64_t expected_elems) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  uint8_t magic[8];
  if (fread(magic, 1, 8, f) != 8 || std::memcmp(magic, "\x93NUMPY", 6) != 0) {
    fclose(f);
    return 2;
  }
  int major = magic[6];
  uint32_t hlen = 0;
  if (major == 1) {
    uint8_t b[2];
    if (fread(b, 1, 2, f) != 2) { fclose(f); return 2; }
    hlen = b[0] | uint32_t(b[1]) << 8;
  } else {
    uint8_t b[4];
    if (fread(b, 1, 4, f) != 4) { fclose(f); return 2; }
    hlen = b[0] | uint32_t(b[1]) << 8 | uint32_t(b[2]) << 16 |
           uint32_t(b[3]) << 24;
  }
  if (hlen > 1u << 20) { fclose(f); return 2; }
  std::vector<char> hdr(hlen + 1, 0);
  if (fread(hdr.data(), 1, hlen, f) != hlen) { fclose(f); return 2; }
  std::string h(hdr.data());
  bool f4 = h.find("'<f4'") != std::string::npos;
  bool f2 = !f4 && h.find("'<f2'") != std::string::npos;
  if ((!f4 && !f2) || h.find("'fortran_order': False") == std::string::npos) {
    fclose(f);
    return 3;  // unsupported dtype/order -> caller falls back to np.load
  }
  size_t sp = h.find("'shape':");
  size_t lp = (sp == std::string::npos) ? sp : h.find('(', sp);
  if (lp == std::string::npos) { fclose(f); return 3; }
  int64_t elems = 1;
  {
    const char* p = h.c_str() + lp + 1;
    while (*p && *p != ')') {
      while (*p == ' ' || *p == ',') ++p;
      if (*p == ')' || !*p) break;
      elems *= strtoll(p, const_cast<char**>(&p), 10);
    }
  }
  if (elems != expected_elems) { fclose(f); return 4; }
  int rc = 0;
  if (f4) {
    if (fread(out, 4, size_t(elems), f) != size_t(elems)) rc = 5;
  } else {
    std::vector<uint16_t> tmp((size_t(elems)));
    if (fread(tmp.data(), 2, size_t(elems), f) != size_t(elems)) {
      rc = 5;
    } else {
      for (int64_t i = 0; i < elems; ++i) out[i] = half_to_float(tmp[i]);
    }
  }
  fclose(f);
  return rc;
}

}  // namespace

extern "C" {

int dvt_load_image(const char* path, int out_h, int out_w, const float* mean,
                   const float* stddev, float* out);

// Batch .npy -> f32. status[i]=0 on success per file.
void dvt_load_npy_batch(const char** paths, int n, float* out,
                        int64_t elems_per, int* status) {
#pragma omp parallel for schedule(dynamic)
  for (int i = 0; i < n; ++i) {
    status[i] = load_npy_f32(paths[i], out + size_t(i) * elems_per,
                             elems_per);
  }
}

// Stage-2 paired sample batch: per sample decode+resize+normalize the
// image and read its (raw, denoised) float feature files — one OpenMP
// region for the full batch (3 tasks x n samples, dynamic schedule).
void dvt_load_paired_batch(const char** img_paths, const char** raw_paths,
                           const char** den_paths, int n, int out_h,
                           int out_w, const float* mean, const float* stddev,
                           float* imgs, float* raw, float* den,
                           int64_t feat_elems, int* status) {
  std::vector<int> st(size_t(n) * 3, 0);
#pragma omp parallel for schedule(dynamic)
  for (int t = 0; t < n * 3; ++t) {
    int i = t / 3;
    switch (t % 3) {
      case 0:
        st[t] = dvt_load_image(img_paths[i], out_h, out_w, mean, stddev,
                               imgs + size_t(i) * out_h * out_w * 3);
        break;
      case 1:
        st[t] = load_npy_f32(raw_paths[i], raw + size_t(i) * feat_elems,
                             feat_elems);
        break;
      default:
        st[t] = load_npy_f32(den_paths[i], den + size_t(i) * feat_elems,
                             feat_elems);
    }
  }
  for (int i = 0; i < n; ++i)
    status[i] = st[i * 3] | st[i * 3 + 1] | st[i * 3 + 2];
}

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
